"""Seed-159 collapse attribution: dataset identifiability vs inference bug.

Round-4 coverage (results_coverage.json): 4/5 seeds calibrate; the seed-159
dataset collapses (kappa->0.344, sigma->0.079, z=44) with or without theta
warmup. Round-5 question (VERDICT #3): is theta* itself degenerate FOR THAT
DRAW — i.e. does the best value any model-class-confined method can recover
already sit in the weak-dynamics basin?

Method (same closed-form machinery as highdim_mle_analysis.py, d=1): under
the Euler-Maruyama model class at training dt=0.05 with observations every
0.5 (n=10 EM steps between obs), the observation sequence is an exact AR(1):

    y_{k+1} | y_k ~ N( mu + a (y_k - mu),  v )
    a = (1 - kappa dt)^n,   v = sigma^2 dt sum_{i=0}^{n-1} (1 - kappa dt)^{2i}

With 11 observations there are only 10 transitions, so the MLE is evaluated
on exactly the information the variational run sees. The profile likelihood
over `a` is also printed: a flat/degenerate profile means the dataset cannot
distinguish strong from weak mean reversion, and the ELBO's preference for
the degenerate basin is an identifiability property of the draw, not an
optimizer failure. (Reference objective: the same ELBO family,
/root/reference/src/variational_sde/inference/evidence_lower_bound.py:63-66.)

CPU-only. Writes benchmarks/results_seed159_mle.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

TRUE_THETA = (1.5, 1.0, 0.4)
DT = 0.05
OBS_EVERY_STEPS = 10  # obs every 0.5 time units
COVERAGE_SEEDS = [11, 48, 85, 122, 159]  # 11 + 37*i, i=0..4


def simulate(seed: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    import viforsdes_tpu as vt
    from ornstein_uhlenbeck import OrnsteinUhlenbeck

    x0 = jnp.asarray([[2.5]])
    traj = vt.euler_maruyama(
        OrnsteinUhlenbeck(), x0, jnp.asarray([TRUE_THETA]), 5.0, DT,
        key=jax.random.key(seed),
    )
    idx = np.arange(0, 101, OBS_EVERY_STEPS)
    return np.asarray(traj[0, idx, 0], dtype=np.float64)  # [11]


def nll_profile(y: np.ndarray, a: float) -> tuple[float, float, float]:
    """Exact AR(1) negative log-likelihood profiled over (mu, v) at fixed a."""
    y0, y1 = y[:-1], y[1:]
    mu = float(np.mean(y1 - a * y0) / (1.0 - a)) if a < 1.0 else float(np.mean(y1))
    r = y1 - mu - a * (y0 - mu)
    v = float(np.mean(r * r))
    # 0.5 * K * (log v + 1) + const; K = #transitions
    return 0.5 * y0.size * (np.log(max(v, 1e-300)) + 1.0), mu, v


def ar1_mle(y: np.ndarray) -> tuple[float, float, float]:
    grid = np.linspace(0.01, 0.999, 4000)
    vals = [nll_profile(y, a)[0] for a in grid]
    a = float(grid[int(np.argmin(vals))])
    step = 1e-4
    for _ in range(60):
        c = nll_profile(y, a)[0]
        lo = nll_profile(y, max(a - step, 1e-6))[0]
        hi = nll_profile(y, min(a + step, 0.99999))[0]
        if lo < c:
            a = max(a - step, 1e-6)
        elif hi < c:
            a = min(a + step, 0.99999)
        else:
            step *= 0.5
    nll, mu, v = nll_profile(y, a)
    return a, mu, v


def theta_from_ar1(a: float, v: float) -> tuple[float, float]:
    """Invert a = (1-k dt)^n, v = s^2 dt sum (1-k dt)^{2i} -> (kappa, sigma)."""
    n = OBS_EVERY_STEPS
    one_minus = a ** (1.0 / n)
    kappa = (1.0 - one_minus) / DT
    geo = sum(one_minus ** (2 * i) for i in range(n))
    sigma = (v / (DT * geo)) ** 0.5
    return float(kappa), float(sigma)


def analyze(seed: int) -> dict:
    y = simulate(seed)
    a, mu, v = ar1_mle(y)
    kappa, sigma = theta_from_ar1(a, v)
    # profile-likelihood flatness: NLL at theta* vs at the TRUE theta's AR(1)
    # image vs at the collapsed basin the run landed in (kappa~0.34)
    a_true = (1.0 - TRUE_THETA[0] * DT) ** OBS_EVERY_STEPS
    a_collapsed = (1.0 - 0.344 * DT) ** OBS_EVERY_STEPS
    nll_star = nll_profile(y, a)[0]
    nll_true = nll_profile(y, a_true)[0]
    nll_coll = nll_profile(y, a_collapsed)[0]
    return {
        "seed": seed,
        "mle_a": round(a, 5),
        "theta_star": {
            "kappa": round(kappa, 4),
            "mu": round(mu, 4),
            "sigma": round(sigma, 4),
        },
        "nll_at_mle": round(nll_star, 4),
        "nll_at_truth": round(nll_true, 4),
        "nll_at_collapsed_basin": round(nll_coll, 4),
        # log-likelihood penalty (nats over all 10 transitions) each
        # hypothesis pays relative to the dataset's own optimum
        "delta_nll_truth": round(nll_true - nll_star, 4),
        "delta_nll_collapsed": round(nll_coll - nll_star, 4),
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = [analyze(s) for s in COVERAGE_SEEDS]
    out = {
        "true_theta": {"kappa": 1.5, "mu": 1.0, "sigma": 0.4},
        "method": "exact AR(1) MLE on the 10 observed transitions "
        "(EM model class, dt=0.05, obs every 0.5)",
        "per_seed": results,
    }
    path = Path(__file__).parent / "results_seed159_mle.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
