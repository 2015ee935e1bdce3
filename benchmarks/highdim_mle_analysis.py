"""Exact model-class-optimal theta for the highdim (ladder-5) quality config.

The quality run infers (kappa, mu, sigma) for a d=32 OU with an Euler-Maruyama
path model at dt=0.05, from NOISELESS observations every 0.1 simulated by EM
at dt=0.01 (examples/highdim_ou_dp.py). Between observations the latent bridge
is n=2 EM steps, so under the *model class* the observation sequence is an
exact linear-Gaussian AR(1) per dimension:

    y_{k+1} | y_k ~ N( mu + a (y_k - mu),  v )
    a = (1 - kappa dt)^n
    v = sigma^2 dt * sum_{i=0}^{n-1} (1 - kappa dt)^{2i}

The MLE of (a, mu, v) is closed-form (AR(1) regression pooled over dims), and
inverting the two identities gives theta* — the best value ANY inference
method confined to this model class can recover. The gap theta* - theta_true
is pure discretization error (shared by the reference, whose sampler is the
same EM scheme, /root/reference/src/variational_sde/models/head.py:88-152);
the gap theta_hat - theta* is what the variational method owes.

Run on CPU; prints theta* for several training dt and an exact-OU control.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def ar1_mle(y: np.ndarray) -> tuple[float, float, float]:
    """Pooled per-dim AR(1) MLE: y [K, D] -> (a, mu, v)."""
    y0, y1 = y[:-1], y[1:]
    # Profile out mu: for fixed a, mu* = mean(y1 - a y0) / (1 - a); solve the
    # stationary point in a by 1-D search (the objective is smooth and
    # unimodal in a for these data).
    def nll(a: float) -> tuple[float, float, float]:
        mu = float(np.mean(y1 - a * y0) / (1.0 - a))
        r = y1 - mu - a * (y0 - mu)
        v = float(np.mean(r * r))
        return 0.5 * y0.size * (np.log(v) + 1.0), mu, v

    grid = np.linspace(0.5, 0.999, 2000)
    vals = [nll(a)[0] for a in grid]
    a = float(grid[int(np.argmin(vals))])
    # local refine (step halves once neither neighbor improves — advisor
    # round-3 fix: the reset used to sit inside the loop, making the halving
    # dead code and pinning resolution at 1e-4)
    step = 1e-4
    for _ in range(60):
        c, lo, hi = nll(a)[0], nll(a - step)[0], nll(a + step)[0]
        if lo < c:
            a -= step
        elif hi < c:
            a += step
        else:
            step *= 0.5
    _, mu, v = nll(a)
    return a, mu, v


def em_theta_from_ar1(a: float, v: float, dt: float, n: int) -> tuple[float, float]:
    """Invert a=(1-k dt)^n, v=s^2 dt sum (1-k dt)^{2i} for (kappa, sigma)."""
    one_minus = a ** (1.0 / n)
    kappa = (1.0 - one_minus) / dt
    geom = sum(one_minus ** (2 * i) for i in range(n))
    sigma = float(np.sqrt(v / (dt * geom)))
    return float(kappa), sigma


def exact_theta_from_ar1(a: float, v: float, gap: float) -> tuple[float, float]:
    """Exact-OU control: a=e^{-k gap}, v=s^2 (1-a^2)/(2k)."""
    kappa = -np.log(a) / gap
    sigma = float(np.sqrt(v * 2.0 * kappa / (1.0 - a * a)))
    return float(kappa), sigma


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from highdim_ou_dp import simulate_observations

    obs = simulate_observations(jax.random.key(3), obs_every=0.1)
    y = np.asarray(obs.values, dtype=np.float64)  # [51, 32]
    gap = 0.1
    a, mu, v = ar1_mle(y)
    print(f"AR(1) MLE over the actual dataset: a={a:.5f} mu={mu:.4f} v={v:.6f}")
    print(f"true theta: kappa=1.2 mu=0.8 sigma=0.5   (data: EM dt=0.01, {y.shape})")
    for dt in (0.05, 0.025, 0.0125):
        n = round(gap / dt)
        k, s = em_theta_from_ar1(a, v, dt, n)
        print(f"theta* under EM model dt={dt:<7} (n={n:>2}): kappa={k:.4f} mu={mu:.4f} sigma={s:.4f}")
    k, s = exact_theta_from_ar1(a, v, gap)
    print(f"theta* under exact OU transitions      : kappa={k:.4f} mu={mu:.4f} sigma={s:.4f}")


if __name__ == "__main__":
    main()
