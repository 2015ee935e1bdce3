"""Exact optimum of the ladder-5 objective as a function of the CLAIMED
observation variance (CPU, closed-form Kalman likelihood).

The ladder-5 observations are NOISELESS trajectory values
(`examples/highdim_ou_dp.py:37-43`), but the likelihood claims a fixed
Gaussian variance v. Under the EM model class at training dt, each dimension
is an exact linear-Gaussian state-space model

    x_{k+1} = mu + a (x_k - mu) + w_k,   w ~ N(0, q)        (gap = n EM steps)
    y_k     = x_k + e_k,                 e ~ N(0, v)

    a = (1 - kappa dt)^n,   q = sigma^2 dt sum_{i<n} (1 - kappa dt)^{2i}

so the marginal likelihood of the observations is a Kalman filter and the
MLE over (kappa, mu, sigma) AT CLAIM v is computable exactly. This separates
the two failure axes that four rounds of ladder-5 runs have conflated:

  * theta*(v): the bias ANY inference method inherits from claiming noise
    that is not in the data (the ELBO's own optimum books ~2v per gap of real
    path variation as observation noise);
  * theta_hat - theta*(v): what the variational machinery owes on top.

Also reports the exact-posterior stds (inverse observed Fisher, flat prior)
at each optimum: the 2-sigma mandate is unreachable at claim v if even
theta*(v) sits more than ~2 exact stds from truth.

Reference objective being analysed: observation term of
`/root/reference/src/variational_sde/inference/evidence_lower_bound.py:19-83`
with the likelihood variance of `observations.py:39-74`.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
from scipy.optimize import minimize

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

GAP = 0.1
TRUTH = np.array([1.2, 0.8, 0.5])


def kalman_nll(theta: np.ndarray, y: np.ndarray, v: float, dt: float) -> float:
    """Pooled negative log-lik of y [K, D] under the per-dim EM state-space
    model at claim v. x0 is observed exactly (the trainer conditions on it)."""
    kappa, mu, sigma = theta
    n = round(GAP / dt)
    one = 1.0 - kappa * dt
    a = one**n
    q = sigma**2 * dt * sum(one ** (2 * i) for i in range(n))
    if q <= 0 or not np.isfinite(q):
        return 1e12

    K, D = y.shape
    # filter state per dim: mean m [D], common variance p (shared scalar —
    # identical dynamics and identical v across dims keep p dim-independent)
    m = y[0].copy()  # x0 pinned at the first observation (noiseless init)
    p = 0.0
    nll = 0.0
    for k in range(1, K):
        mp = mu + a * (m - mu)
        pp = a * a * p + q
        s = pp + v
        r = y[k] - mp
        nll += 0.5 * (D * np.log(2 * np.pi * s) + float(r @ r) / s)
        g = pp / s
        m = mp + g * r
        p = (1.0 - g) * pp
    return nll


def mle_at_claim(y: np.ndarray, v: float, dt: float):
    x0 = np.array([1.0, 0.7, 0.4])
    best = None
    for start in (x0, TRUTH, np.array([0.6, 0.5, 0.2])):
        res = minimize(
            kalman_nll, start, args=(y, v, dt), method="Nelder-Mead",
            options={"xatol": 1e-8, "fatol": 1e-10, "maxiter": 4000},
        )
        if best is None or res.fun < best.fun:
            best = res
    theta = best.x
    # observed Fisher -> exact posterior stds (flat prior approximation)
    eps = 1e-4
    H = np.zeros((3, 3))
    f0 = kalman_nll(theta, y, v, dt)
    for i in range(3):
        for j in range(3):
            ei = np.eye(3)[i] * eps
            ej = np.eye(3)[j] * eps
            H[i, j] = (
                kalman_nll(theta + ei + ej, y, v, dt)
                - kalman_nll(theta + ei - ej, y, v, dt)
                - kalman_nll(theta - ei + ej, y, v, dt)
                + kalman_nll(theta - ei - ej, y, v, dt)
            ) / (4 * eps * eps)
    try:
        std = np.sqrt(np.diag(np.linalg.inv(H)))
    except np.linalg.LinAlgError:
        std = np.full(3, np.nan)
    return theta, std, f0


def main() -> None:
    global GAP
    import jax

    jax.config.update("jax_platforms", "cpu")
    from highdim_ou_dp import simulate_observations

    if "--gap" in sys.argv:
        # observation spacing of the dataset under analysis (0.1 = the
        # committed ladder-5 recipe's 51-obs dataset; 0.25 = run_highdim's
        # default 21-obs dataset)
        i = sys.argv.index("--gap")
        GAP = float(sys.argv[i + 1])
        del sys.argv[i : i + 2]
    obs = simulate_observations(jax.random.key(3), obs_every=GAP)
    y = np.asarray(obs.values, dtype=np.float64)
    noisy = "--noisy" in sys.argv
    if noisy:
        # correctly-specified variant: add the claimed observation noise to
        # the data (y = x + N(0, 0.01)); the MLE is then consistent and the
        # sweep reports how far the CORRECT model's optimum sits from truth.
        # Matches simulate_observations(noise_std=0.1) exactly, including the
        # zeroed first row (x0 is conditioned on, never noised).
        sys.argv.remove("--noisy")
        rng = np.random.default_rng(3)
        noise = 0.1 * rng.standard_normal(y.shape)
        noise[0] = 0.0
        y = y + noise
    dt = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05

    rows = []
    print(f"dataset {y.shape}, truth {TRUTH.tolist()}, model dt={dt}")
    print(f"{'claim v':>10} | {'kappa*':>7} {'mu*':>7} {'sigma*':>7} | "
          f"{'std_k':>7} {'std_m':>7} {'std_s':>7} | z*(truth)")
    for v in (0.1, 0.01, 3e-3, 1e-3, 3e-4, 1e-4, 1e-6):
        theta, std, nll = mle_at_claim(y, v, dt)
        z = np.abs(theta - TRUTH) / std
        rows.append({
            "claim": v, "theta_star": theta.tolist(),
            "exact_std": std.tolist(), "z_at_truth": z.tolist(),
            "nll": nll,
        })
        print(f"{v:>10.1e} | {theta[0]:7.4f} {theta[1]:7.4f} {theta[2]:7.4f} | "
              f"{std[0]:7.4f} {std[1]:7.4f} {std[2]:7.4f} | "
              f"{z[0]:5.2f} {z[1]:5.2f} {z[2]:5.2f}")

    name = "results_claim_sweep_noisy.json" if noisy else "results_claim_sweep.json"
    if GAP != 0.1:
        name = name.replace(".json", f"_gap{GAP:g}.json")
    out = Path(__file__).parent / name
    out.write_text(json.dumps({"dt": dt, "noisy": noisy, "rows": rows}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
