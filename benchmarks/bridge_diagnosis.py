"""Mechanism probe for the ladder-5 sigma/kappa underestimate (round 5).

Hypothesis (BASELINE.md round-5): the variational bridges are
NEAR-DETERMINISTIC at the unobserved midpoints between observations.  With
obs every 0.1 and dt=0.05 there is exactly one latent midpoint per gap; the
true conditional (Brownian-bridge) std of the midpoint-step transition is
sigma/sqrt(2) in transition-cholesky units (= sqrt(sigma^2 dt/2) absolute).
If q's learned transition std at midpoint steps is far below that, the
sampled increments carry too little quadratic variation and the ELBO's
sigma estimate collapses toward sqrt(E[(dz - f dt)^2]/dt) < sigma — and the
drift regression on over-smoothed paths drags kappa down with it.

This script loads a ladder-5 trainer checkpoint (EMA params), rebuilds the
model, samples paths at a given theta, and reports:
  - median diag(transition_cholesky) at midpoint steps vs obs-landing steps
    (cholesky units: directly comparable to sigma; optimal midpoint value is
    sigma/sqrt(2) ~= 0.354 at truth, optimal obs-landing value is
    obs_std/sqrt(dt) ~= 0.045 at the annealed claim 1e-4... see below);
  - the implied sigma_hat^2 = E[(dz - f(z, theta) dt)^2]/dt the SDE term of
    the ELBO would fit;
  - RMS distance of sampled paths from the observations at obs indices.

CPU-friendly (small batch). Usage:
    python benchmarks/bridge_diagnosis.py [--ckpt ckpt_highdim_r5.npz]
                                          [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt_highdim_r5.npz")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--obs-every", type=float, default=0.1)
    args = ap.parse_args()

    import viforsdes_tpu as vt
    from highdim_ou_dp import HighDimOU, simulate_observations
    from viforsdes_tpu.config import EncoderConfig, HeadConfig
    from viforsdes_tpu.core.state_space import StateSpace
    from viforsdes_tpu.inference.path_sampler import sample_diffusion_paths
    from viforsdes_tpu.models.model import VariationalSDEPosterior
    from viforsdes_tpu.utils.pytree_io import unflatten_like

    dt = 0.05
    obs = simulate_observations(jax.random.key(3), obs_every=args.obs_every)
    obs_times = np.asarray(obs.times)
    obs_values = np.asarray(obs.values)
    obs_idx = np.round(obs_times / dt).astype(int)

    model = VariationalSDEPosterior(
        observation_dim=32,
        state_dim=32,
        sde_param_dim=3,
        encoder_config=EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
        head_config=HeadConfig(hidden_dim=128, num_layers=2),
        sde_param_positive_dims=[0, 2],
        obs_times=obs_times,
        time_horizon=5.0,
        time_step=dt,
        theta_full_covariance=True,
    )
    template = model.init(jax.random.key(0))

    ckpt_path = Path(__file__).parent / args.ckpt
    flat = dict(np.load(ckpt_path, allow_pickle=False))
    ema = {
        k[len("ema/"):]: v for k, v in flat.items() if k.startswith("ema/")
    }
    params = unflatten_like(template, ema)

    sde = HighDimOU()
    state_space = StateSpace(32, [])
    x0 = jnp.tile(jnp.asarray(obs_values[0])[None], (args.batch, 1))

    # theta posterior mean in constrained space (kappa, mu, sigma)
    mean_u = np.asarray(flat["params/theta/mean"])
    theta_mean = mean_u.copy()
    theta_mean[[0, 2]] = np.exp(mean_u[[0, 2]])

    report = {"ckpt": args.ckpt, "theta_posterior_mean": theta_mean.tolist()}
    for label, theta_vec in (
        ("posterior_mean", theta_mean),
        ("truth", np.array([1.2, 0.8, 0.5])),
    ):
        theta = jnp.tile(jnp.asarray(theta_vec, dtype=jnp.float32)[None],
                         (args.batch, 1))
        sample = sample_diffusion_paths(
            model.encoder, model.head, params, jnp.asarray(obs_values),
            theta, x0, dt, state_space, jax.random.key(42),
            compute_dtype=jnp.float32,
        )
        z = np.asarray(sample.z)                       # [B, T+1, D]
        chol = np.asarray(sample.transition_cholesky)  # [B, T, D, D]
        diag = chol[..., np.arange(32), np.arange(32)]  # [B, T, D]

        n_steps = chol.shape[1]
        step_has_obs_landing = np.zeros(n_steps, bool)
        step_has_obs_landing[obs_idx[obs_idx > 0] - 1] = True  # step t -> t+1
        mid = ~step_has_obs_landing

        incr = z[:, 1:] - z[:, :-1]                    # [B, T, D]
        drift = np.asarray(sde.drift(sample.z[:, :-1], theta[:, None, :]))
        resid = incr - drift * dt
        sigma_hat = float(np.sqrt(np.mean(resid**2) / dt))
        sigma_hat_mid = float(np.sqrt(np.mean(resid[:, mid] ** 2) / dt))
        sigma_hat_obs = float(
            np.sqrt(np.mean(resid[:, step_has_obs_landing] ** 2) / dt)
        )

        obs_rms = float(
            np.sqrt(np.mean((z[:, obs_idx] - obs_values[None]) ** 2))
        )
        report[label] = {
            "chol_diag_median_midpoint_steps": float(np.median(diag[:, mid])),
            "chol_diag_median_obs_landing_steps": float(
                np.median(diag[:, step_has_obs_landing])
            ),
            "optimal_midpoint_chol_at_truth": 0.5 / np.sqrt(2.0),
            "implied_sigma_hat": sigma_hat,
            "implied_sigma_hat_midpoint_steps": sigma_hat_mid,
            "implied_sigma_hat_obs_landing_steps": sigma_hat_obs,
            "path_rms_at_obs": obs_rms,
        }
        print(label, json.dumps(report[label], indent=2), flush=True)

    out = Path(__file__).parent / "results_bridge_diagnosis.json"
    out.write_text(json.dumps(report, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
