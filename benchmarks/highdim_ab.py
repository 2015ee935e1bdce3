"""Ladder-5 mechanism A/B: does the bridge variance collapse track the IW
estimator (round 5, BASELINE.md)?

bridge_diagnosis.py measured the trained ladder-5 bridges SATURATED at the
DIAG_MIN cholesky floor (0.0105 vs the true-bridge optimum 0.354 at
midpoints), which mechanically produces the sigma underestimate (implied
sigma_hat 0.176 == recovered sigma 0.178). Two candidate drivers:

  (a) the IW-8 bound: the reparameterized IWAE gradient for the PATH model is
      the plain estimator (no DReG), whose inference-network SNR degrades
      with K (Rainforth et al. 2018) — q can drift to degenerate variance;
  (b) the obs-variance anneal end point (1e-4): at obs-landing steps the
      optimal transition std is sqrt(r/dt) = 0.045, and the huge obs term may
      swamp the entropy pull at midpoints too.

This harness trains the SAME model/config grid at matched path-count per
step (4096 paths: K=1 x batch 4096 vs K=8 x batch 512), fixed obs variance
0.01 (no anneal) to isolate (a), then one K=1 run with the anneal to isolate
(b). After each run it measures the bridge statistics inline (EMA params):
midpoint-step cholesky diag, obs RMS, implied sigma_hat, recovered theta.

Usage: python benchmarks/highdim_ab.py [--iters 4000] [--configs k1,k8,k1anneal]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax
import jax.numpy as jnp

import viforsdes_tpu as vt
from highdim_ou_dp import HighDimOU, simulate_observations

TRUE_THETA = (1.2, 0.8, 0.5)
DT = 0.05


def bridge_stats(posterior, observations, batch: int = 256) -> dict:
    """Midpoint/obs-landing transition-cholesky stats at the posterior-mean
    theta (same probe as bridge_diagnosis.py, but on a live posterior)."""
    from viforsdes_tpu.inference.path_sampler import sample_diffusion_paths

    obs_times = np.asarray(observations.times)
    obs_values = np.asarray(observations.values)
    obs_idx = np.round(obs_times / DT).astype(int)

    theta_mean = np.asarray(posterior.summary(n_samples=512).sde_parameter_mean)
    theta = jnp.tile(jnp.asarray(theta_mean, jnp.float32)[None], (batch, 1))
    x0 = jnp.tile(jnp.asarray(obs_values[0])[None], (batch, 1))

    sample = sample_diffusion_paths(
        posterior.model.encoder, posterior.model.head, posterior.ema_params,
        jnp.asarray(obs_values), theta, x0, DT, posterior.state_space,
        jax.random.key(42), compute_dtype=jnp.float32,
        sde=getattr(posterior, "sde", None),
    )
    z = np.asarray(sample.z)
    chol = np.asarray(sample.transition_cholesky)
    d = z.shape[-1]
    if chol.ndim == 3:  # diag-cholesky head: [B, T, D] already diagonal
        diag = chol
    else:
        diag = chol[..., np.arange(d), np.arange(d)]

    n_steps = chol.shape[1]
    landing = np.zeros(n_steps, bool)
    landing[obs_idx[obs_idx > 0] - 1] = True
    mid = ~landing

    incr = z[:, 1:] - z[:, :-1]
    drift = np.asarray(HighDimOU().drift(sample.z[:, :-1], theta[:, None, :]))
    resid = incr - drift * DT
    return {
        "theta_posterior_mean": theta_mean.tolist(),
        "chol_diag_median_midpoint": float(np.median(diag[:, mid])),
        "chol_diag_median_obs_landing": float(np.median(diag[:, landing])),
        "implied_sigma_hat": float(np.sqrt(np.mean(resid**2) / DT)),
        "path_rms_at_obs": float(
            np.sqrt(np.mean((z[:, obs_idx] - obs_values[None]) ** 2))
        ),
    }


def run_one(name: str, observations, *, iters: int, iw: int, batch: int,
            obs_var_final: float | None, anneal_steps: int,
            accum: int = 1) -> dict:
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=HighDimOU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.01),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=DT, batch_size=batch, n_iterations=iters,
                theta_warmup_steps=500, iw_samples=iw,
                theta_full_covariance=True,
                grad_accum_steps=accum,
                obs_variance_final=obs_var_final,
                obs_variance_anneal_steps=anneal_steps,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=128, num_layers=2),
            sde_param_positive_dims=[0, 2],
            sde_param_init_std=0.5,
            param_names=["kappa", "mu", "sigma"],
            pretrain=vt.PretrainConfig(),
            console=vt.Console(enabled=False),
        ),
    )
    elapsed = time.perf_counter() - t0
    s = posterior.summary(n_samples=2048)
    mean = np.asarray(s.sde_parameter_mean)
    std = np.asarray(s.sde_parameter_std)
    z = (mean - np.asarray(TRUE_THETA)) / std
    out = {
        "name": name,
        "iters": iters, "iw": iw, "batch": batch, "accum": accum,
        "obs_var_final": obs_var_final, "anneal_steps": anneal_steps,
        "seconds": round(elapsed, 1),
        "posterior_mean": dict(zip(("kappa", "mu", "sigma"), mean.tolist())),
        "posterior_std": dict(zip(("kappa", "mu", "sigma"), std.tolist())),
        "z_scores": dict(zip(("kappa", "mu", "sigma"),
                             [round(abs(v), 2) for v in z.tolist()])),
        "bridge": bridge_stats(posterior, observations),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--configs", default="k1,k8,k1anneal")
    args = ap.parse_args()

    observations = simulate_observations(jax.random.key(3), obs_every=0.1)
    grid = {
        # matched 4096 paths/step; microbatch 1024 matches the r5 run's
        # memory footprint (batch 4096 in ONE microbatch OOMs: 28 G > 15.75 G)
        "k1": dict(iw=1, batch=4096, accum=4, obs_var_final=None,
                   anneal_steps=0),
        "k8": dict(iw=8, batch=512, obs_var_final=None, anneal_steps=0),
        "k1anneal": dict(iw=1, batch=4096, accum=4, obs_var_final=1e-4,
                         anneal_steps=args.iters // 2),
    }
    results = []
    for name in args.configs.split(","):
        results.append(run_one(name, observations, iters=args.iters, **grid[name]))

    out = Path(__file__).parent / "results_highdim_ab.json"
    out.write_text(json.dumps(results, indent=2))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
