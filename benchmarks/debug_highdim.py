"""Instrumented short highdim run: locate the divergence step of the ladder-5
config (the 91-min round-3 run at obs_variance=0.01 ended all-NaN).

Prints ELBO + theta posterior means every flush so the failure mode is
visible: gradual sigma collapse vs instant blow-up.

Usage: python benchmarks/debug_highdim.py [--iters 3000] [--obs-variance 0.01]
         [--iw 8] [--full-cov] [--obs-every 0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--obs-variance", type=float, default=0.01)
    ap.add_argument("--obs-every", type=float, default=0.1)
    ap.add_argument("--iw", type=int, default=8)
    ap.add_argument("--full-cov", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=500)
    args = ap.parse_args()

    import jax
    import numpy as np
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
    from highdim_ou_dp import HighDimOU, simulate_observations

    observations = simulate_observations(jax.random.key(3), obs_every=args.obs_every)
    trainer = VariationalInferenceTrainer(
        sde=HighDimOU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(
            variance=args.obs_variance
        ),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.TrainingConfig(
            time_step=0.05, batch_size=args.batch, n_iterations=args.iters,
            theta_warmup_steps=args.warmup,
            iw_samples=args.iw, theta_full_covariance=args.full_cov,
        ),
        encoder_config=vt.EncoderConfig(
            hidden_dim=256, cond_dim=256, num_heads=4, depth=8
        ),
        head_config=vt.HeadConfig(hidden_dim=128, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        sde_param_init_std=0.5,
        console=vt.Console(enabled=False),
    )
    mean = trainer.pretrain_sde_parameters(vt.PretrainConfig())
    trainer.set_theta_mean(mean)
    print(f"pretrain mean (unconstrained): {np.asarray(mean)}", flush=True)

    def cb(step, elbo):
        if step % 100 == 0:
            print(f"step {step}: elbo {elbo:.2f}", flush=True)

    state = trainer.train(callback=cb, update_interval=100)
    hist = np.asarray(state.evidence_lower_bound_history)
    bad = np.flatnonzero(~np.isfinite(hist))
    print(f"first non-finite ELBO at step: {bad[0] if bad.size else 'never'}",
          flush=True)
    # theta posterior state at the end
    theta = state.params["theta"]
    for k, v in theta.items():
        print(f"theta param {k}: {np.asarray(v)}", flush=True)


if __name__ == "__main__":
    main()
