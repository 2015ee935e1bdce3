"""Diagnostic: does the Lorenz-63 ELBO actually prefer the collapsed theta?

Trains the path model with the theta posterior FROZEN at the (near-truth)
global-pretrain init (sde_param_lr ~ 0) and records the ELBO trail. If the
frozen-at-truth ELBO beats the collapsed run's (-1337 at 30k iters,
results_lorenz.json), the collapse is a training-dynamics artifact (theta
moves before the zero-init path model learns) and a theta-warmup freeze fixes
it; if it stays below, the variational bridges cannot represent true-theta
dynamics and the objective genuinely prefers the degenerate point.

Usage: python benchmarks/lorenz_frozen_theta.py [--iters 8000]
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
import viforsdes_tpu as vt
from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
from lorenz63 import StochasticLorenz63, simulate_observations, TRUE_PARAMS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    args = ap.parse_args()

    observations = simulate_observations(jax.random.key(17))
    trainer = VariationalInferenceTrainer(
        sde=StochasticLorenz63(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
        time_horizon=20.0,
        config=vt.TrainingConfig(
            time_step=0.01, batch_size=32, n_iterations=args.iters,
            sde_param_lr=1e-12,  # theta effectively frozen
        ),
        encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 1, 2],
        console=vt.Console(enabled=False),
    )
    import jax.numpy as jnp

    mu = trainer.pretrain_sde_parameters(
        vt.PretrainConfig(n_iterations=300, batch_size=1024)
    )
    trainer.set_theta_mean(mu)
    # tighten q(theta) so sampled theta ~ the frozen mean (clean diagnostic:
    # "ELBO with theta pinned near truth", not an average over a wide q)
    trainer.params["theta"]["log_std"] = jnp.full_like(
        trainer.params["theta"]["log_std"], -4.6
    )
    trainer.opt_state = trainer.optimizer.init(trainer.params)
    theta0 = np.where([True, True, True], np.exp(np.asarray(mu)), np.asarray(mu))
    print("frozen theta init:", theta0, "true:", TRUE_PARAMS, flush=True)

    t0 = time.perf_counter()
    state = trainer.train()
    hist = np.asarray(state.evidence_lower_bound_history)
    out = {
        "frozen_theta": [float(x) for x in theta0],
        "true_params": list(TRUE_PARAMS),
        "iters": args.iters,
        "elbo_trail": {str(k): float(np.mean(hist[max(0, k - 200):k]))
                       for k in (1000, 2000, 4000, 6000, args.iters)},
        "elbo_best": float(np.max(hist)),
        "train_seconds": round(time.perf_counter() - t0, 1),
    }
    (Path(__file__).parent / "results_lorenz_frozen.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
