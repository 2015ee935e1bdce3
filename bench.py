"""Benchmark: ELBO training steps/sec on the OU headline config.

Config matches the reference's ``examples/ornstein_uhlenbeck.py:59-82``:
OU 1-D, 6 observations, T=5, dt=0.05 (100 path steps), batch 128,
encoder 256 hidden / 4 heads / 8 deep, head 64 hidden / 2 GRU layers.

Prints ONE JSON line:
  {"metric": "ou_train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is computed
against the first number this repo recorded on TPU (REFERENCE_STEPS_PER_SEC
below) so later rounds show relative progress; null until established.
"""

from __future__ import annotations

import json
import sys
import time

import jax

# First TPU v5e measurement of this implementation (round 1); later rounds are
# compared against it. See BASELINE.md.
REFERENCE_STEPS_PER_SEC: float | None = 52.9

WARMUP_STEPS = 3
TIMED_STEPS = 50


def main() -> None:
    from __graft_entry__ import _make_trainer
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    class OU:
        state_dim = 1
        sde_param_dim = 3

        def drift(self, x, p):
            return p[..., 0:1] * (p[..., 1:2] - x)

        def diffusion(self, x, p):
            return p[..., 2:3][..., None]

    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
    )
    trainer = VariationalInferenceTrainer(
        sde=OU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.TrainingConfig(time_step=0.05, batch_size=128, n_iterations=1),
        encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
    )

    params, opt_state, ema = trainer.params, trainer.opt_state, trainer.ema_params
    step_fn = trainer._train_step

    for i in range(WARMUP_STEPS):
        key = jax.random.fold_in(trainer._train_key, i)
        params, opt_state, ema, metrics = step_fn(params, opt_state, ema, key)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(WARMUP_STEPS, WARMUP_STEPS + TIMED_STEPS):
        key = jax.random.fold_in(trainer._train_key, i)
        params, opt_state, ema, metrics = step_fn(params, opt_state, ema, key)
    jax.block_until_ready(metrics)
    elapsed = time.perf_counter() - t0

    steps_per_sec = TIMED_STEPS / elapsed
    elbo = float(metrics.elbo)
    if not (elbo == elbo):  # NaN guard: a broken step must not report a speed
        print(json.dumps({"metric": "ou_train_steps_per_sec", "value": 0.0,
                          "unit": "steps/s", "vs_baseline": None,
                          "error": "non-finite ELBO"}))
        sys.exit(1)

    vs_baseline = (
        steps_per_sec / REFERENCE_STEPS_PER_SEC if REFERENCE_STEPS_PER_SEC else None
    )
    print(
        json.dumps(
            {
                "metric": "ou_train_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
