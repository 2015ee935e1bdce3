"""End-to-end A/B of scan-chunked dispatch (steps_per_call) on the OU headline.

The train step is one XLA program; per-step dispatch pays one host->device
RTT per optimizer step, which on this tunneled TPU leaves the chip idle
between steps (device-op trace sum 9.0 ms/step vs ~11 ms wall, BASELINE.md).
The chunked path (trainer._get_train_chunk) wraps K steps in one jitted
lax.scan with the identical key sequence.

Interleaved same-process windows (the only decision-grade format on this
tunnel): each window runs N steps either as N single dispatches or as N/K
chunk dispatches, alternating variants.

Usage: python benchmarks/profile_dispatch.py [--steps 100] [--chunk 20] [--windows 5]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100, help="steps per window")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5, help="windows PER VARIANT")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    assert args.steps % args.chunk == 0

    trainer = VariationalInferenceTrainer(
        sde=type("OU", (), {
            "state_dim": 1, "sde_param_dim": 3,
            "drift": lambda self, x, p: p[..., 0:1] * (p[..., 1:2] - x),
            "diffusion": lambda self, x, p: p[..., 2:3][..., None],
        })(),
        observations=vt.Observations(
            times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
            values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
        ),
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.TrainingConfig(time_step=0.05, batch_size=128, n_iterations=1),
        encoder_config=vt.EncoderConfig(
            hidden_dim=256, cond_dim=256, num_heads=4, depth=8
        ),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
    )

    state = {"params": trainer.params, "opt": trainer.opt_state,
             "ema": trainer.ema_params, "idx": 0}

    def run_single(n):
        m = None
        for _ in range(n):
            key = jax.random.fold_in(trainer._train_key, state["idx"])
            state["params"], state["opt"], state["ema"], m = trainer._train_step(
                state["params"], state["opt"], state["ema"], key
            )
            state["idx"] += 1
        jax.block_until_ready(m)

    chunk_fn = trainer._get_train_chunk(args.chunk)

    def run_chunked(n):
        m = None
        for _ in range(n // args.chunk):
            steps_arr = jnp.arange(
                state["idx"], state["idx"] + args.chunk, dtype=jnp.int32
            )
            scales = jnp.ones(args.chunk, dtype=jnp.float32)
            state["params"], state["opt"], state["ema"], m = chunk_fn(
                state["params"], state["opt"], state["ema"], steps_arr, scales
            )
            state["idx"] += args.chunk
        jax.block_until_ready(m)

    # compile both + warm up
    t0 = time.perf_counter()
    run_single(2)
    print(f"compile single: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run_chunked(args.chunk)
    print(f"compile chunk[{args.chunk}]: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {"single": [], "chunked": []}
    for w in range(args.windows):
        for tag, fn in (("single", run_single), ("chunked", run_chunked)):
            t0 = time.perf_counter()
            fn(args.steps)
            ms = (time.perf_counter() - t0) / args.steps * 1000
            results[tag].append(ms)
            print(f"window {w} {tag}: {ms:.2f} ms/step", flush=True)

    for tag, xs in results.items():
        med = statistics.median(xs)
        print(
            f"{tag}: median {med:.2f} ms/step ({1000/med:.1f} steps/s) "
            f"windows={[f'{x:.2f}' for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
