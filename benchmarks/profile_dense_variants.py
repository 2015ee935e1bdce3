"""End-to-end A/B of the dense-path (OU headline) perf candidates, interleaved.

Variants (each built+compiled under its own env — the flags are read at trace
time):
  base        — round-3 defaults (dense remat SDPA, unpadded S=101)
  pad         — VIFORSDES_PAD_GRID=1: token grid padded 101 -> 128 with a
                static key mask (models/encoder.py)
  native      — VIFORSDES_DENSE_NATIVE=1: [B, H, S, D] layout between the QKV
                and output projections (ops/attention.py)
  pad_native  — both
  qkdense     — VIFORSDES_QK_PREP_DENSE=1: fused QK-prep kernel on the dense
                path (round-3 shipped-but-unmeasured knob, VERDICT weak #6)

Measurement discipline (BASELINE.md): scan-chunked dispatch, interleaved
same-process windows, median reported. Only this format is decision-grade on
this tunnel.

Usage: python benchmarks/profile_dense_variants.py [--steps 100] [--chunk 20]
         [--windows 5] [--variants base,pad,...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FLAG_SETS = {
    "base": {},
    "pad": {"VIFORSDES_PAD_GRID": "1"},
    "native": {"VIFORSDES_DENSE_NATIVE": "1"},
    "pad_native": {"VIFORSDES_PAD_GRID": "1", "VIFORSDES_DENSE_NATIVE": "1"},
    "qkdense": {"VIFORSDES_QK_PREP_DENSE": "1"},
}
ALL_FLAGS = sorted({k for fs in FLAG_SETS.values() for k in fs})


def build(flags: dict):
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    for k in ALL_FLAGS:
        os.environ.pop(k, None)
    os.environ.update(flags)
    return VariationalInferenceTrainer(
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100, help="steps per window")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5, help="windows PER VARIANT")
    ap.add_argument("--variants", default=",".join(FLAG_SETS))
    args = ap.parse_args()
    assert args.steps % args.chunk == 0
    names = args.variants.split(",")

    import jax
    import jax.numpy as jnp

    variants = {}
    for tag in names:
        tr = build(FLAG_SETS[tag])
        chunk_fn = tr._get_train_chunk(args.chunk)
        state = {"params": tr.params, "opt": tr.opt_state,
                 "ema": tr.ema_params, "idx": 0}

        def run(n, tr=tr, chunk_fn=chunk_fn, state=state):
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

        t0 = time.perf_counter()
        run(args.chunk)
        print(f"compile {tag}: {time.perf_counter() - t0:.1f}s", flush=True)
        variants[tag] = run

    results = {t: [] for t in variants}
    for w in range(args.windows):
        for tag, fn in variants.items():
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
