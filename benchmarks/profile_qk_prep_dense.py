"""End-to-end A/B of the fused QK-prep kernel on the DENSE (short-grid) path.

The Lorenz trace showed RMS-norm -> RoPE compiling to fp32-streaming loop
fusions on the flash path; the same streams exist at the OU headline shape
(S=101, dense SDPA path). ops/attention.py can route the dense path through
the same Pallas kernel behind VIFORSDES_QK_PREP_DENSE (two extra transposes
to/from the kernel's [B, H, S, D] layout).

Measurement format: scan-chunked dispatch (chunk 20 — per-step dispatch RTT
would swamp a sub-ms effect) + interleaved same-process windows.

Usage: python benchmarks/profile_qk_prep_dense.py [--steps 100] [--chunk 20]
         [--windows 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(env_val: str):
    import jax
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    os.environ["VIFORSDES_QK_PREP_DENSE"] = env_val
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
    return trainer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100, help="steps per window")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5, help="windows PER VARIANT")
    args = ap.parse_args()
    assert args.steps % args.chunk == 0

    import jax
    import jax.numpy as jnp

    variants = {}
    for tag, env_val in (("unfused", "0"), ("qk_prep_dense", "1")):
        tr = build(env_val)  # env read at trace time: compile under own env
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
