"""sit_stack adjudication shot (round-3 verdict weak #5 / task 7): one focused
end-to-end measurement at the shape where whole-stack fusion SHOULD win —
small S (inter-block HBM traffic dominates, attention is tiny) and a deep
stack — before the family is adopted or deleted.

Shape: OU with dt=0.25 (S=21 grid tokens), batch 512, encoder 256 wide,
depth 8 and 16. At S=21 the attention probs are [B, H, 21, 21] (trivial), so
the step is dominated by per-block LN/QKV/MLP streams whose fusion across the
whole stack is exactly what sit_stack sells.

Usage: python benchmarks/profile_sit_stack_smalls.py [--steps 100] [--chunk 20]
         [--windows 5] [--depths 8,16]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(mode: str, depth: int):
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

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
        config=vt.TrainingConfig(time_step=0.25, batch_size=512, n_iterations=1),
        encoder_config=vt.EncoderConfig(
            hidden_dim=256, cond_dim=256, num_heads=4, depth=depth,
            fused_blocks=mode,
        ),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--depths", default="8,16")
    args = ap.parse_args()
    assert args.steps % args.chunk == 0

    import jax
    import jax.numpy as jnp

    variants = {}
    for depth in (int(d) for d in args.depths.split(",")):
        for mode in ("off", "on"):
            tag = f"d{depth}_{mode}"
            tr = build(mode, depth)
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
