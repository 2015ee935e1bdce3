"""End-to-end A/B of the flash-path native [B, H, S, D] layout on the FULL
Lorenz step.

Round-3 trace finding (BASELINE.md): with flash active, the encoder keeps
tensors in [B, S, H, D] and transposes at every kernel boundary (plus the
RoPE in/out round-trip) — the trace shows the layout copies and the 158 GB/s
RoPE/convert streams in the elementwise bucket. The change keeps everything
between the QKV and output projections in the kernel's native [B, H, S, D]:
one transpose in, one out, RoPE applied directly.

Measured the only way this environment permits: full jitted train steps in
one process, interleaved windows (VIFORSDES_FLASH_NATIVE_LAYOUT read at
trace time).

Usage: python benchmarks/profile_flash_layout.py [--iters 20] [--windows 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def build(tag: str, env: dict):
    import jax
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
    from lorenz63 import StochasticLorenz63, simulate_observations

    for k_, v_ in env.items():
        os.environ[k_] = v_
    tr = VariationalInferenceTrainer(
        sde=StochasticLorenz63(),
        observations=simulate_observations(jax.random.key(17), obs_every=0.1),
        observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
        time_horizon=20.0,
        config=vt.TrainingConfig(time_step=0.01, batch_size=32, n_iterations=1),
        encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 1, 2],
        console=vt.Console(enabled=False),
    )
    state = [tr.params, tr.opt_state, tr.ema_params, tr._train_key]
    t0 = time.perf_counter()
    p, o, e, mx = tr._train_step(*state)
    jax.block_until_ready(mx)
    print(f"compile {tag} {env}: {time.perf_counter() - t0:.1f}s", flush=True)
    return tr, [p, o, e, state[3]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    variants = {}
    # trace order matters: each build reads the env at trace time
    for tag, env in [
        ("boundary_transposes", {"VIFORSDES_FLASH_NATIVE_LAYOUT": "0"}),
        ("native_layout", {"VIFORSDES_FLASH_NATIVE_LAYOUT": "1"}),
    ]:
        variants[tag] = build(tag, env)

    results = {t: [] for t in variants}
    for w in range(args.windows):
        for tag, (tr, state) in variants.items():
            p, o, e, k = state
            mx = None
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, e, mx = tr._train_step(p, o, e, jax.random.fold_in(k, w * 100 + i))
            jax.block_until_ready(mx)
            ms = (time.perf_counter() - t0) / args.iters * 1000
            variants[tag] = (tr, [p, o, e, k])
            results[tag].append(ms)
            print(f"window {w} {tag}: {ms:.1f} ms/step", flush=True)

    for tag, ms_list in results.items():
        med = statistics.median(ms_list)
        print(f"{tag}: median {med:.1f} ms/step ({1000/med:.2f} steps/s) windows={['%.1f'%m for m in ms_list]}")


if __name__ == "__main__":
    main()
