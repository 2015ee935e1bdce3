"""Interleaved full-step A/B for the hoisted-padding token stream (round 5).

Measures the REAL jitted Lorenz-63 train step with VIFORSDES_PAD_HOIST=0
(flash_sdpa pads q/k/v per kernel call — the round-5 trace bills ~8 ms/step
of pad/slice churn) vs =1 (the encoder pads its token template once, S=2001
-> 2048, +2.3% matmul rows). Both programs are traced in ONE process (the
env var is read at trace time), then timed in interleaved windows so tunnel
drift hits both equally (BASELINE.md measurement discipline).

Usage: python benchmarks/profile_pad_hoist.py [--iters 20] [--windows 5]
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


def build_step(mode: str):
    os.environ["VIFORSDES_PAD_HOIST"] = mode
    import jax
    import viforsdes_tpu as vt
    from lorenz63 import StochasticLorenz63, simulate_observations
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    # identical to profile_trace.py's lorenz trainer (the traced baseline)
    observations = simulate_observations(jax.random.key(17), obs_every=0.1)
    trainer = VariationalInferenceTrainer(
        sde=StochasticLorenz63(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
        time_horizon=20.0,
        config=vt.TrainingConfig(
            time_step=0.01, batch_size=32, n_iterations=1,
        ),
        encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256,
                                        num_heads=4, depth=8),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 1, 2],
        console=vt.Console(enabled=False),
    )
    return trainer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    import jax

    modes = ["0", "1"]
    steps, states = {}, {}
    for m in modes:
        tr = build_step(m)
        steps[m] = tr._train_step
        states[m] = [tr.params, tr.opt_state, tr.ema_params, tr._train_key]
        t0 = time.perf_counter()
        p, o, e, mx = steps[m](*states[m])
        jax.block_until_ready(mx)
        states[m] = [p, o, e, states[m][3]]
        print(f"compile hoist={m}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {m: [] for m in modes}
    for w in range(args.windows):
        for m in modes:
            p, o, e, k = states[m]
            mx = None
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, e, mx = steps[m](
                    p, o, e, jax.random.fold_in(k, w * args.iters + i)
                )
            jax.block_until_ready(mx)
            states[m] = [p, o, e, k]
            ms = (time.perf_counter() - t0) / args.iters * 1000
            results[m].append(ms)
            print(f"window {w} hoist={m}: {ms:.2f} ms/step", flush=True)

    for m in modes:
        print(
            f"hoist={m}: median {statistics.median(results[m]):.2f} ms/step "
            f"(windows: {[round(x, 1) for x in results[m]]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
