"""Long-grid (Lorenz-63 shape) profile: dense XLA attention vs flash.

Times the encoder fwd / fwd+bwd and the FULL Lorenz train step at
B=32, S=2001, E=256, 4 heads, depth 8 in one process, interleaving windows
(BASELINE.md measurement discipline). The flash/dense choice is made at trace
time from VIFORSDES_DISABLE_FLASH, so each variant is traced+compiled
explicitly with the env var set.

Usage: python benchmarks/profile_longgrid.py [--iters 10] [--windows 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def timed_windows(fns: dict, run_one, windows: int, iters: int) -> dict:
    results = {k: [] for k in fns}
    for _ in range(windows):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            run_one(fn, iters)
            results[key].append((time.perf_counter() - t0) / iters * 1000)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--encoder-only", action="store_true")
    args = ap.parse_args()

    from viforsdes_tpu.config import EncoderConfig
    from viforsdes_tpu.models.encoder import ObservationContextEncoder
    from lorenz63 import simulate_observations

    observations = simulate_observations(jax.random.key(17))
    obs = jnp.asarray(observations.values)
    B = args.batch
    theta = jax.random.normal(jax.random.key(1), (B, 3))

    enc = ObservationContextEncoder.build(
        3,
        3,
        EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
        obs_times=np.asarray(observations.times),
        time_horizon=20.0,
        time_step=0.01,
    )
    params = enc.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(7), p.shape), params
    )
    print(f"grid length S = {enc.n_grid}", flush=True)

    fns = {}
    for variant in ("dense", "flash"):
        os.environ["VIFORSDES_DISABLE_FLASH"] = "1" if variant == "dense" else ""
        os.environ["VIFORSDES_FLASH"] = "" if variant == "dense" else "1"

        # Fresh closures per variant: the jit trace cache is keyed on the
        # function object, and the flash/dense choice is made at trace time.
        def fwd(p, th, _v=variant):
            return enc(p, obs, th).sum()

        for kind, f in (("fwd", fwd), ("fwdbwd", jax.grad(fwd, argnums=(0, 1)))):
            t0 = time.perf_counter()
            compiled = jax.jit(f).lower(params, theta).compile()
            print(f"compile {variant}/{kind}: {time.perf_counter() - t0:.1f}s", flush=True)
            fns[(variant, kind)] = compiled
    os.environ.pop("VIFORSDES_DISABLE_FLASH", None)

    # correctness cross-check
    for kind in ("fwd", "fwdbwd"):
        a = jax.tree.leaves(fns[("dense", kind)](params, theta))
        b = jax.tree.leaves(fns[("flash", kind)](params, theta))
        rel = max(
            float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-9))
            for x, y in zip(a, b)
        )
        print(f"{kind}: dense vs flash rel-diff {rel:.2e} (bf16 tolerance ~1e-2)")

    results = timed_windows(
        fns,
        lambda fn, n: jax.block_until_ready([fn(params, theta) for _ in range(n)][-1]),
        args.windows,
        args.iters,
    )
    print("\n== encoder timings (ms, median over windows) ==")
    for key, times in results.items():
        print(f"{key[0]:>6s} {key[1]:>7s}: {statistics.median(times):8.3f} ms   "
              f"windows={[f'{t:.2f}' for t in times]}")

    if args.encoder_only:
        return

    # ---- full Lorenz train step, dense vs flash -------------------------
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
    from lorenz63 import StochasticLorenz63

    step_fns = {}
    states = {}
    for variant in ("dense", "flash"):
        os.environ["VIFORSDES_DISABLE_FLASH"] = "1" if variant == "dense" else ""
        os.environ["VIFORSDES_FLASH"] = "" if variant == "dense" else "1"
        tr = VariationalInferenceTrainer(
            sde=StochasticLorenz63(),
            observations=observations,
            observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
            prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
            time_horizon=20.0,
            config=vt.TrainingConfig(time_step=0.01, batch_size=B, n_iterations=1),
            encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
            head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
            state_positive_dims=[],
            sde_param_positive_dims=[0, 1, 2],
            console=vt.Console(enabled=False),
        )
        t0 = time.perf_counter()
        p, o, e, mx = tr._train_step(tr.params, tr.opt_state, tr.ema_params, tr._train_key)
        jax.block_until_ready(mx)
        print(f"compile step/{variant}: {time.perf_counter() - t0:.1f}s", flush=True)
        step_fns[variant] = tr._train_step
        states[variant] = [p, o, e, tr._train_key]
    os.environ.pop("VIFORSDES_DISABLE_FLASH", None)

    step_results = {v: [] for v in step_fns}
    for w in range(args.windows):
        for v, fn in step_fns.items():
            p, o, e, k = states[v]
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, e, mx = fn(p, o, e, jax.random.fold_in(k, w * args.iters + i))
            jax.block_until_ready(mx)
            step_results[v].append((time.perf_counter() - t0) / args.iters * 1000)
            states[v] = [p, o, e, k]

    print("\n== full Lorenz train step (ms, median) ==")
    for v, times in step_results.items():
        med = statistics.median(times)
        print(f"{v:>6s}: {med:8.2f} ms = {1000/med:6.2f} steps/s   "
              f"windows={[f'{t:.1f}' for t in times]}")


if __name__ == "__main__":
    main()
