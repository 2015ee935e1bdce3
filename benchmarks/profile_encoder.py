"""Interleaved encoder micro-benchmark: XLA vs the fused whole-stack kernel.

Times encoder forward AND forward+backward at the OU headline shape
(B=128, S=101, E=256, 4 heads, depth 8) in ONE process, interleaving
measurement windows round-robin so tunnel drift hits all variants equally
(BASELINE.md measurement discipline). Can also time the full train step per
mode (--full-step).

Usage:  python benchmarks/profile_encoder.py [--modes off,on] [--iters 30]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_encoder(mode: str, *, hidden=256, heads=4, depth=8):
    from viforsdes_tpu.config import EncoderConfig
    from viforsdes_tpu.models.encoder import ObservationContextEncoder

    return ObservationContextEncoder.build(
        1,
        3,
        EncoderConfig(
            hidden_dim=hidden, cond_dim=hidden, num_heads=heads, depth=depth,
            fused_blocks=mode,
        ),
        obs_times=np.asarray([0.0, 1.0, 2.0, 3.0, 4.0, 5.0]),
        time_horizon=5.0,
        time_step=0.05,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="off,on")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--full-step", action="store_true", help="also time the full train step")
    ap.add_argument("--sampler", action="store_true", help="also time the head sampler")
    args = ap.parse_args()
    modes = args.modes.split(",")

    B = args.batch
    obs = jnp.asarray([[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]])
    theta = jax.random.normal(jax.random.key(1), (B, 3))

    encoders = {m: build_encoder(m) for m in modes}
    params = encoders[modes[0]].init(jax.random.key(0))
    # activate adaLN + out_proj so gradients are non-trivial
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(7), p.shape), params
    )

    fns = {}
    for m, enc in encoders.items():
        def fwd(p, th, enc=enc):
            return enc(p, obs, th).sum()

        fns[(m, "fwd")] = jax.jit(fwd)
        fns[(m, "fwdbwd")] = jax.jit(jax.grad(fwd, argnums=(0, 1)))

    # compile + correctness cross-check
    outs = {}
    for (m, kind), fn in fns.items():
        t0 = time.perf_counter()
        outs[(m, kind)] = jax.block_until_ready(fn(params, theta))
        print(f"compile {m}/{kind}: {time.perf_counter() - t0:.1f}s", flush=True)
    base = modes[0]
    for m in modes[1:]:
        g0 = jax.tree.leaves(outs[(base, "fwdbwd")])
        g1 = jax.tree.leaves(outs[(m, "fwdbwd")])
        rel = max(
            float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
            for a, b in zip(g0, g1)
        )
        print(f"grad rel-diff {base} vs {m}: {rel:.2e} (bf16 MXU tolerance ~1e-2)")

    results: dict[tuple, list] = {k: [] for k in fns}
    for w in range(args.windows):
        for key, fn in fns.items():
            out = None
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(params, theta)
            jax.block_until_ready(out)
            results[key].append((time.perf_counter() - t0) / args.iters * 1000)

    print("\n== encoder timings (ms, median over windows) ==")
    for key, times in results.items():
        med = statistics.median(times)
        print(f"{key[0]:>6s} {key[1]:>7s}: {med:7.3f} ms   windows={[f'{t:.2f}' for t in times]}")

    if args.sampler:
        # head sampler fwd+bwd at the headline shape, to bound the
        # non-encoder remainder of the step (ELBO + optimizer + EMA)
        from viforsdes_tpu.config import HeadConfig
        from viforsdes_tpu.models.head import DiffusionTransitionHead

        head = DiffusionTransitionHead(
            state_dim=1, context_dim=256, sde_param_dim=3,
            config=HeadConfig(hidden_dim=64, num_layers=2),
        )
        hp = head.init(jax.random.key(2))
        ctx = jax.random.normal(jax.random.key(3), (B, 100, 256))
        th = jax.random.normal(jax.random.key(4), (B, 3))
        eps = jax.random.normal(jax.random.key(5), (100, B, 1))  # time-major
        x0 = jnp.zeros((B, 1))

        def head_loss(hp, ctx, th, eps):
            paths, means, chol = head.sample_diffusion_paths(hp, x0, ctx, th, eps, 0.05)
            return paths.sum() + means.sum() + chol.sum()

        sfns = {
            "fwd": jax.jit(head_loss),
            "fwdbwd": jax.jit(jax.grad(head_loss, argnums=(0, 1))),
        }
        for kind, fn in sfns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(hp, ctx, th, eps))
            print(f"compile sampler/{kind}: {time.perf_counter() - t0:.1f}s", flush=True)
        res = {k: [] for k in sfns}
        for w in range(args.windows):
            for kind, fn in sfns.items():
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = fn(hp, ctx, th, eps)
                jax.block_until_ready(out)
                res[kind].append((time.perf_counter() - t0) / args.iters * 1000)
        print("\n== head sampler timings (ms, median) ==")
        for kind, ts in res.items():
            print(f"sampler {kind:>7s}: {statistics.median(ts):7.3f} ms")

    if args.full_step:
        from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
        import viforsdes_tpu as vt

        class OU:
            state_dim = 1
            sde_param_dim = 3

            def drift(self, x, p):
                return p[..., 0:1] * (p[..., 1:2] - x)

            def diffusion(self, x, p):
                return p[..., 2:3][..., None]

        step_fns = {}
        states = {}
        for m in modes:
            tr = VariationalInferenceTrainer(
                sde=OU(),
                observations=vt.Observations(
                    times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
                    values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
                ),
                observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
                prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
                time_horizon=5.0,
                config=vt.TrainingConfig(time_step=0.05, batch_size=B, n_iterations=1),
                encoder_config=vt.EncoderConfig(
                    hidden_dim=256, cond_dim=256, num_heads=4, depth=8, fused_blocks=m
                ),
                head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
                state_positive_dims=[],
                sde_param_positive_dims=[0, 2],
                console=vt.Console(enabled=False),
            )
            step_fns[m] = tr._train_step
            states[m] = [tr.params, tr.opt_state, tr.ema_params, tr._train_key]

        step_results: dict[str, list] = {m: [] for m in modes}
        for m in modes:  # compile
            p, o, e, k = states[m]
            t0 = time.perf_counter()
            p, o, e, mx = step_fns[m](p, o, e, k)
            jax.block_until_ready(mx)
            states[m] = [p, o, e, k]
            print(f"compile step/{m}: {time.perf_counter() - t0:.1f}s", flush=True)
        for w in range(args.windows):
            for m in modes:
                p, o, e, k = states[m]
                mx = None
                t0 = time.perf_counter()
                for i in range(args.iters):
                    p, o, e, mx = step_fns[m](p, o, e, jax.random.fold_in(k, w * args.iters + i))
                jax.block_until_ready(mx)
                step_results[m].append((time.perf_counter() - t0) / args.iters * 1000)
                states[m] = [p, o, e, k]

        print("\n== full train step (ms, median) ==")
        for m, times in step_results.items():
            med = statistics.median(times)
            print(f"{m:>6s}: {med:7.3f} ms = {1000/med:6.1f} steps/s   windows={[f'{t:.2f}' for t in times]}")


if __name__ == "__main__":
    main()
