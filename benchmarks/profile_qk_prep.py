"""End-to-end A/B of the fused QK-prep kernel on the FULL Lorenz step.

Round-3 trace finding (BASELINE.md): with flash active, XLA compiles
RMS-norm -> RoPE into add_convert loop fusions streaming fp32 intermediates
(~18 ms/step at the Lorenz shape). ops/pallas/qk_prep.py does the whole
preparation in one VMEM pass per tensor.

Also checks on-chip numerics first: fused vs unfused composition on real
Mosaic, forward + gradient, at the exact [B, H, S, D] shape the step uses.

Interleaved same-process windows (VIFORSDES_QK_PREP read at trace time).

Usage: python benchmarks/profile_qk_prep.py [--iters 20] [--windows 3]
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


def parity_check():
    import jax
    import jax.numpy as jnp

    from viforsdes_tpu.ops.embeddings import apply_rope_1d, precompute_rope
    from viforsdes_tpu.ops.norms import rms_norm
    from viforsdes_tpu.ops.pallas.qk_prep import qk_prep

    b, h, s, d = 32, 4, 2001, 64
    tables = precompute_rope(d, end=s)
    x = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    ct = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)

    def comp(x):
        return apply_rope_1d(rms_norm(x, eps=1e-6), tables.slice_to(s))

    def fused(x):
        return qk_prep(x, tables.cos[:s], tables.sin[:s], 1e-6)

    got = jax.jit(fused)(x)
    want = jax.jit(comp)(x)
    # bf16 in/out: compare against each tensor's own scale (one bf16 ulp at
    # magnitude m is m/128; max-abs comparisons at O(4) values sit at ~0.03)
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-6
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))) / scale
    g_f = jax.jit(jax.grad(lambda x: (fused(x).astype(jnp.float32) * ct.astype(jnp.float32)).sum()))(x)
    g_c = jax.jit(jax.grad(lambda x: (comp(x).astype(jnp.float32) * ct.astype(jnp.float32)).sum()))(x)
    gscale = float(jnp.max(jnp.abs(g_c.astype(jnp.float32)))) + 1e-6
    gerr = float(jnp.max(jnp.abs(g_f.astype(jnp.float32) - g_c.astype(jnp.float32)))) / gscale
    print(f"on-chip parity: fwd maxrel {err:.5f}, grad maxrel {gerr:.5f}", flush=True)
    assert err < 2e-2 and gerr < 2e-2, "qk_prep parity FAILED on chip"


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
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.skip_parity:
        parity_check()

    variants = {}
    for tag, env in [
        ("unfused", {"VIFORSDES_QK_PREP": "0"}),
        ("qk_prep", {"VIFORSDES_QK_PREP": "1"}),
    ]:
        variants[tag] = build(tag, env)

    results = {t: [] for t in variants}
    for w in range(args.windows):
        for tag, (tr, state) in variants.items():
            p, o, e, k = state
            mx = None
            t0 = time.perf_counter()
            for i in range(args.iters):
                key = jax.random.fold_in(k, w * args.iters + i)
                p, o, e, mx = tr._train_step(p, o, e, key)
            jax.block_until_ready(mx)
            ms = (time.perf_counter() - t0) / args.iters * 1000
            state[0], state[1], state[2] = p, o, e
            results[tag].append(ms)
            print(f"window {w} {tag}: {ms:.1f} ms/step", flush=True)

    for tag, xs in results.items():
        med = statistics.median(xs)
        print(
            f"{tag}: median {med:.1f} ms/step ({1000/med:.2f} steps/s) "
            f"windows={[f'{x:.1f}' for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
