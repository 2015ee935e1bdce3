"""Diagnose Mosaic flash-attention bwd cost at the Lorenz shape.

Sweeps block sizes / segment-id use for fwd and fwd+bwd at
B=32, H=4, S=2048, D=64, against the dense XLA SDPA. Each variant is traced
via a fresh closure (avoids the jit trace cache returning a stale variant).

Usage: python benchmarks/profile_flash_sweep.py
"""

from __future__ import annotations

import functools
import statistics
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax.experimental.pallas.ops.tpu import flash_attention as fa

B, H, S, D = 32, 4, 2048, 64


def bench(fn, args, iters=20, windows=3):
    out = jax.block_until_ready(fn(*args))  # compile
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times)


def main() -> None:
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, H, S, D), dtype=jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), dtype=jnp.bfloat16)
    seg = jnp.zeros((B, S), dtype=jnp.int32).at[:, 2001:].set(1)
    sm = 1.0 / D**0.5

    def dense(q, k, v):
        return jax.nn.dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        )

    variants = {"dense": (dense, False)}

    def make_flash(block_sizes, use_seg):
        def f(q, k, v):
            return fa.flash_attention(
                q, k, v,
                segment_ids=fa.SegmentIds(q=seg, kv=seg) if use_seg else None,
                sm_scale=sm, block_sizes=block_sizes,
            )
        return f

    bs_cfgs = {
        "default": None,
        "bq512_bk512": fa.BlockSizes(
            block_q=512, block_k_major=512, block_k=512, block_b=1,
            block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512,
            block_q_dkv=512, block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
        ),
        "bq1024_bk1024": fa.BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=1024, block_k_major_dkv=1024, block_k_dkv=1024,
            block_q_dkv=1024, block_k_major_dq=1024, block_k_dq=1024, block_q_dq=1024,
        ),
        "bq2048_bk2048": fa.BlockSizes(
            block_q=2048, block_k_major=2048, block_k=2048, block_b=1,
            block_q_major_dkv=2048, block_k_major_dkv=2048, block_k_dkv=2048,
            block_q_dkv=2048, block_k_major_dq=2048, block_k_dq=2048, block_q_dq=2048,
        ),
        "bq1024_bk512_dkv256": fa.BlockSizes(
            block_q=1024, block_k_major=512, block_k=512, block_b=1,
            block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=256,
            block_q_dkv=256, block_k_major_dq=512, block_k_dq=512, block_q_dq=1024,
        ),
    }
    for name, bs in bs_cfgs.items():
        variants[f"flash_{name}_seg"] = (make_flash(bs, True), True)
    variants["flash_default_noseg"] = (make_flash(None, False), True)

    for name, (f, _) in variants.items():
        fwd = jax.jit(f)

        def loss(q, k, v, f=f):
            return f(q, k, v).astype(jnp.float32).sum()

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            t_f = bench(fwd, (q, k, v))
            t_b = bench(bwd, (q, k, v))
            print(f"{name:>28s}: fwd {t_f:8.2f} ms   fwd+bwd {t_b:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:>28s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
