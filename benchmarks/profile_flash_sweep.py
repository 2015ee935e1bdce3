"""Attention kernel shoot-out at the Lorenz shape: dense XLA vs Mosaic flash
(block-size sweep) vs splash attention.

B=32, H=4, S=2048, D=64, non-causal, bf16, with the last 47 positions masked
(the real grid is 2001). Each timing cycles THREE distinct inputs per
iteration so backend memoization cannot fake a result, and every variant is a
fresh closure (the jit trace cache is keyed on the function object).

Usage: python benchmarks/profile_flash_sweep.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax.experimental.pallas.ops.tpu import flash_attention as fa

B, H, S, D = 32, 4, 2048, 64
REAL_S = 2001


def bench(fn, args_list, iters=10, windows=3):
    out = jax.block_until_ready(fn(*args_list[0]))  # compile
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*args_list[i % len(args_list)])
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times)


def make_inputs(seed):
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(kq, (B, H, S, D), dtype=jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), dtype=jnp.bfloat16)
    return q, k, v


def main() -> None:
    inputs = [make_inputs(s) for s in range(3)]
    seg = jnp.zeros((B, S), dtype=jnp.int32).at[:, REAL_S:].set(1)
    sm_scale = 1.0 / D**0.5

    variants = {}

    def dense(q, k, v):
        return jax.nn.dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        )

    variants["dense"] = dense

    def bs_all(blk, **over):
        kw = dict(block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                  block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
                  block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
                  block_q_dq=blk)
        kw.update(over)
        return fa.BlockSizes(**kw)

    flash_cfgs = {
        "flash_b1024": bs_all(1024),
        "flash_b512": bs_all(512),
        "flash_b1024_dq2048": bs_all(1024, block_q_dq=2048, block_k_major_dq=1024),
        "flash_b1024_dkv_q512": bs_all(1024, block_q_dkv=512),
        "flash_b1024_dkv_k512": bs_all(1024, block_k_dkv=512, block_k_major_dkv=1024),
    }
    for name, bs in flash_cfgs.items():
        def f(q, k, v, bs=bs):
            return fa.flash_attention(
                q, k, v, segment_ids=fa.SegmentIds(q=seg, kv=seg),
                sm_scale=sm_scale, block_sizes=bs,
            )
        variants[name] = f

    # splash attention (newer Mosaic kernel family)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask([sm.FullMask((S, S)) for _ in range(H)])
        sseg = sk.SegmentIds(q=seg[0], kv=seg[0])  # per-example ids (shared)

        def make_splash(block_sizes=None, name="splash_default"):
            kernel = sk.make_splash_mha(
                mask, head_shards=1, q_seq_shards=1, block_sizes=block_sizes
            )

            def f(q, k, v):
                # splash pre-scales nothing: fold sm_scale into q
                qs = (q * sm_scale).astype(q.dtype)
                return jax.vmap(lambda qq, kk, vv: kernel(qq, kk, vv, segment_ids=sseg))(
                    qs, k, v
                )

            variants[name] = f

        make_splash(None, "splash_default")
        try:
            make_splash(
                sk.BlockSizes(
                    block_q=1024, block_kv=1024, block_kv_compute=1024,
                    block_q_dkv=1024, block_kv_dkv=1024, block_kv_dkv_compute=1024,
                    block_q_dq=1024, block_kv_dq=1024,
                ),
                "splash_b1024",
            )
        except Exception as e:
            print("splash_b1024 setup failed:", str(e)[:120])
    except Exception as e:
        print("splash unavailable:", str(e)[:200])

    for name, f in variants.items():
        fwd = jax.jit(f)

        def loss(q, k, v, f=f):
            return f(q, k, v).astype(jnp.float32).sum()

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            t_f = bench(fwd, inputs)
            t_b = bench(bwd, inputs)
            print(f"{name:>24s}: fwd {t_f:8.2f} ms   fwd+bwd {t_b:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:>24s}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
