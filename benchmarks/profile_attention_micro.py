"""Micro-benchmark: where do the encoder's milliseconds go at the headline
shape? Times SDPA variants and the other block sub-ops (LN+adaLN, SwiGLU,
QKV/out projections) fwd and fwd+bwd, interleaved.

Headline shape: B=128, S=101, H=4, Dh=64 (E=256), bf16 activations.
Analytic SDPA flops are ~2.7 GFLOP fwd — if the measured grad takes
milliseconds, XLA's lowering (not the arithmetic) is the problem.

Usage: python benchmarks/profile_attention_micro.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, S, H, Dh = 128, 101, 4, 64
E = H * Dh


def bench(fn, args_list, iters=30, windows=5):
    out = jax.block_until_ready(fn(*args_list[0]))
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*args_list[i % len(args_list)])
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    return statistics.median(times)


def main() -> None:
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    mk = lambda k, shape: jax.random.normal(k, shape, dtype=jnp.bfloat16)
    inputs = [
        (mk(ks[0], (B, S, H, Dh)), mk(ks[1], (B, S, H, Dh)), mk(ks[2], (B, S, H, Dh)))
    ]
    x = mk(ks[3], (B, S, E))
    w_qkv = mk(ks[4], (E, 3 * E))
    w_m1 = mk(ks[5], (E, 2 * 683))
    w_m2 = mk(ks[6], (683, E))

    variants = {}

    def dpa(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    variants["sdpa_library"] = (dpa, inputs)

    def manual(q, k, v):
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / Dh**0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    variants["sdpa_manual_einsum"] = (manual, inputs)

    pad = 128 - S
    def manual_padded(q, k, v):
        qp, kp, vp = (
            jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0))) for t in (q, k, v)
        )
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qp, kp, preferred_element_type=jnp.float32
        ) * (1.0 / Dh**0.5)
        mask = (jnp.arange(128) < S)[None, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, vp)[:, :S]

    variants["sdpa_manual_padded128"] = (manual_padded, inputs)

    def ln_mod(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(xf * xf, -1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return ((1.3 * y + 0.1).astype(x.dtype), )

    variants["layernorm_mod"] = (lambda x: ln_mod(x)[0], [(x,)])

    def qkv_proj(x):
        return jnp.dot(x, w_qkv, preferred_element_type=jnp.float32).astype(x.dtype)

    variants["qkv_projection"] = (qkv_proj, [(x,)])

    def mlp(x):
        m = jnp.dot(x, w_m1, preferred_element_type=jnp.float32)
        left, right = m[..., :683], m[..., 683:]
        h = (jax.nn.silu(left) * right).astype(x.dtype)
        return jnp.dot(h, w_m2, preferred_element_type=jnp.float32).astype(x.dtype)

    variants["swiglu_mlp"] = (mlp, [(x,)])

    for name, (f, args_list) in variants.items():
        fwd = jax.jit(f)

        def loss(*a, f=f):
            return f(*a).astype(jnp.float32).sum()

        bwd = jax.jit(jax.grad(loss, argnums=tuple(range(len(args_list[0])))))
        t_f = bench(fwd, args_list)
        t_b = bench(bwd, args_list)
        print(f"{name:>24s}: fwd {t_f:7.3f} ms   fwd+bwd {t_b:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
