"""Normalization layers (ref ``primitives/norm.py``).

``rms_norm`` matches reference ``RMS`` (``norm.py:10-21``); ``layer_norm``
matches the non-affine ``nn.LayerNorm(eps=1e-5)`` used by SiT blocks
(``sit.py:30-31``).

TPU note: statistics (mean/var/rms) are accumulated in fp32, but the data
tensor itself stays in its input dtype — casting the whole activation to fp32
(what a literal port of the reference's ``x.float()`` does) doubles the bytes
moved through HBM and measured ~2x slower backward on v5e. For bf16 inputs
the normalized output differs from the fp32-materialized version only by
bf16 rounding of the inputs, which the subsequent matmul applies anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rms_norm(x: Array, weight: Array | None = None, *, eps: float = 1e-6) -> Array:
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
    )
    scale = jax.lax.rsqrt(mean_sq + eps).astype(x.dtype)
    out = x * scale
    if weight is not None:
        out = out * weight.astype(x.dtype)
    return out


def layer_norm(
    x: Array,
    weight: Array | None = None,
    bias: Array | None = None,
    *,
    eps: float = 1e-5,
) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    out = ((x - mean.astype(x.dtype)) * scale.astype(x.dtype))
    if weight is not None:
        out = out * weight.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
