"""Normalization layers, always computed in fp32 (ref ``primitives/norm.py``).

``rms_norm`` matches reference ``RMS`` (``norm.py:10-21``): fp32 compute,
optional weight (the QK-norm use sites freeze the weight at 1, so the weight
argument is optional here). ``layer_norm`` matches the non-affine
``nn.LayerNorm(eps=1e-5, elementwise_affine=False)`` used by SiT blocks
(``sit.py:30-31``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rms_norm(x: Array, weight: Array | None = None, *, eps: float = 1e-6) -> Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = xf * rms
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(
    x: Array,
    weight: Array | None = None,
    bias: Array | None = None,
    *,
    eps: float = 1e-5,
) -> Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
