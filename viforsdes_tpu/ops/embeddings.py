"""Time embeddings and rotary position embeddings (RoPE).

Parity target: reference ``primitives/embeddings.py``:
- ``sinusoidal_embedding`` = ``SinusoidalEmbedding`` (``:10-26``): sin||cos,
  max_period 1e4.
- RoPE uses the reference's [real || imag]-halves layout (``:55-74``): for a
  rotated width ``rot_dim = 2*n_freqs``, the first half of the rotated slice is
  the real part and the second half the imaginary part of a complex number
  multiplied by ``e^{i*pos*freq}``. Implemented in real arithmetic (cos/sin
  tables) — complex dtypes are poorly supported on TPU and the real form fuses
  into two fma's on the VPU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array


def sinusoidal_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """``[...] -> [..., dim]`` sinusoidal features (ref ``embeddings.py:19-26``)."""
    if dim % 2 != 0:
        raise ValueError("dim must be even")
    half_dim = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half_dim, dtype=jnp.float32)
        / half_dim
    ).astype(t.dtype)
    args = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


@dataclass(frozen=True)
class RotaryTables:
    """cos/sin tables, each ``[T, n_freqs]`` fp32 (carrier analogous to ref ``RotarySpec``)."""

    cos: Array
    sin: Array

    @property
    def length(self) -> int:
        return self.cos.shape[0]

    def slice_to(self, seq_len: int) -> "RotaryTables":
        return RotaryTables(cos=self.cos[:seq_len], sin=self.sin[:seq_len])


def precompute_rope(dim: int, end: int = 1000, theta: float = 10000.0) -> RotaryTables:
    """Angle tables matching ref ``precompute_freq_cis`` (``embeddings.py:29-52``)."""
    if dim % 2 != 0:
        raise ValueError("RoPE dimension must be even")
    idx = jnp.arange(0, dim, 2, dtype=jnp.float32)
    inv_freq = theta ** (-idx / dim)
    positions = jnp.arange(end, dtype=jnp.float32)
    angles = jnp.outer(positions, inv_freq)
    return RotaryTables(cos=jnp.cos(angles), sin=jnp.sin(angles))


def apply_rope_1d(x: Array, tables: RotaryTables) -> Array:
    """Rotate ``x[..., S, D]`` by position along axis -2 (ref ``embeddings.py:55-74``).

    Uses the reference's split-halves complex layout: ``rot = x[..., :2F]`` with
    real = ``rot[..., :F]``, imag = ``rot[..., F:]``; dims past ``2F`` pass through.

    Kept in the two-half-streams form deliberately: a "full-width" rewrite
    (``x*cos2 + swap_sign(x)*sin2`` on the 2F-wide tensor) aimed at the F=32
    tile-padding waste MEASURED WORSE on device — Lorenz loop-fusion bucket
    52.5 -> 73.1 ms/step (trace_lorenz_r3fix.json vs _ropehalves.json): the
    swapped full-width operand broke XLA's fusion of RoPE into the adjacent
    converts and doubled the streamed bytes. The halves form is what XLA
    fuses best here.
    """
    seq_len = x.shape[-2]
    if seq_len > tables.length:
        raise ValueError("requested sequence length exceeds precomputed frequencies")
    n_freqs = tables.cos.shape[-1]
    rot_dim = 2 * n_freqs
    rot, remainder = x[..., :rot_dim], x[..., rot_dim:]
    cos = tables.cos[:seq_len]
    sin = tables.sin[:seq_len]
    real = rot[..., :n_freqs].astype(jnp.float32)
    imag = rot[..., n_freqs:].astype(jnp.float32)
    out_real = real * cos - imag * sin
    out_imag = real * sin + imag * cos
    rotated = jnp.concatenate([out_real, out_imag], axis=-1).astype(x.dtype)
    if remainder.shape[-1] == 0:
        return rotated
    return jnp.concatenate([rotated, remainder], axis=-1)
