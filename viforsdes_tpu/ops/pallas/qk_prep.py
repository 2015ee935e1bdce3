"""Fused QK-RMS-norm + RoPE Pallas kernel for the flash attention path.

Motivation (round-3 Lorenz trace, BASELINE.md / trace_lorenz_ropehalves.json):
with flash attention active, XLA compiles the q/k preparation (RMS-norm
-> RoPE) into ``add_convert`` loop fusions that stream ~183 MB/block where
the true traffic is 64 MB (read q,k once + write once): the fusion
boundaries materialize fp32 intermediates and the two F=32-wide RoPE half
streams occupy 25% of each (8,128) tile. Measured 1.16 ms/block forward and
~1.4 ms/block backward at [32, 4, 2001, 64] — ~18 ms of a 167 ms step.

This kernel does the whole preparation in VMEM: one bf16 read of the raw
q/k block, fp32 statistics and rotation in registers, one bf16 write. The
backward is a mirror kernel (inverse rotation + RMS-norm VJP) that re-reads
the raw input instead of saving normalized intermediates.

Semantics match the unfused composition exactly (``ops/norms.py::rms_norm``
then ``ops/embeddings.py::apply_rope_1d``), including the reference's
rounding points: the rsqrt scale is cast to the input dtype before the
multiply, and rotation is computed on fp32 upcasts of the normed halves
(parity-tested in ``tests/test_qk_prep.py``, interpret mode, values + grads).

Dispatch: ``ops/attention.py`` uses this on the TPU backend's flash path
(``VIFORSDES_QK_PREP=0`` reverts to the unfused composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_BLOCK_S = 512


def _fwd_kernel(x_ref, cos_ref, sin_ref, o_ref, *, eps: float):
    x = x_ref[...]  # [1, bs, D] input dtype
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(ms + eps).astype(x.dtype)
    xn = x * scale  # rounding point matches rms_norm (scale cast pre-multiply)
    f = cos_ref.shape[-1]
    real = xn[..., :f].astype(jnp.float32)
    imag = xn[..., f:].astype(jnp.float32)
    cos = cos_ref[...][None]  # [1, bs, F]
    sin = sin_ref[...][None]
    out = jnp.concatenate([real * cos - imag * sin, real * sin + imag * cos], axis=-1)
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, cos_ref, sin_ref, dy_ref, dx_ref, *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)  # [1, bs, D]
    dy = dy_ref[...].astype(jnp.float32)
    f = cos_ref.shape[-1]
    cos = cos_ref[...][None]
    sin = sin_ref[...][None]
    # RoPE^T: rotation by -theta
    dr, di = dy[..., :f], dy[..., f:]
    dn = jnp.concatenate([dr * cos + di * sin, -dr * sin + di * cos], axis=-1)
    # RMS-norm VJP (y = x * r, r = rsqrt(mean(x^2) + eps)):
    #   dx = r * dn - x * r^3 * sum(dn * x) / D
    d = x32.shape[-1]
    r = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    s = jnp.sum(dn * x32, axis=-1, keepdims=True)
    dx = r * dn - x32 * (r * r * r) * (s / d)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _call(kernel, outs_dtype, x, cos, sin, *extra, eps, interpret):
    b, h, s, d = x.shape
    xf = x.reshape(b * h, s, d)
    extra_f = [e.reshape(b * h, s, d) for e in extra]
    bs = min(_BLOCK_S, s)
    grid = (b * h, pl.cdiv(s, bs))
    row_spec = pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0))
    tab_spec = pl.BlockSpec((bs, cos.shape[-1]), lambda i, j: (j, 0))
    out = pl.pallas_call(
        functools.partial(kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, tab_spec, tab_spec] + [row_spec] * len(extra_f),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), outs_dtype),
        interpret=interpret,
    )(xf, cos, sin, *extra_f)
    return out.reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def qk_prep(x: Array, cos: Array, sin: Array, eps: float = 1e-6,
            interpret: bool = False) -> Array:
    """``rms_norm(x)`` + RoPE over ``x[B, H, S, D]`` in one fused pass.

    ``cos``/``sin`` are ``[S, D/2]`` fp32 tables (``precompute_rope`` sliced
    to the sequence). Gradients flow to ``x`` only (tables are constants).
    """
    return _call(_fwd_kernel, x.dtype, x, cos, sin, eps=eps, interpret=interpret)


def _qk_prep_fwd(x, cos, sin, eps, interpret):
    return qk_prep(x, cos, sin, eps, interpret), (x, cos, sin)


def _qk_prep_bwd(eps, interpret, res, dy):
    x, cos, sin = res
    dx = _call(_bwd_kernel, x.dtype, x, cos, sin, dy, eps=eps, interpret=interpret)
    return dx, jnp.zeros_like(cos), jnp.zeros_like(sin)


qk_prep.defvjp(_qk_prep_fwd, _qk_prep_bwd)
