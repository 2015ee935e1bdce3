"""Split fused SiT-block kernels: attention half + MLP half as SEPARATE
Pallas kernels (the round-2 encoder perf design).

Why split (vs the whole-block kernel in ``sit_block.py``):
- **Halved backward recompute**: each half's backward recomputes only its own
  forward. The attention backward no longer re-runs the SwiGLU, and the MLP
  backward no longer re-runs QKV/SDPA — the MLP half's input ``x2`` is the
  attention half's output, materialized in HBM between the two kernels (the
  XLA path pays this stream anyway).
- **Smaller VMEM residency -> bigger batch tiles**: the whole-block kernel was
  VMEM-bound at batch-tile 2 (16 MB must hold BOTH halves' intermediates);
  each half alone fits batch tiles of 4-16, amortizing stream DMA and filling
  the MXU with taller matmuls.
- **Independent fwd/bwd tiling**: forward and backward are separate
  ``pallas_call``s, so the backward (which holds ~2x the live values) can run
  a smaller batch tile than the forward.

Math is IDENTICAL to the whole-block kernel — both share the half cores and
half backwards in ``sit_block.py`` (``_attn_half_core`` / ``_mlp_half_core`` /
``_attn_half_bwd`` / ``_mlp_half_bwd``), which are tested against the XLA
path (``tests/test_pallas_sit_block.py``). Parity target for the fused ops:
reference ``primitives/attn.py:106`` + ``primitives/sit.py:162-186``.

Layouts match ``sit_block.py``: token streams flattened ``[B*S_pad, E]``,
adaLN branch vectors as rows ``[B, 3, E]`` (attn: s1|b1|g1; mlp: s2|b2|g2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viforsdes_tpu.ops.pallas.sit_block import (
    _attn_half_bwd,
    _attn_half_core,
    _mlp_half_bwd,
    _mlp_half_core,
    _set_mxu_dtype,
)

Array = jax.Array


class SplitBlockSpec(NamedTuple):
    """Static config of one split-kernel SiT block instantiation."""

    seq_len: int
    embed_dim: int
    num_heads: int
    mlp_hidden: int
    ln_eps: float = 1e-5
    qk_eps: float = 1e-6
    residual_v: bool = False
    # batch tiles per call; backward holds ~2x the live values, so smaller
    bt_attn_fwd: int = 8
    bt_attn_bwd: int = 4
    bt_mlp_fwd: int = 8
    bt_mlp_bwd: int = 4
    mxu_dtype: str = "bf16"
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def s_pad(self) -> int:
        return ((self.seq_len + 7) // 8) * 8

    @property
    def block_bt(self) -> int:  # sit_block half-cores read spec.block_bt never
        raise AttributeError("split spec has per-call tiles")


_ATTN_WEIGHTS = ["w_qkv", "b_qkv", "w_o", "b_o", "w_g", "b_g", "lam"]
_MLP_WEIGHTS = ["w_m1", "b_m1", "w_m2", "b_m2"]


def _attn_weight_shapes(spec):
    e, dh = spec.embed_dim, spec.head_dim
    return [(e, 3 * e), (1, 3 * e), (e, e), (1, e), (e, dh), (1, dh), (1, 1)]


def _mlp_weight_shapes(spec):
    e, m = spec.embed_dim, spec.mlp_hidden
    return [(e, 2 * m), (1, 2 * m), (m, e), (1, e)]


def _weights_from_refs(spec, names, refs):
    w = {}
    for name, ref in zip(names, refs):
        if name == "lam":
            w[name] = ref[0, 0] if spec.residual_v else None
        elif name.startswith("b_"):
            w[name] = ref[0, :]
        else:
            w[name] = ref[:]
    return w


# ================================================================= kernels ==


def _attn_fwd_kernel(spec, bt, x_ref, cond_ref, v0_ref, cos_ref, sin_ref, *refs):
    weight_refs = refs[: len(_ATTN_WEIGHTS)]
    x2_ref, v_out_ref = refs[len(_ATTN_WEIGHTS) :]

    _set_mxu_dtype(spec)
    w = _weights_from_refs(spec, _ATTN_WEIGHTS, weight_refs)
    x = x_ref[:].astype(jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)  # [bt, 3, E]
    v0 = v0_ref[:].astype(jnp.float32) if spec.residual_v else None

    f = _attn_half_core(spec, bt, x, cond, v0, cos_ref[:], sin_ref[:], w)
    x2_ref[:] = f["x2"].astype(x2_ref.dtype)
    v_out_ref[:] = f["v_mixed"].astype(v_out_ref.dtype)


def _attn_bwd_kernel(spec, bt, x_ref, cond_ref, v0_ref, cos_ref, sin_ref, *refs):
    n_w = len(_ATTN_WEIGHTS)
    weight_refs = refs[:n_w]
    d_x2_ref, d_vout_ref = refs[n_w : n_w + 2]
    d_x_ref, d_cond_ref, d_v0_ref, *d_w_refs = refs[n_w + 2 :]

    _set_mxu_dtype(spec)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in d_w_refs:
            r[:] = jnp.zeros_like(r)

    w = _weights_from_refs(spec, _ATTN_WEIGHTS, weight_refs)
    x = x_ref[:].astype(jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)
    v0 = v0_ref[:].astype(jnp.float32) if spec.residual_v else None
    cos_t, sin_t = cos_ref[:], sin_ref[:]

    f = _attn_half_core(spec, bt, x, cond, v0, cos_t, sin_t, w)
    d_x2 = d_x2_ref[:].astype(jnp.float32)
    d_vout = d_vout_ref[:].astype(jnp.float32)

    d_x, (d_s1, d_b1, d_g1), d_v0, d_w = _attn_half_bwd(
        spec, bt, f, cond, x, v0, d_x2, d_vout, w, cos_t, sin_t
    )

    d_x_ref[:] = d_x.astype(d_x_ref.dtype)
    for b in range(bt):
        d_cond_ref[b] = jnp.concatenate([d_s1[b], d_b1[b], d_g1[b]], axis=0).astype(
            d_cond_ref.dtype
        )
    d_v0_ref[:] = d_v0.astype(d_v0_ref.dtype)
    for r, name in zip(d_w_refs, _ATTN_WEIGHTS):
        r[:] += d_w[name]


def _mlp_fwd_kernel(spec, bt, x2_ref, cond_ref, *refs):
    weight_refs = refs[: len(_MLP_WEIGHTS)]
    (x_out_ref,) = refs[len(_MLP_WEIGHTS) :]

    _set_mxu_dtype(spec)
    w = _weights_from_refs(spec, _MLP_WEIGHTS, weight_refs)
    x2 = x2_ref[:].astype(jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)  # [bt, 3, E]

    f = _mlp_half_core(spec, bt, x2, cond, w, part0=0)
    x_out_ref[:] = f["x_out"].astype(x_out_ref.dtype)


def _mlp_bwd_kernel(spec, bt, x2_ref, cond_ref, *refs):
    n_w = len(_MLP_WEIGHTS)
    weight_refs = refs[:n_w]
    d_xout_ref = refs[n_w]
    d_x2_ref, d_cond_ref, *d_w_refs = refs[n_w + 1 :]

    _set_mxu_dtype(spec)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in d_w_refs:
            r[:] = jnp.zeros_like(r)

    w = _weights_from_refs(spec, _MLP_WEIGHTS, weight_refs)
    x2 = x2_ref[:].astype(jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)

    f = _mlp_half_core(spec, bt, x2, cond, w, part0=0)
    d_xout = d_xout_ref[:].astype(jnp.float32)

    d_x2, (d_s2, d_b2, d_g2), d_w = _mlp_half_bwd(
        spec, bt, f, cond, d_xout, w, part0=0
    )

    d_x2_ref[:] = d_x2.astype(d_x2_ref.dtype)
    for b in range(bt):
        d_cond_ref[b] = jnp.concatenate([d_s2[b], d_b2[b], d_g2[b]], axis=0).astype(
            d_cond_ref.dtype
        )
    for r, name in zip(d_w_refs, _MLP_WEIGHTS):
        r[:] += d_w[name]


# ====================================================== pallas_call setup ==


def _const(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


def _tok_tile(bt, sp, e):
    return pl.BlockSpec((bt * sp, e), lambda b: (b, 0), memory_space=pltpu.VMEM)


def _cond_tile(bt, e):
    return pl.BlockSpec((bt, 3, e), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _pad_flatten(spec, arrs, batch, bt):
    """[B, S, E] -> padded flat [pad_b*S_pad, E]; [B, 3E] -> [pad_b, 3, E]."""
    pad_b = -(-batch // bt) * bt
    row_pad = spec.s_pad - spec.seq_len
    out = []
    for a in arrs:
        if a.ndim == 3:
            a = (
                jnp.pad(a, ((0, pad_b - batch), (0, row_pad), (0, 0)))
                if (pad_b != batch or row_pad)
                else a
            )
            out.append(a.reshape(pad_b * spec.s_pad, a.shape[2]))
        else:
            if pad_b != batch:
                a = jnp.pad(a, ((0, pad_b - batch), (0, 0)))
            out.append(a.reshape(pad_b, 3, a.shape[1] // 3))
    return out, pad_b


class _RopeTables:
    """Per-bt tiled rope tables, built lazily with numpy (no tracer capture)."""

    def __init__(self, spec, rope_cos, rope_sin):
        pad = spec.s_pad - spec.seq_len
        self._cos = np.pad(np.asarray(rope_cos, dtype=np.float32), ((0, pad), (0, 0)))
        self._sin = np.pad(np.asarray(rope_sin, dtype=np.float32), ((0, pad), (0, 0)))
        self._tiled: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def get(self, bt):
        if bt not in self._tiled:
            self._tiled[bt] = (np.tile(self._cos, (bt, 1)), np.tile(self._sin, (bt, 1)))
        return self._tiled[bt]


class FusedAttnHalf:
    """custom_vjp attention half: ``(weights, x [B,S,E], cond [B,3E], v0) ->
    (x2 [B,S,E], v_state [B,S,E])``."""

    def __init__(self, spec: SplitBlockSpec, rope_cos: Array, rope_sin: Array) -> None:
        self.spec = spec
        self._rope = _RopeTables(spec, rope_cos, rope_sin)

        @jax.custom_vjp
        def call(kw, x, cond, v0):
            return self._forward(kw, x, cond, v0)

        def call_fwd(kw, x, cond, v0):
            return self._forward(kw, x, cond, v0), (kw, x, cond, v0)

        def call_bwd(res, cots):
            return self._backward(res, cots)

        call.defvjp(call_fwd, call_bwd)
        self._call = call

    def __call__(self, kw, x, cond, v0):
        return self._call(kw, x, cond, v0)

    def _forward(self, kw, x, cond, v0):
        spec = self.spec
        bt = spec.bt_attn_fwd
        batch, s, e = x.shape
        (xf, condf, v0f), pad_b = _pad_flatten(spec, [x, cond, v0], batch, bt)
        sp = spec.s_pad
        cos, sin = self._rope.get(bt)
        kernel = functools.partial(_attn_fwd_kernel, spec, bt)
        x2, v_out = pl.pallas_call(
            kernel,
            grid=(pad_b // bt,),
            in_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                _tok_tile(bt, sp, e),
                _const((bt * sp, spec.head_dim // 2)),
                _const((bt * sp, spec.head_dim // 2)),
                *[_const(sh) for sh in _attn_weight_shapes(spec)],
            ],
            out_specs=[_tok_tile(bt, sp, e), _tok_tile(bt, sp, e)],
            out_shape=[
                jax.ShapeDtypeStruct((pad_b * sp, e), x.dtype),
                jax.ShapeDtypeStruct((pad_b * sp, e), x.dtype),
            ],
            interpret=spec.interpret,
        )(xf, condf, v0f, cos, sin, *kw)
        return (
            x2.reshape(pad_b, sp, e)[:batch, :s],
            v_out.reshape(pad_b, sp, e)[:batch, :s],
        )

    def _backward(self, res, cots):
        spec = self.spec
        bt = spec.bt_attn_bwd
        kw, x, cond, v0 = res
        d_x2, d_vout = cots
        batch, s, e = x.shape
        (xf, condf, v0f, d_x2f, d_voutf), pad_b = _pad_flatten(
            spec, [x, cond, v0, d_x2, d_vout], batch, bt
        )
        sp = spec.s_pad
        cos, sin = self._rope.get(bt)
        w_shapes = _attn_weight_shapes(spec)
        kernel = functools.partial(_attn_bwd_kernel, spec, bt)
        results = pl.pallas_call(
            kernel,
            grid=(pad_b // bt,),
            in_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                _tok_tile(bt, sp, e),
                _const((bt * sp, spec.head_dim // 2)),
                _const((bt * sp, spec.head_dim // 2)),
                *[_const(sh) for sh in w_shapes],
                _tok_tile(bt, sp, e),
                _tok_tile(bt, sp, e),
            ],
            out_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                _tok_tile(bt, sp, e),
                *[_const(sh) for sh in w_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pad_b * sp, e), jnp.float32),
                jax.ShapeDtypeStruct((pad_b, 3, e), jnp.float32),
                jax.ShapeDtypeStruct((pad_b * sp, e), jnp.float32),
                *[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes],
            ],
            interpret=spec.interpret,
        )(xf, condf, v0f, cos, sin, *kw, d_x2f, d_voutf)

        d_x = results[0].reshape(pad_b, sp, e)[:batch, :s]
        d_cond = results[1][:batch].reshape(batch, 3 * e)
        d_v0 = results[2].reshape(pad_b, sp, e)[:batch, :s]
        d_kw = tuple(results[3:])
        if not spec.residual_v:
            d_v0 = jnp.zeros_like(d_v0)
        return (d_kw, d_x, d_cond, d_v0)


class FusedMlpHalf:
    """custom_vjp MLP half: ``(weights, x2 [B,S,E], cond [B,3E]) -> x_out``."""

    def __init__(self, spec: SplitBlockSpec) -> None:
        self.spec = spec

        @jax.custom_vjp
        def call(kw, x2, cond):
            return self._forward(kw, x2, cond)

        def call_fwd(kw, x2, cond):
            return self._forward(kw, x2, cond), (kw, x2, cond)

        def call_bwd(res, cots):
            return self._backward(res, cots)

        call.defvjp(call_fwd, call_bwd)
        self._call = call

    def __call__(self, kw, x2, cond):
        return self._call(kw, x2, cond)

    def _forward(self, kw, x2, cond):
        spec = self.spec
        bt = spec.bt_mlp_fwd
        batch, s, e = x2.shape
        (x2f, condf), pad_b = _pad_flatten(spec, [x2, cond], batch, bt)
        sp = spec.s_pad
        kernel = functools.partial(_mlp_fwd_kernel, spec, bt)
        x_out = pl.pallas_call(
            kernel,
            grid=(pad_b // bt,),
            in_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                *[_const(sh) for sh in _mlp_weight_shapes(spec)],
            ],
            out_specs=_tok_tile(bt, sp, e),
            out_shape=jax.ShapeDtypeStruct((pad_b * sp, e), x2.dtype),
            interpret=spec.interpret,
        )(x2f, condf, *kw)
        return x_out.reshape(pad_b, sp, e)[:batch, :s]

    def _backward(self, res, cots):
        spec = self.spec
        bt = spec.bt_mlp_bwd
        kw, x2, cond = res
        d_xout = cots
        batch, s, e = x2.shape
        (x2f, condf, d_xoutf), pad_b = _pad_flatten(
            spec, [x2, cond, d_xout], batch, bt
        )
        sp = spec.s_pad
        w_shapes = _mlp_weight_shapes(spec)
        kernel = functools.partial(_mlp_bwd_kernel, spec, bt)
        results = pl.pallas_call(
            kernel,
            grid=(pad_b // bt,),
            in_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                *[_const(sh) for sh in w_shapes],
                _tok_tile(bt, sp, e),
            ],
            out_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, e),
                *[_const(sh) for sh in w_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pad_b * sp, e), jnp.float32),
                jax.ShapeDtypeStruct((pad_b, 3, e), jnp.float32),
                *[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes],
            ],
            interpret=spec.interpret,
        )(x2f, condf, *kw, d_xoutf)

        d_x2 = results[0].reshape(pad_b, sp, e)[:batch, :s]
        d_cond = results[1][:batch].reshape(batch, 3 * e)
        d_kw = tuple(results[2:])
        return (d_kw, d_x2, d_cond)


class FusedSplitSiTBlock:
    """One SiT block as two chained fused kernels.

    Call: ``(params_block, x [B,S,E], cond [B,6E], v0) -> (x_out, v_state)``
    with cond the concatenated adaLN branch vectors (s1|b1|g1|s2|b2|g2), the
    same contract as ``sit_block.FusedSiTBlock``.
    """

    def __init__(self, spec: SplitBlockSpec, rope_cos: Array, rope_sin: Array) -> None:
        self.spec = spec
        self.attn = FusedAttnHalf(spec, rope_cos, rope_sin)
        self.mlp = FusedMlpHalf(spec)

    def __call__(self, kernel_weights: tuple, x: Array, cond: Array, v0: Array):
        e = self.spec.embed_dim
        kw_attn = kernel_weights[: len(_ATTN_WEIGHTS)]
        kw_mlp = kernel_weights[len(_ATTN_WEIGHTS) :]
        cond_attn, cond_mlp = cond[:, : 3 * e], cond[:, 3 * e :]
        x2, v_state = self.attn(kw_attn, x, cond_attn, v0)
        x_out = self.mlp(kw_mlp, x2, cond_mlp)
        return x_out, v_state


def pack_split_weights(spec: SplitBlockSpec, params: dict) -> tuple:
    """Pack an ops.sit block param dict into (attn..., mlp...) operands."""
    attn = params["attn"]
    mlp = params["mlp"]
    lam = attn.get("v_residual_lambda")
    lam_arr = (
        jnp.asarray(lam, jnp.float32).reshape(1, 1)
        if lam is not None
        else jnp.zeros((1, 1), jnp.float32)
    )
    f32 = lambda a: a.astype(jnp.float32)
    return (
        f32(attn["qkv_proj"]["w"]),
        f32(attn["qkv_proj"]["b"]).reshape(1, -1),
        f32(attn["out_proj"]["w"]),
        f32(attn["out_proj"]["b"]).reshape(1, -1),
        f32(attn["gate_proj"]["w"]),
        f32(attn["gate_proj"]["b"]).reshape(1, -1),
        lam_arr,
        f32(mlp["input_proj"]["w"]),
        f32(mlp["input_proj"]["b"]).reshape(1, -1),
        f32(mlp["output_proj"]["w"]),
        f32(mlp["output_proj"]["b"]).reshape(1, -1),
    )
