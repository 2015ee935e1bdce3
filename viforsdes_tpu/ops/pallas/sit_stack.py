"""Whole-stack fused SiT kernel: ALL encoder blocks in one Pallas call.

Third-generation encoder kernel, and after round 2's measurements the SINGLE
retained fused-encoder family (the earlier per-block and split attention/MLP
kernel generations both measured at or below XLA speed end-to-end and were
pruned; see BASELINE.md). The insight from interleaved
profiling (profile_encoder.py): the XLA block is memory-bound — every one of
its ~30 ops round-trips [B, S, E] activations through HBM, and the per-block
kernels still pay the inter-block streams. Fusing the ENTIRE stack removes
all inter-block HBM traffic:

- grid = batch tiles only (sequential); the token tile enters VMEM once,
  flows through all ``depth`` blocks, and leaves once;
- all blocks' weights are VMEM-resident for the whole kernel (stacked
  operands with constant index maps — fetched once, ~38 MB fp32 at the
  headline shape);
- the value-residual stream (block 0 exports v0, later blocks mix it,
  ref ``sit.py:144-145``) never leaves VMEM;
- forward stashes each block's INPUT (the residual stream) to HBM — the only
  O(depth) traffic — and the backward recomputes intra-block intermediates
  from it, one block at a time, in reverse;
- weight gradients accumulate into grid-resident fp32 output accumulators
  (constant index maps + init at tile 0), the same atomics-free pattern as
  the sampler BPTT kernel (ops/pallas/sde_sampler.py).

Per-block math lives in ``sit_cores.py`` (``_attn_half_core`` /
``_mlp_half_core`` and their backwards), tested against the XLA path.
Parity target for the fused ops: reference ``primitives/attn.py:106`` +
``primitives/sit.py:162-186``.

API: ``FusedSiTStack(spec, cos, sin)(stacked_weights, x [B,S,E],
cond_all [B, depth*6*E]) -> x_out [B,S,E]`` under ``jax.custom_vjp``; the
adaLN cond projections (one [B,C]@[C,6E] matmul per block) stay outside in
XLA, as does sit's input/output projection.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viforsdes_tpu.ops.pallas.sit_cores import (
    SiTBlockSpec,
    _attn_half_bwd,
    _attn_half_core,
    _mlp_half_bwd,
    _mlp_half_core,
    _set_mxu_dtype,
)

Array = jax.Array


class SiTStackSpec(NamedTuple):
    seq_len: int
    embed_dim: int
    num_heads: int
    mlp_hidden: int
    depth: int
    ln_eps: float = 1e-5
    qk_eps: float = 1e-6
    bt_fwd: int = 8
    bt_bwd: int = 4
    mxu_dtype: str = "bf16"
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def s_pad(self) -> int:
        return ((self.seq_len + 7) // 8) * 8

    def block_spec(self, blk: int, bt: int) -> SiTBlockSpec:
        """Per-block core spec: block 0 exports v0, later blocks mix it."""
        return SiTBlockSpec(
            seq_len=self.seq_len, embed_dim=self.embed_dim,
            num_heads=self.num_heads, mlp_hidden=self.mlp_hidden,
            ln_eps=self.ln_eps, qk_eps=self.qk_eps,
            residual_v=blk > 0, block_bt=bt,
            mxu_dtype=self.mxu_dtype, interpret=self.interpret,
        )


# Stacked weight operand order (all blocks concatenated along rows).
_W_NAMES = ["w_qkv", "b_qkv", "w_o", "b_o", "w_g", "b_g",
            "w_m1", "b_m1", "w_m2", "b_m2", "lam"]


def _stack_weight_shapes(spec: SiTStackSpec):
    e, dh, m, d = spec.embed_dim, spec.head_dim, spec.mlp_hidden, spec.depth
    return [
        (d * e, 3 * e), (d, 3 * e),   # qkv
        (d * e, e), (d, e),           # out proj
        (d * e, dh), (d, dh),         # gate
        (d * e, 2 * m), (d, 2 * m),   # mlp in
        (d * m, e), (d, e),           # mlp out
        (d, 1),                       # lam (row 0 unused)
    ]


def _block_weights(spec: SiTStackSpec, refs, blk: int) -> dict:
    """Static row slices of the stacked weight refs for one block."""
    e, m = spec.embed_dim, spec.mlp_hidden
    wqkv, bqkv, wo, bo, wg, bg, wm1, bm1, wm2, bm2, lam = refs
    re_ = slice(blk * e, (blk + 1) * e)
    return dict(
        w_qkv=wqkv[re_], b_qkv=bqkv[blk],
        w_o=wo[re_], b_o=bo[blk],
        w_g=wg[re_], b_g=bg[blk],
        w_m1=wm1[re_], b_m1=bm1[blk],
        w_m2=wm2[blk * m : (blk + 1) * m], b_m2=bm2[blk],
        lam=lam[blk, 0] if blk > 0 else None,
    )


# =============================================================== forward ====


def _fwd_kernel(spec: SiTStackSpec, x_ref, cond_ref, cos_ref, sin_ref, *refs):
    w_refs = refs[: len(_W_NAMES)]
    x_out_ref, xs_ref, v0_ref = refs[len(_W_NAMES) :]

    _set_mxu_dtype(spec)
    bt = spec.bt_fwd
    x = x_ref[:].astype(jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)  # [bt, depth*6, E]
    cos_t, sin_t = cos_ref[:], sin_ref[:]

    v0 = None
    for blk in range(spec.depth):
        xs_ref[blk] = x.astype(xs_ref.dtype)  # stash the block INPUT
        w = _block_weights(spec, w_refs, blk)
        cond_blk = cond[:, blk * 6 : (blk + 1) * 6, :]
        bspec = spec.block_spec(blk, bt)
        f = _attn_half_core(bspec, bt, x, cond_blk, v0, cos_t, sin_t, w)
        f.update(_mlp_half_core(bspec, bt, f["x2"], cond_blk, w, part0=3))
        if blk == 0:
            v0 = f["v_mixed"].astype(jnp.float32)
            v0_ref[:] = v0.astype(v0_ref.dtype)
        x = f["x_out"]

    x_out_ref[:] = x.astype(x_out_ref.dtype)


# =============================================================== backward ===


def _bwd_kernel(spec: SiTStackSpec, xs_ref, v0_ref, cond_ref, cos_ref, sin_ref, *refs):
    n_w = len(_W_NAMES)
    w_refs = refs[:n_w]
    d_xout_ref = refs[n_w]
    d_x_ref, d_cond_ref, *d_w_refs = refs[n_w + 1 :]

    _set_mxu_dtype(spec)
    bt = spec.bt_bwd
    e, m = spec.embed_dim, spec.mlp_hidden

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in d_w_refs:
            r[:] = jnp.zeros_like(r)

    cond = cond_ref[:].astype(jnp.float32)
    cos_t, sin_t = cos_ref[:], sin_ref[:]
    v0 = v0_ref[:].astype(jnp.float32)

    d = d_xout_ref[:].astype(jnp.float32)
    d_v0_acc = jnp.zeros_like(d)
    # per-sample adaLN-branch grads, collected across blocks and written once
    # per sample at the end (single [depth*6, E] store per sample)
    d_cond_rows: list[list] = [[None] * spec.depth for _ in range(bt)]

    for blk in reversed(range(spec.depth)):
        x_in = xs_ref[blk].astype(jnp.float32)
        w = _block_weights(spec, w_refs, blk)
        cond_blk = cond[:, blk * 6 : (blk + 1) * 6, :]
        bspec = spec.block_spec(blk, bt)

        v0_blk = v0 if blk > 0 else None
        f = _attn_half_core(bspec, bt, x_in, cond_blk, v0_blk, cos_t, sin_t, w)
        f.update(_mlp_half_core(bspec, bt, f["x2"], cond_blk, w, part0=3))

        d_x2, (d_s2, d_b2, d_g2), dw_mlp = _mlp_half_bwd(
            bspec, bt, f, cond_blk, d, w, part0=3
        )
        if blk > 0:
            # later blocks' exported v_state is unused (sit keeps only v0);
            # their pull on v0 accumulates via the residual mixing.
            d, (d_s1, d_b1, d_g1), d_v0_blk, dw_attn = _attn_half_bwd(
                bspec, bt, f, cond_blk, x_in, v0_blk, d_x2, 0.0, w, cos_t, sin_t
            )
            d_v0_acc = d_v0_acc + d_v0_blk
        else:
            # block 0's v IS v0: route the accumulated v0 cotangent into its
            # value projection via the d_vout hook.
            d, (d_s1, d_b1, d_g1), _, dw_attn = _attn_half_bwd(
                bspec, bt, f, cond_blk, x_in, None, d_x2, d_v0_acc, w, cos_t, sin_t
            )

        for b in range(bt):
            d_cond_rows[b][blk] = jnp.concatenate(
                [d_s1[b], d_b1[b], d_g1[b], d_s2[b], d_b2[b], d_g2[b]], axis=0
            )

        # accumulate into the stacked-grad refs; 2-D slices throughout (row
        # slices for weights, [1, X] row slices for biases/lam) — friendliest
        # store shapes for Mosaic
        dw = {**dw_attn, **dw_mlp}
        re_ = slice(blk * e, (blk + 1) * e)
        rm = slice(blk * m, (blk + 1) * m)
        rb = slice(blk, blk + 1)
        wq, bq, wo, bo, wg, bg, wm1, bm1, wm2, bm2, lam = d_w_refs
        wq[re_] += dw["w_qkv"]
        bq[rb, :] += dw["b_qkv"]
        wo[re_] += dw["w_o"]
        bo[rb, :] += dw["b_o"]
        wg[re_] += dw["w_g"]
        bg[rb, :] += dw["b_g"]
        wm1[re_] += dw["w_m1"]
        bm1[rb, :] += dw["b_m1"]
        wm2[rm] += dw["w_m2"]
        bm2[rb, :] += dw["b_m2"]
        lam[rb, :] += dw["lam"]

    for b in range(bt):
        d_cond_ref[b] = jnp.concatenate(d_cond_rows[b], axis=0).astype(
            d_cond_ref.dtype
        )
    d_x_ref[:] = d.astype(d_x_ref.dtype)


# ====================================================== pallas_call setup ==


# Mosaic's default scoped-VMEM budget is 16 MB, far below the physical
# 128 MB; the stack kernel's working set (batch tile x one block's
# intermediates) plus resident stacked weights need more. This limit is what
# capped the earlier per-block kernels at batch-tile 2.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _const(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


def _tok_tile(bt, sp, e):
    return pl.BlockSpec((bt * sp, e), lambda b: (b, 0), memory_space=pltpu.VMEM)


def _cond_tile(bt, rows, e):
    return pl.BlockSpec((bt, rows, e), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _stash_tile(depth, bt, sp, e):
    return pl.BlockSpec(
        (depth, bt * sp, e), lambda b: (0, b, 0), memory_space=pltpu.VMEM
    )


class FusedSiTStack:
    """custom_vjp whole-stack SiT: ``(stacked_weights, x [B,S,E],
    cond_all [B, depth*6*E]) -> x_out [B,S,E]``."""

    def __init__(self, spec: SiTStackSpec, rope_cos: Array, rope_sin: Array) -> None:
        self.spec = spec
        pad = spec.s_pad - spec.seq_len
        cos = np.pad(np.asarray(rope_cos, dtype=np.float32), ((0, pad), (0, 0)))
        sin = np.pad(np.asarray(rope_sin, dtype=np.float32), ((0, pad), (0, 0)))
        # plain numpy on self (never tracers); tiled per batch-tile sample
        self._cos_fwd = np.tile(cos, (spec.bt_fwd, 1))
        self._sin_fwd = np.tile(sin, (spec.bt_fwd, 1))
        self._cos_bwd = np.tile(cos, (spec.bt_bwd, 1))
        self._sin_bwd = np.tile(sin, (spec.bt_bwd, 1))

        @jax.custom_vjp
        def call(kw, x, cond_all):
            out, _, _ = self._forward(kw, x, cond_all)
            return out

        def call_fwd(kw, x, cond_all):
            out, xs, v0 = self._forward(kw, x, cond_all)
            return out, (kw, cond_all, xs, v0)

        call.defvjp(call_fwd, self._backward)
        self._call = call

    def __call__(self, kw: tuple, x: Array, cond_all: Array) -> Array:
        return self._call(kw, x, cond_all)

    # ------------------------------------------------------------- plumbing

    def _pad_tokens(self, a: Array, batch: int, bt: int):
        """[B, S, E] -> flat [pad_b*S_pad, E] (zero padded)."""
        spec = self.spec
        pad_b = -(-batch // bt) * bt
        row_pad = spec.s_pad - spec.seq_len
        if pad_b != batch or row_pad:
            a = jnp.pad(a, ((0, pad_b - batch), (0, row_pad), (0, 0)))
        return a.reshape(pad_b * spec.s_pad, a.shape[-1]), pad_b

    def _pad_cond(self, cond_all: Array, batch: int, bt: int):
        """[B, depth*6*E] -> [pad_b, depth*6, E]."""
        spec = self.spec
        pad_b = -(-batch // bt) * bt
        if pad_b != batch:
            cond_all = jnp.pad(cond_all, ((0, pad_b - batch), (0, 0)))
        return cond_all.reshape(pad_b, spec.depth * 6, spec.embed_dim)

    def _forward(self, kw, x, cond_all):
        spec = self.spec
        batch, s, e = x.shape
        bt = spec.bt_fwd
        sp = spec.s_pad
        xf, pad_b = self._pad_tokens(x, batch, bt)
        condf = self._pad_cond(cond_all, batch, bt)
        grid = (pad_b // bt,)
        kernel = functools.partial(_fwd_kernel, spec)
        x_out, xs, v0 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, spec.depth * 6, e),
                _const((bt * sp, spec.head_dim // 2)),
                _const((bt * sp, spec.head_dim // 2)),
                *[_const(shape) for shape in _stack_weight_shapes(spec)],
            ],
            out_specs=[
                _tok_tile(bt, sp, e),
                _stash_tile(spec.depth, bt, sp, e),
                _tok_tile(bt, sp, e),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pad_b * sp, e), x.dtype),
                jax.ShapeDtypeStruct((spec.depth, pad_b * sp, e), x.dtype),
                jax.ShapeDtypeStruct((pad_b * sp, e), x.dtype),
            ],
            interpret=spec.interpret,
            compiler_params=_VMEM_LIMIT,
        )(xf, condf, self._cos_fwd, self._sin_fwd, *kw)
        x_out = x_out.reshape(pad_b, sp, e)[:batch, :s]
        return x_out, xs, v0

    def _backward(self, res, d_out):
        spec = self.spec
        kw, cond_all, xs, v0 = res
        batch, s, e = d_out.shape  # d_out mirrors x: [B, S, E], x.dtype
        x_dtype = d_out.dtype
        bt = spec.bt_bwd
        sp = spec.s_pad

        d_outf, pad_b_fwd = self._pad_tokens(d_out, batch, spec.bt_fwd)
        # fwd stash is padded for bt_fwd; re-tile for the backward batch tile
        # (bt_bwd divides bt_fwd in practice; handle the general case by
        # repadding through [B, ...] shape)
        pad_b = -(-batch // bt) * bt
        if pad_b != pad_b_fwd:
            xs = xs.reshape(spec.depth, pad_b_fwd, sp, e)
            v0 = v0.reshape(pad_b_fwd, sp, e)
            d3 = d_outf.reshape(pad_b_fwd, sp, e)
            fix = lambda a: (
                jnp.pad(a, ((0, pad_b - a.shape[0]), (0, 0), (0, 0)))
                if pad_b > a.shape[0] else a[:pad_b]
            )
            xs = jnp.stack([fix(xs[i]) for i in range(spec.depth)]).reshape(
                spec.depth, pad_b * sp, e
            )
            v0 = fix(v0).reshape(pad_b * sp, e)
            d_outf = fix(d3).reshape(pad_b * sp, e)
        condf = self._pad_cond(cond_all, batch, bt)

        grid = (pad_b // bt,)
        w_shapes = _stack_weight_shapes(spec)
        kernel = functools.partial(_bwd_kernel, spec)
        results = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _stash_tile(spec.depth, bt, sp, e),
                _tok_tile(bt, sp, e),
                _cond_tile(bt, spec.depth * 6, e),
                _const((bt * sp, spec.head_dim // 2)),
                _const((bt * sp, spec.head_dim // 2)),
                *[_const(shape) for shape in w_shapes],
                _tok_tile(bt, sp, e),
            ],
            out_specs=[
                _tok_tile(bt, sp, e),
                _cond_tile(bt, spec.depth * 6, e),
                *[_const(shape) for shape in w_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pad_b * sp, e), jnp.float32),
                jax.ShapeDtypeStruct((pad_b, spec.depth * 6, e), jnp.float32),
                *[jax.ShapeDtypeStruct(shape, jnp.float32) for shape in w_shapes],
            ],
            interpret=spec.interpret,
            compiler_params=_VMEM_LIMIT,
        )(xs, v0, condf, self._cos_bwd, self._sin_bwd, *kw, d_outf)

        d_x = results[0].reshape(pad_b, sp, e)[:batch, :s].astype(x_dtype)
        d_cond = results[1][:batch].reshape(batch, spec.depth * 6 * e)
        d_kw = tuple(
            g.astype(w.dtype) for g, w in zip(results[2:], kw)
        )
        return (d_kw, d_x, d_cond)


def pack_stack_weights(spec: SiTStackSpec, block_params: list[dict]) -> tuple:
    """Stack ops.sit per-block param dicts into the kernel operand tuple.

    Weights stay fp32 (exact weight-grad dtype; they are cast to the MXU
    dtype inside the kernel at each matmul).
    """
    f32 = lambda a: a.astype(jnp.float32)
    cat = lambda picks: jnp.concatenate([f32(p) for p in picks], axis=0)
    row = lambda picks: jnp.stack([f32(p) for p in picks], axis=0)
    attn = [bp["attn"] for bp in block_params]
    mlp = [bp["mlp"] for bp in block_params]
    lam = jnp.stack(
        [
            jnp.asarray(
                a.get("v_residual_lambda", 0.0) if a.get("v_residual_lambda") is not None else 0.0,
                jnp.float32,
            )
            for a in attn
        ]
    ).reshape(spec.depth, 1)
    return (
        cat([a["qkv_proj"]["w"] for a in attn]),
        row([a["qkv_proj"]["b"] for a in attn]),
        cat([a["out_proj"]["w"] for a in attn]),
        row([a["out_proj"]["b"] for a in attn]),
        cat([a["gate_proj"]["w"] for a in attn]),
        row([a["gate_proj"]["b"] for a in attn]),
        cat([m["input_proj"]["w"] for m in mlp]),
        row([m["input_proj"]["b"] for m in mlp]),
        cat([m["output_proj"]["w"] for m in mlp]),
        row([m["output_proj"]["b"] for m in mlp]),
        lam,
    )
