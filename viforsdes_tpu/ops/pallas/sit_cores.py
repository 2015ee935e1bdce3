"""Shared in-kernel math for the fused SiT encoder kernels.

These are the forward/backward "halves" of one SiT block — LayerNorm ->
adaLN affine -> attention (QK-RMSNorm, RoPE, SDPA, sigmoid output gate,
residual-value mixing) -> gated residual add (attention half), and
LayerNorm -> adaLN affine -> SwiGLU -> gated residual add (MLP half) —
written as plain fp32/2-D jnp functions callable from inside a Pallas
kernel body. The one consumer is ``sit_stack.py`` (the whole-stack fused
kernel, the single opt-in fused-encoder family kept after round 2's
measurements; the per-block and split-kernel wrappers that also used these
cores measured slower than XLA end-to-end and were pruned — see BASELINE.md).

Layout contract: token streams travel FLATTENED as ``[Bt*S_pad, E]``
(sample-major, rows zero-padded per sample to the sublane quantum); anything
per-sample (adaLN modulation, attention, gradient reductions) uses static row
slices ``[b*S:(b+1)*S]``. Mosaic lowers 2-D vectors and plain 2-D matmuls far
more compactly than 3-D batched ops (the 3-D formulation OOM'd the compiler).

Math matches ops/attention.py, ops/sit.py, ops/norms.py exactly in fp32
(tests/test_pallas_sit_stack.py): LayerNorm uses E[x^2]-E[x]^2 variance with
fp32 stats; gate scores come from the MODULATED input a1 (ref
``attn.py:108-111``); value state exported/mixed per ``sit.py:144-145``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SiTBlockSpec(NamedTuple):
    seq_len: int
    embed_dim: int
    num_heads: int
    mlp_hidden: int
    ln_eps: float = 1e-5
    qk_eps: float = 1e-6
    residual_v: bool = False  # mix v with incoming v0 (blocks > 0)
    block_bt: int = 2
    # MXU input dtype: "bf16" matches the XLA path (bf16 inputs, fp32
    # accumulate; fp32 f32 matmuls run at a fraction of MXU throughput);
    # "fp32" for exact-parity testing.
    mxu_dtype: str = "bf16"
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def s_pad(self) -> int:
        """Per-sample row count padded to the sublane quantum, so any batch
        tile keeps (block_bt * s_pad) % 8 == 0. Padded rows carry zeros: LN of
        a zero row is finite, matmuls of zeros are zeros, attention only
        touches the real rows, and all padded-row cotangents are zero."""
        return ((self.seq_len + 7) // 8) * 8


# ----------------------------------------------------------- shared pieces


def _ln(x, eps):
    """fp32 LayerNorm over rows; returns (y, rstd). x fp32 [R, E]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return (x - mean) * rstd, rstd


def _ln_bwd(dy, y, rstd):
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * y, axis=-1, keepdims=True)
    return (dy - m1 - y * m2) * rstd


def _rms(x, eps):
    r = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return x * r, r


def _rms_bwd(dy, x, r):
    return dy * r - x * (r**3) * jnp.mean(dy * x, axis=-1, keepdims=True)


def _rope_apply(q, cos, sin):
    half = q.shape[-1] // 2
    qr, qi = q[..., :half], q[..., half:]
    return jnp.concatenate([qr * cos - qi * sin, qr * sin + qi * cos], axis=-1)


def _rope_bwd(dq, cos, sin):
    half = dq.shape[-1] // 2
    dr, di = dq[..., :half], dq[..., half:]
    return jnp.concatenate([dr * cos + di * sin, -dr * sin + di * cos], axis=-1)


_MXU_DTYPE = jnp.bfloat16  # set per-kernel via _set_mxu_dtype


class _MxuMode:
    dtype = jnp.bfloat16


def _set_mxu_dtype(spec):
    _MxuMode.dtype = jnp.bfloat16 if spec.mxu_dtype == "bf16" else jnp.float32


def _cast(a):
    return a.astype(_MxuMode.dtype)


def _dot(a, b):
    return jnp.dot(_cast(a), _cast(b), preferred_element_type=jnp.float32)


def _dot_tA(a, b):
    """a^T @ b without materializing the transpose."""
    return jax.lax.dot_general(
        _cast(a), _cast(b), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_tB(a, b):
    """a @ b^T without materializing the transpose."""
    return jax.lax.dot_general(
        _cast(a), _cast(b), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mod(cond, y, bt, sp, part, *, one_plus):
    """Per-sample adaLN modulation over a [bt*sp, E] stream.
    cond[b, part] is the per-sample branch vector."""
    pieces = []
    for b in range(bt):
        c = cond[b, part][None, :]
        rows = y[b * sp : (b + 1) * sp]
        pieces.append((1.0 + c) * rows if one_plus else c * rows)
    return jnp.concatenate(pieces, axis=0)


def _affine_mod(cond, y, bt, sp, scale_part, shift_part):
    """(1 + scale) * y + shift, per sample."""
    pieces = []
    for b in range(bt):
        sc = cond[b, scale_part][None, :]
        sh = cond[b, shift_part][None, :]
        pieces.append((1.0 + sc) * y[b * sp : (b + 1) * sp] + sh)
    return jnp.concatenate(pieces, axis=0)


def _attn_half_core(spec, bt, x, cond, v0, cos_t, sin_t, w):
    """Attention half of a SiT block, fp32, 2-D. x/v0: [bt*S_pad, E];
    cond: [bt, >=3, E] rows (s1|b1|g1...); cos_t/sin_t: [bt*S_pad, Dh/2].
    Returns every intermediate the backward needs."""
    e = spec.embed_dim
    dh = spec.head_dim
    nh = spec.num_heads
    s = spec.seq_len
    sp = spec.s_pad

    def with_row_pad(pieces):
        """concat per-sample [s, X] pieces, zero-padding each to [sp, X]."""
        if sp == s:
            return jnp.concatenate(pieces, axis=0)
        out = []
        for p in pieces:
            out.append(p)
            out.append(jnp.zeros((sp - s, p.shape[1]), p.dtype))
        return jnp.concatenate(out, axis=0)

    y1, rstd1 = _ln(x, spec.ln_eps)
    a1 = _affine_mod(cond, y1, bt, sp, 0, 1)

    act = _MxuMode.dtype
    qkv = (_dot(a1, w["w_qkv"]) + w["b_qkv"]).astype(act)
    q, k, v = qkv[:, :e], qkv[:, e : 2 * e], qkv[:, 2 * e :]

    qn_cols, kn_cols, qr_list, kr_list = [], [], [], []
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        qh, qr = _rms(q[:, sl].astype(jnp.float32), spec.qk_eps)
        kh, kr = _rms(k[:, sl].astype(jnp.float32), spec.qk_eps)
        qn_cols.append(_rope_apply(qh, cos_t, sin_t).astype(act))
        kn_cols.append(_rope_apply(kh, cos_t, sin_t).astype(act))
        qr_list.append(qr)
        kr_list.append(kr)
    qrp = jnp.concatenate(qn_cols, axis=-1)
    krp = jnp.concatenate(kn_cols, axis=-1)

    if spec.residual_v:
        lam = w["lam"]
        v_mixed = (lam * v.astype(jnp.float32) + (1.0 - lam) * v0).astype(act)
    else:
        v_mixed = v

    # SDPA per (sample, head), static 2-D slices over the REAL rows only
    scale = 1.0 / (dh**0.5)
    ctx_rows = []
    probs = {}
    for b in range(bt):
        rows = slice(b * sp, b * sp + s)
        head_cols = []
        for h in range(nh):
            sl = slice(h * dh, (h + 1) * dh)
            logits = _dot_tB(qrp[rows, sl], krp[rows, sl]) * scale
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            ex = jnp.exp(logits)
            p = ex / jnp.sum(ex, axis=-1, keepdims=True)
            probs[(b, h)] = p.astype(act)
            head_cols.append(_dot(p, v_mixed[rows, sl]).astype(act))
        ctx_rows.append(jnp.concatenate(head_cols, axis=-1))
    ctx = with_row_pad(ctx_rows)

    gate_pre = _dot(a1, w["w_g"]) + w["b_g"]  # [Bt*S, Dh]
    gate = jax.nn.sigmoid(gate_pre).astype(act)
    gate_full = jnp.concatenate([gate] * nh, axis=-1)
    gated_ctx = ctx * gate_full

    out1 = _dot(gated_ctx, w["w_o"]) + w["b_o"]
    x2 = x + _mod(cond, out1, bt, sp, 2, one_plus=False)

    return dict(
        y1=y1, rstd1=rstd1, a1=a1, q=q, k=k, v=v,
        qr_list=qr_list, kr_list=kr_list, qrp=qrp, krp=krp,
        v_mixed=v_mixed, ctx=ctx, probs=probs,
        gate=gate, gate_full=gate_full, gated_ctx=gated_ctx, out1=out1, x2=x2,
    )


def _mlp_half_core(spec, bt, x2, cond, w, *, part0=3):
    """MLP half of a SiT block, fp32, 2-D. x2: [bt*S_pad, E]; cond rows
    (s2|b2|g2) start at index ``part0`` (3 in the full-block layout, 0 in the
    split-kernel layout)."""
    sp = spec.s_pad
    act = _MxuMode.dtype

    y2, rstd2 = _ln(x2, spec.ln_eps)
    a2 = _affine_mod(cond, y2, bt, sp, part0, part0 + 1)
    m_pre = (_dot(a2, w["w_m1"]) + w["b_m1"]).astype(act)
    left, right = m_pre[:, : spec.mlp_hidden], m_pre[:, spec.mlp_hidden :]
    sig_l = jax.nn.sigmoid(left.astype(jnp.float32)).astype(act)
    silu_l = left * sig_l
    mlp_mid = silu_l * right
    mlp_out = _dot(mlp_mid, w["w_m2"]) + w["b_m2"]
    x_out = x2 + _mod(cond, mlp_out, bt, sp, part0 + 2, one_plus=False)

    return dict(
        y2=y2, rstd2=rstd2, a2=a2, left=left, right=right,
        sig_l=sig_l, silu_l=silu_l, mlp_mid=mlp_mid, mlp_out=mlp_out,
        x_out=x_out,
    )


# ------------------------------------------------------ backward halves


def _per_sample_dot(dy, other, bt, sp):
    """per-sample sum over rows of (dy * other) -> list of [1, E]."""
    return [
        jnp.sum(
            dy[b * sp : (b + 1) * sp] * other[b * sp : (b + 1) * sp],
            axis=0,
            keepdims=True,
        )
        for b in range(bt)
    ]


def _per_sample_rowsum(dy, bt, sp):
    return [jnp.sum(dy[b * sp : (b + 1) * sp], axis=0, keepdims=True) for b in range(bt)]


def _with_row_pad(pieces, s, sp):
    if sp == s:
        return jnp.concatenate(pieces, axis=0)
    out = []
    for p in pieces:
        out.append(p)
        out.append(jnp.zeros((sp - s, p.shape[1]), p.dtype))
    return jnp.concatenate(out, axis=0)


def _mlp_half_bwd(spec, bt, f, cond, d_xout, w, *, part0=3):
    """Backward of ``_mlp_half_core``. Returns (d_x2, (d_s2, d_b2, d_g2) as
    per-sample [1, E] lists, weight-grad dict)."""
    sp = spec.s_pad

    d_g2 = _per_sample_dot(d_xout, f["mlp_out"], bt, sp)
    d_mlp_out = _mod(cond, d_xout, bt, sp, part0 + 2, one_plus=False)
    d_w_m2 = _dot_tA(f["mlp_mid"], d_mlp_out)
    d_b_m2 = jnp.sum(d_mlp_out, axis=0, keepdims=True)
    d_mid = _dot_tB(d_mlp_out, w["w_m2"])
    d_silu = d_mid * f["right"]
    d_right = d_mid * f["silu_l"]
    d_left = d_silu * (f["sig_l"] * (1.0 + f["left"] * (1.0 - f["sig_l"])))
    d_mpre = jnp.concatenate([d_left, d_right], axis=-1)
    d_w_m1 = _dot_tA(f["a2"], d_mpre)
    d_b_m1 = jnp.sum(d_mpre, axis=0, keepdims=True)
    d_a2 = _dot_tB(d_mpre, w["w_m1"])
    d_s2 = _per_sample_dot(d_a2, f["y2"], bt, sp)
    d_b2 = _per_sample_rowsum(d_a2, bt, sp)
    d_y2 = _mod(cond, d_a2, bt, sp, part0, one_plus=True)
    d_x2 = d_xout + _ln_bwd(d_y2, f["y2"], f["rstd2"])

    d_w = {"w_m1": d_w_m1, "b_m1": d_b_m1, "w_m2": d_w_m2, "b_m2": d_b_m2}
    return d_x2, (d_s2, d_b2, d_g2), d_w


def _attn_half_bwd(spec, bt, f, cond, x, v0, d_x2, d_vout, w, cos_t, sin_t):
    """Backward of ``_attn_half_core``. Returns (d_x, (d_s1, d_b1, d_g1),
    d_v0, weight-grad dict incl. lam)."""
    e = spec.embed_dim
    dh = spec.head_dim
    nh = spec.num_heads
    s = spec.seq_len
    sp = spec.s_pad

    d_g1 = _per_sample_dot(d_x2, f["out1"], bt, sp)
    d_out1 = _mod(cond, d_x2, bt, sp, 2, one_plus=False)
    d_w_o = _dot_tA(f["gated_ctx"], d_out1)
    d_b_o = jnp.sum(d_out1, axis=0, keepdims=True)
    d_gctx = _dot_tB(d_out1, w["w_o"])
    d_ctx = d_gctx * f["gate_full"]
    d_gate = sum(
        d_gctx[:, h * dh : (h + 1) * dh] * f["ctx"][:, h * dh : (h + 1) * dh]
        for h in range(nh)
    )
    d_gate_pre = d_gate * f["gate"] * (1.0 - f["gate"])
    d_w_g = _dot_tA(f["a1"], d_gate_pre)
    d_b_g = jnp.sum(d_gate_pre, axis=0, keepdims=True)
    d_a1_from_gate = _dot_tB(d_gate_pre, w["w_g"])

    scale = 1.0 / (dh**0.5)
    d_q_rows, d_k_rows, d_vm_rows = [], [], []
    for b in range(bt):
        rows = slice(b * sp, b * sp + s)
        dq_cols, dk_cols, dv_cols = [], [], []
        for h in range(nh):
            sl = slice(h * dh, (h + 1) * dh)
            p = f["probs"][(b, h)]
            do = d_ctx[rows, sl]
            d_p = _dot_tB(do, f["v_mixed"][rows, sl])
            dv_cols.append(_dot_tA(p, do))
            d_logits = p * (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True))
            dq_cols.append(_dot(d_logits, f["krp"][rows, sl]) * scale)
            dk_cols.append(_dot_tA(d_logits, f["qrp"][rows, sl]) * scale)
        d_q_rows.append(jnp.concatenate(dq_cols, axis=-1))
        d_k_rows.append(jnp.concatenate(dk_cols, axis=-1))
        d_vm_rows.append(jnp.concatenate(dv_cols, axis=-1))
    d_qrp = _with_row_pad(d_q_rows, s, sp)
    d_krp = _with_row_pad(d_k_rows, s, sp)
    d_vm = _with_row_pad(d_vm_rows, s, sp) + d_vout

    if spec.residual_v:
        lam = w["lam"]
        d_lam = jnp.sum(d_vm * (f["v"] - v0))
        d_v = d_vm * lam
        d_v0 = d_vm * (1.0 - lam)
    else:
        d_lam = jnp.zeros((), jnp.float32)
        d_v = d_vm
        d_v0 = jnp.zeros_like(d_vm)

    d_q_cols2, d_k_cols2 = [], []
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        d_qn = _rope_bwd(d_qrp[:, sl], cos_t, sin_t)
        d_kn = _rope_bwd(d_krp[:, sl], cos_t, sin_t)
        d_q_cols2.append(_rms_bwd(d_qn, f["q"][:, sl], f["qr_list"][h]))
        d_k_cols2.append(_rms_bwd(d_kn, f["k"][:, sl], f["kr_list"][h]))
    d_q = jnp.concatenate(d_q_cols2, axis=-1)
    d_k = jnp.concatenate(d_k_cols2, axis=-1)

    d_qkv = jnp.concatenate([d_q, d_k, d_v], axis=-1)
    d_w_qkv = _dot_tA(f["a1"], d_qkv)
    d_b_qkv = jnp.sum(d_qkv, axis=0, keepdims=True)
    d_a1 = _dot_tB(d_qkv, w["w_qkv"]) + d_a1_from_gate

    d_s1 = _per_sample_dot(d_a1, f["y1"], bt, sp)
    d_b1 = _per_sample_rowsum(d_a1, bt, sp)
    d_y1 = _mod(cond, d_a1, bt, sp, 0, one_plus=True)
    d_x = d_x2 + _ln_bwd(d_y1, f["y1"], f["rstd1"])

    d_w = {
        "w_qkv": d_w_qkv, "b_qkv": d_b_qkv, "w_o": d_w_o, "b_o": d_b_o,
        "w_g": d_w_g, "b_g": d_b_g, "lam": d_lam.reshape(1, 1),
    }
    return d_x, (d_s1, d_b1, d_g1), d_v0, d_w
