"""Multi-head self-attention with QK-RMSNorm, RoPE, sigmoid output gate, and
residual-value mixing.

Parity target: reference ``primitives/attn.py:26-117``:
- fused QKV linear, heads split as ``b s (h d) -> b s h d``;
- per-head non-affine RMSNorm on Q/K (``attn.py:60-69``);
- 1-D RoPE on Q/K (``attn.py:90-91``);
- non-causal scaled-dot-product attention, no dropout (``attn.py:106``);
- sigmoid output gate of width head_dim broadcast over heads, zero-init so the
  gate is 0.5 at init (``attn.py:52-54,108-111``);
- optional residual-value mixing ``v = lam*v + (1-lam)*v0`` with learnable
  scalar ``lam`` init 0.5 (``attn.py:56-58,93-99``).

TPU notes: tensors stay in ``[B, S, H, D]`` layout end-to-end (the layout
``jax.nn.dot_product_attention`` wants, avoiding transposes); attention logits
and softmax accumulate in fp32 while inputs may be bf16.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viforsdes_tpu.ops.embeddings import RotaryTables, apply_rope_1d
from viforsdes_tpu.ops.flash_attention import flash_sdpa, use_flash_attention
from viforsdes_tpu.ops.initializers import (
    InitPolicy,
    DEFAULT_INIT_POLICY,
    linear,
    linear_init,
    zeros_init,
)
from viforsdes_tpu.ops.norms import rms_norm
from viforsdes_tpu.ops.pallas.qk_prep import qk_prep

Array = jax.Array


class AttentionConfig(NamedTuple):
    embed_dim: int
    num_heads: int
    qk_norm: bool = True
    qk_norm_eps: float = 1e-6
    bias: bool = True
    gate: bool = True
    residual_v: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def attention_init(key: Array, cfg: AttentionConfig, *, policy: InitPolicy = DEFAULT_INIT_POLICY) -> dict:
    if cfg.embed_dim % cfg.num_heads != 0:
        raise ValueError("embed_dim must be divisible by num_heads")
    k_qkv, k_out, k_gate = jax.random.split(key, 3)
    params = {
        "qkv_proj": linear_init(k_qkv, cfg.embed_dim, 3 * cfg.embed_dim, bias=cfg.bias, w_init=policy.attn_in),
        "out_proj": linear_init(k_out, cfg.embed_dim, cfg.embed_dim, bias=cfg.bias, w_init=policy.attn_out),
    }
    if cfg.gate:
        params["gate_proj"] = linear_init(k_gate, cfg.embed_dim, cfg.head_dim, bias=True, w_init=zeros_init)
    if cfg.residual_v:
        params["v_residual_lambda"] = jnp.float32(0.5)
    return params


def _rope_heads(x: Array, rotary: RotaryTables | None) -> Array:
    """Apply RoPE along the sequence axis of ``[B, S, H, D]``."""
    if rotary is None:
        return x
    bshd = jnp.swapaxes(x, 1, 2)  # [B, H, S, D]
    bshd = apply_rope_1d(bshd, rotary)
    return jnp.swapaxes(bshd, 1, 2)


@functools.partial(jax.checkpoint, static_argnums=(3,))
def _dense_sdpa_remat_impl(
    q: Array, k: Array, v: Array, real_len: int | None
) -> Array:
    """Non-causal SDPA over ``[B, S, H, D]`` with NO attention-prob residuals.

    ``jax.nn.dot_product_attention``'s fp32 softmax leaves ``f32[B, H, S, S]``
    probability tensors as saved residuals — the round-3 OU trace shows their
    HBM round-trips (6x ``f32[128,4,101,101]``) plus layout copies costing
    ~1.8 ms of the 9.25 ms step (BASELINE.md). Rematerializing the whole
    product (logits + softmax + PV) saves only ``q, k, v``; the backward
    recomputes the probs from a small compute-bound matmul instead of
    streaming them from HBM. fp32 logits/softmax as before; the recomputed
    probs feed the MXU in the input dtype.
    """
    d = q.shape[-1]
    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / d**0.5)
    if real_len is not None and real_len < q.shape[1]:
        # hoisted-padding stream on the dense path (CPU tests / forced mode):
        # mask exactly like the flash segment ids — tokens past real_len form
        # their own segment
        seg = jnp.arange(q.shape[1]) >= real_len
        same = seg[:, None] == seg[None, :]
        logits = jnp.where(same[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def _dense_sdpa_remat(
    q: Array, k: Array, v: Array, real_len: int | None = None
) -> Array:
    return _dense_sdpa_remat_impl(q, k, v, real_len)


def attention(
    params: dict,
    cfg: AttentionConfig,
    hidden_states: Array,
    *,
    rotary: RotaryTables | None = None,
    v0: Array | None = None,
    real_len: int | None = None,
) -> tuple[Array, Array]:
    """``[B, S, E] -> ([B, S, E], v_state [B, S, H, D])``.

    Always returns the (post-mix) value state; callers that don't need it just
    drop it (the reference's ``return_value`` flag collapses to this).

    ``real_len``: hoisted-padding token stream (round 5) — S is already
    padded to the flash block multiple at the encoder level and only the
    first ``real_len`` tokens are real. Attention masks the pad tokens into
    their own segment (flash segment ids / dense logit mask); every other op
    here is token-local, and pad rows receive zero cotangent from the
    encoder's final slice, so weight gradients are exact.
    """
    b, s, _ = hidden_states.shape
    h, d = cfg.num_heads, cfg.head_dim

    qkv = linear(params["qkv_proj"], hidden_states)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # Long grids dispatch to the blockwise Mosaic kernel: the dense path
    # materializes [B, H, S, S] probabilities in HBM, which dominates the
    # step at S ~ 2000 (ops/flash_attention.py). The choice is static (S is
    # a trace constant). On the flash path everything between the QKV and
    # output projections runs in the kernel's native [B, H, S, D] layout —
    # one transpose in, one out. Measured end-to-end this is a WASH vs
    # transposing at each kernel boundary (175.0 vs 175.1 ms/step Lorenz,
    # profile_flash_layout.py — XLA already folded those copies); it is kept
    # as the marginally simpler program. QK-RMSNorm and RoPE are
    # layout-agnostic (last-dim math), so both paths share them.
    # Dense-native layout and padded-grid (S=101 -> 128) candidates for the
    # short-grid path were built and measured round 4 and LOSE end-to-end
    # (base 10.28 ms/step vs native 16.31, pad 11.80, both 18.15 —
    # profile_dense_variants.py, interleaved; BASELINE.md round 4), so the
    # dense path stays [B, S, H, D] unpadded and only flash uses the kernel
    # layout.
    flash = use_flash_attention(s)
    if flash:
        q = jnp.swapaxes(q.reshape(b, s, h, d), 1, 2)  # [B, H, S, D]
        k = jnp.swapaxes(k.reshape(b, s, h, d), 1, 2)
        v = jnp.swapaxes(v.reshape(b, s, h, d), 1, 2)
    else:
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)

    # QK-RMS-norm + RoPE. On the TPU flash path both fuse into ONE Pallas
    # pass per tensor (ops/pallas/qk_prep.py): XLA's unfused compilation
    # streams fp32 intermediates at the fusion boundaries (~1.16 ms/block fwd
    # + ~1.4 bwd at the Lorenz shape, ~18 ms/step total — trace_lorenz_
    # ropehalves.json) where one read + one write costs ~0.2 ms.
    # VIFORSDES_QK_PREP=0 reverts to the unfused composition (trace-time).
    fuse_prep = (
        cfg.qk_norm
        and rotary is not None
        and rotary.cos.shape[-1] * 2 == d
        and jax.default_backend() == "tpu"
        and os.environ.get("VIFORSDES_QK_PREP", "1") != "0"
        # Flash path only: on the short-grid dense path the same kernel
        # (through the [B, H, S, D] transposes it needs) measured 16.37 vs
        # 10.28 ms/step end-to-end (round 4, profile_dense_variants.py
        # 'qkdense') — XLA already fuses the S=101 prep streams well.
        and flash
    )
    if fuse_prep:
        cos, sin = rotary.cos[:s], rotary.sin[:s]
        q = qk_prep(q, cos, sin, cfg.qk_norm_eps)
        k = qk_prep(k, cos, sin, cfg.qk_norm_eps)
    else:
        if cfg.qk_norm:
            q = rms_norm(q, eps=cfg.qk_norm_eps)
            k = rms_norm(k, eps=cfg.qk_norm_eps)
        if flash:
            # already [B, H, S, D], the layout apply_rope_1d expects
            q = apply_rope_1d(q, rotary) if rotary is not None else q
            k = apply_rope_1d(k, rotary) if rotary is not None else k
        else:
            q = _rope_heads(q, rotary)
            k = _rope_heads(k, rotary)

    if cfg.residual_v and v0 is not None:
        if v0.shape != v.shape:
            raise ValueError(f"v0 shape {v0.shape} must match value heads {v.shape}")
        lam = params["v_residual_lambda"].astype(v.dtype)
        v = lam * v + (1.0 - lam) * v0

    # v state stays in the layout of the active path ([B, H, S, D] flash,
    # [B, S, H, D] dense) — it only flows between blocks of the same stack,
    # which all take the same path (S is shared).
    v_out = v

    if flash:
        attn_output = flash_sdpa(
            q, k, v, kernel_layout=True, real_len=real_len
        )  # [B, H, S, D]
    elif os.environ.get("VIFORSDES_DENSE_REMAT", "1") != "0":
        # Default ON: device-op trace sums (the only noise-free yardstick on
        # this tunnel) measure 9.00 vs 9.25 ms/step at the OU headline —
        # remat trades +0.33 ms of recompute matmuls for −0.58 ms of
        # prob-residual HBM traffic (trace_ou_remat.json vs trace_ou.json).
        # VIFORSDES_DENSE_REMAT=0 restores the library SDPA (trace-time knob).
        attn_output = _dense_sdpa_remat(q, k, v, real_len)
    else:
        if real_len is not None and real_len < s:
            seg = jnp.arange(s) >= real_len
            mask = (seg[:, None] == seg[None, :])[None, None]
            attn_output = jax.nn.dot_product_attention(q, k, v, mask=mask)
        else:
            attn_output = jax.nn.dot_product_attention(q, k, v)

    if cfg.gate:
        gate_scores = jax.nn.sigmoid(linear(params["gate_proj"], hidden_states))
        if flash:
            attn_output = attn_output * gate_scores[:, None, :, :]
        else:
            attn_output = attn_output * gate_scores[:, :, None, :]

    if flash:
        attn_output = jnp.swapaxes(attn_output, 1, 2)  # back to [B, S, H, D]
    out = linear(params["out_proj"], attn_output.reshape(b, s, h * d))
    return out, v_out
