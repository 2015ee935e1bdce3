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


def attention(
    params: dict,
    cfg: AttentionConfig,
    hidden_states: Array,
    *,
    rotary: RotaryTables | None = None,
    v0: Array | None = None,
) -> tuple[Array, Array]:
    """``[B, S, E] -> ([B, S, E], v_state [B, S, H, D])``.

    Always returns the (post-mix) value state; callers that don't need it just
    drop it (the reference's ``return_value`` flag collapses to this).
    """
    b, s, _ = hidden_states.shape
    h, d = cfg.num_heads, cfg.head_dim

    qkv = linear(params["qkv_proj"], hidden_states)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, h, d)
    k = k.reshape(b, s, h, d)
    v = v.reshape(b, s, h, d)

    if cfg.qk_norm:
        q = rms_norm(q, eps=cfg.qk_norm_eps)
        k = rms_norm(k, eps=cfg.qk_norm_eps)

    q = _rope_heads(q, rotary)
    k = _rope_heads(k, rotary)

    if cfg.residual_v and v0 is not None:
        if v0.shape != v.shape:
            raise ValueError(f"v0 shape {v0.shape} must match value heads {v.shape}")
        lam = params["v_residual_lambda"].astype(v.dtype)
        v = lam * v + (1.0 - lam) * v0

    v_out = v

    # Non-causal SDPA; fp32 logits/softmax, output in input dtype. Long grids
    # dispatch to the blockwise Mosaic kernel: the dense path materializes
    # [B, H, S, S] probabilities in HBM, which dominates the step at S ~ 2000
    # (ops/flash_attention.py). The choice is static (S is a trace constant).
    if use_flash_attention(s):
        attn_output = flash_sdpa(q, k, v)
    else:
        attn_output = jax.nn.dot_product_attention(q, k, v)

    if cfg.gate:
        gate_scores = jax.nn.sigmoid(linear(params["gate_proj"], hidden_states))
        attn_output = attn_output * gate_scores[:, :, None, :]

    out = linear(params["out_proj"], attn_output.reshape(b, s, h * d))
    return out, v_out
