"""SiT: stack of pre-norm transformer blocks with adaLN-Zero conditioning and
value-residual plumbing.

Parity target: reference ``primitives/sit.py:16-186``:
- per block, 2 cond branches (attn, mlp), each ``(scale, shift, gate)``;
- residual update ``x + gate * f((1+scale)*norm(x) + shift)`` with non-affine
  LayerNorm (``sit.py:30-31``);
- value-residual: block 0 exports its value state ``v0``; blocks >0 mix
  ``lam*v + (1-lam)*v0`` inside attention (``sit.py:144-145,171-184``);
- input/output linear projections around the block stack.

Blocks are unrolled in Python (depth is small, 4-8); XLA fuses each block into
a handful of MXU matmuls + VPU epilogues.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from viforsdes_tpu.ops.attention import AttentionConfig, attention, attention_init
from viforsdes_tpu.ops.cond import cond_modulator, cond_modulator_init
from viforsdes_tpu.ops.embeddings import RotaryTables
from viforsdes_tpu.ops.initializers import (
    DEFAULT_INIT_POLICY,
    InitPolicy,
    linear,
    linear_init,
)
from viforsdes_tpu.ops.mlp import swiglu, swiglu_init
from viforsdes_tpu.ops.norms import layer_norm

Array = jax.Array


class SiTConfig(NamedTuple):
    in_dim: int
    hidden_dim: int
    out_dim: int
    cond_dim: int
    num_heads: int
    depth: int
    mlp_hidden_dim: int
    bias: bool = True
    attn_gate: bool = True
    attn_residual_v: bool = True
    use_qk_norm: bool = True
    qk_norm_eps: float = 1e-6
    norm_eps: float = 1e-5

    def block_attention_config(self, idx: int) -> AttentionConfig:
        return AttentionConfig(
            embed_dim=self.hidden_dim,
            num_heads=self.num_heads,
            qk_norm=self.use_qk_norm,
            qk_norm_eps=self.qk_norm_eps,
            bias=self.bias,
            gate=self.attn_gate,
            # Block 0 exports v0 but does not mix (ref ``sit.py:144-145``).
            residual_v=self.attn_residual_v and idx > 0,
        )


def sit_block_init(
    key: Array, cfg: SiTConfig, idx: int, *, policy: InitPolicy = DEFAULT_INIT_POLICY
) -> dict:
    k_cond, k_attn, k_mlp = jax.random.split(key, 3)
    return {
        "cond": cond_modulator_init(k_cond, cfg.cond_dim, cfg.hidden_dim, branches=2),
        "attn": attention_init(k_attn, cfg.block_attention_config(idx), policy=policy),
        "mlp": swiglu_init(
            k_mlp,
            cfg.hidden_dim,
            cfg.mlp_hidden_dim,
            bias=cfg.bias,
            w_init_in=policy.mlp_in,
            w_init_out=policy.mlp_out,
        ),
    }


def sit_block(
    params: dict,
    cfg: SiTConfig,
    idx: int,
    hidden_states: Array,
    *,
    cond: Array,
    rotary: RotaryTables | None = None,
    v0: Array | None = None,
    real_len: int | None = None,
) -> tuple[Array, Array]:
    """One SiT block: ``([B,S,H], cond [B,S,C] or [B,C]) -> ([B,S,H], value_state)``.

    When cond is ``[B, C]`` (constant over the sequence — the encoder's case,
    theta is per-sample not per-token), the modulator runs once per sample and
    its (scale, shift, gate) broadcast over tokens: a [B,C]@[C,6H] matmul
    instead of [B*S,C]@[C,6H], cutting ~45% of encoder FLOPs vs the
    reference's repeat-then-project (ref ``encoder.py:84``, ``sit.py:91``).
    """
    attn_branch, mlp_branch = cond_modulator(params["cond"], cond, branches=2)
    if cond.ndim == 2:
        expand = lambda br: type(br)(*(jnp.expand_dims(f, 1) for f in br))
        attn_branch, mlp_branch = expand(attn_branch), expand(mlp_branch)

    normed = layer_norm(hidden_states, eps=cfg.norm_eps)
    modulated = attn_branch.affine(normed)
    attn_out, value_state = attention(
        params["attn"],
        cfg.block_attention_config(idx),
        modulated,
        rotary=rotary,
        v0=v0,
        real_len=real_len,
    )
    hidden_states = hidden_states + attn_branch.gate(attn_out)

    normed = layer_norm(hidden_states, eps=cfg.norm_eps)
    modulated = mlp_branch.affine(normed)
    hidden_states = hidden_states + mlp_branch.gate(swiglu(params["mlp"], modulated))
    return hidden_states, value_state


def sit_init(key: Array, cfg: SiTConfig, *, policy: InitPolicy = DEFAULT_INIT_POLICY) -> dict:
    keys = jax.random.split(key, cfg.depth + 2)
    return {
        "input_proj": linear_init(keys[0], cfg.in_dim, cfg.hidden_dim, bias=cfg.bias, w_init=policy.linear),
        "output_proj": linear_init(keys[1], cfg.hidden_dim, cfg.out_dim, bias=cfg.bias, w_init=policy.linear),
        "blocks": [sit_block_init(keys[2 + i], cfg, i, policy=policy) for i in range(cfg.depth)],
    }


# Above this grid length, blocks are rematerialized: full-attention backward
# stores O(S^2) probabilities per block, which at S ~ 2000 exceeds HBM
# (8 blocks x [B, H, S, S] fp32). Remat trades one extra block forward for
# holding at most ONE block's attention residuals at a time.
#
# When flash attention handles the long grid, remat is skipped: the blockwise
# backward already recomputes attention internally and never materializes the
# probabilities, and the remaining per-block activations are O(S) (fit HBM),
# so whole-block remat would only re-run QKV/MLP forwards for nothing
# (measured part of the dense path's 293 ms vs flash 227 ms encoder fwd+bwd).
REMAT_SEQ_THRESHOLD = 512


def sit(
    params: dict,
    cfg: SiTConfig,
    x: Array,
    *,
    cond: Array,
    rotary: RotaryTables | None = None,
    remat: bool | None = None,
    real_len: int | None = None,
) -> Array:
    """``[B, S, in_dim] -> [B, S, out_dim]`` (ref ``sit.py:162-186``).

    ``real_len``: the hoisted-padding token stream (round 5) — S is padded to
    the flash block multiple once at the encoder and only the first
    ``real_len`` tokens are real. Attention isolates the pad tokens; every
    other op is token-local, so no masking is needed between blocks (pad rows
    carry zero cotangent from the encoder's final slice)."""
    if remat is None:
        from viforsdes_tpu.ops.flash_attention import use_flash_attention

        remat = x.shape[1] > REMAT_SEQ_THRESHOLD and not use_flash_attention(
            x.shape[1]
        )
    tokens = linear(params["input_proj"], x)
    cached_v: Array | None = None
    for idx, block_params in enumerate(params["blocks"]):
        def block_fn(bp, tokens_, cond_, v0_, idx=idx):
            return sit_block(
                bp, cfg, idx, tokens_, cond=cond_, rotary=rotary, v0=v0_,
                real_len=real_len,
            )

        if remat:
            block_fn = jax.checkpoint(block_fn)
        tokens, block_value = block_fn(block_params, tokens, cond, cached_v)
        if cached_v is None:
            cached_v = block_value
    return linear(params["output_proj"], tokens)
