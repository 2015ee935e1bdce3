"""Observation context encoder: SiT over the dense time grid.

Parity target: reference ``models/encoder.py:16-99``:
- a dense grid of ``n_steps+1`` learned ``bridge_token`` slots;
- observed slots overwritten by ``obs_proj(values)`` (``encoder.py:75-78``);
- sinusoidal time embedding added (``:80-81``);
- theta -> cond vector via a 3-layer SiLU MLP (``:34-40``);
- RoPE tables precomputed (to max(2048, n_steps), the reference regrows lazily
  at ``:88-95`` — here the grid length is static so we size once at build);
- SiT transformer over the grid, conditioned per-token on theta.

TPU-first differences:
- observation slot indices are computed **statically** at build time (numpy),
  so the scatter is a static-index ``.at[].set`` that lowers to a cheap XLA
  dynamic-update-slice, not a gather/scatter with traced indices;
- the grid assembly (bridge token + obs overwrite + time embedding) is
  batch-independent, computed once ``[T, H]`` and broadcast, exactly like the
  reference;
- activations are cast to ``compute_dtype`` (bf16 by default) at the SiT
  boundary, replacing torch autocast.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from viforsdes_tpu.config import EncoderConfig
from viforsdes_tpu.ops.embeddings import RotaryTables, precompute_rope, sinusoidal_embedding
from viforsdes_tpu.ops.flash_attention import _FLASH_BLOCK, use_flash_attention
from viforsdes_tpu.ops.initializers import fan_in_uniform_linear_init, linear
from viforsdes_tpu.ops.sit import SiTConfig, sit, sit_init

Array = jax.Array

_ROPE_MIN_LEN = 2048  # ref encoder.py:42-44


class ObservationContextEncoder:
    """Static-config encoder; params live in an explicit pytree."""

    def __init__(
        self,
        observation_dim: int,
        sde_param_dim: int,
        config: EncoderConfig,
        *,
        n_grid: int,
        obs_slot_indices: np.ndarray,
        grid_times: np.ndarray,
    ) -> None:
        self.observation_dim = observation_dim
        self.sde_param_dim = sde_param_dim
        self.config = config
        self.hidden_dim = config.hidden_dim
        self.n_grid = n_grid
        self.obs_slot_indices = np.asarray(obs_slot_indices, dtype=np.int64)
        self.grid_times = jnp.asarray(grid_times, dtype=jnp.float32)
        self.sit_config = SiTConfig(
            in_dim=config.hidden_dim,
            hidden_dim=config.hidden_dim,
            out_dim=config.hidden_dim,
            cond_dim=config.cond_dim,
            num_heads=config.num_heads,
            depth=config.depth,
            mlp_hidden_dim=int(config.hidden_dim * config.mlp_ratio),
        )
        # Padded-grid fast path (S=101 -> 128 tile-exact tokens + static key
        # mask) was built and measured round 4 and LOSES end-to-end: 11.80 vs
        # 10.28 ms/step at the OU headline (profile_dense_variants.py,
        # interleaved; BASELINE.md) — the +27% M-rows it adds to every
        # QKV/MLP matmul cost more than the unaligned-tile copies it removes,
        # so the grid stays at its natural length.
        # Rotary tables cover the hoisted-padding length too (both RoPE paths
        # slice to the actual sequence internally).
        self._padded_grid = n_grid + (-n_grid) % _FLASH_BLOCK
        self.rotary: RotaryTables = precompute_rope(
            config.hidden_dim // config.num_heads,
            end=max(_ROPE_MIN_LEN, self._padded_grid),
        ).slice_to(self._padded_grid)

    @classmethod
    def build(
        cls,
        observation_dim: int,
        sde_param_dim: int,
        config: EncoderConfig,
        *,
        obs_times: np.ndarray,
        time_horizon: float,
        time_step: float,
    ) -> "ObservationContextEncoder":
        """Resolve the static time grid and observation slots (ref ``encoder.py:71-78``)."""
        n_grid = int(round(time_horizon / time_step)) + 1
        grid_times = np.linspace(0.0, time_horizon, n_grid)
        obs_slots = np.clip(
            np.round(np.asarray(obs_times) / time_step).astype(np.int64), 0, n_grid - 1
        )
        return cls(
            observation_dim,
            sde_param_dim,
            config,
            n_grid=n_grid,
            obs_slot_indices=obs_slots,
            grid_times=grid_times,
        )

    def init(self, key: Array) -> dict:
        k_obs, k_tok, k1, k2, k3, k_sit = jax.random.split(key, 6)
        cfg = self.config
        return {
            "obs_proj": fan_in_uniform_linear_init(k_obs, self.observation_dim, cfg.hidden_dim),
            "bridge_token": jax.random.normal(k_tok, (cfg.hidden_dim,), dtype=jnp.float32),
            "sde_param_proj": [
                fan_in_uniform_linear_init(k1, self.sde_param_dim, cfg.cond_dim),
                fan_in_uniform_linear_init(k2, cfg.cond_dim, cfg.cond_dim),
                fan_in_uniform_linear_init(k3, cfg.cond_dim, cfg.cond_dim),
            ],
            "sit": sit_init(k_sit, self.sit_config),
        }

    def _cond(self, params: dict, sde_parameters: Array) -> Array:
        """3-layer SiLU MLP theta -> cond (ref ``encoder.py:34-40``)."""
        l1, l2, l3 = params["sde_param_proj"]
        h = jax.nn.silu(linear(l1, sde_parameters))
        h = jax.nn.silu(linear(l2, h))
        return linear(l3, h)

    def _hoist_pad(self) -> int:
        """Hoisted-padding decision (round 5): when the flash path is active
        and the grid is not a block multiple, pad the token stream ONCE here
        (to ``_padded_grid``) instead of letting ``flash_sdpa`` pad q/k/v
        around every kernel call. The round-5 Lorenz trace bills that
        per-layer churn at ~8 ms/step (pad 5.2 + slice 2.9,
        trace_lorenz_r5.json); the hoist trades it for +2.3% matmul rows at
        S=2001→2048 (the round-4 OU pad-grid loss was at S=101→128 = +27%
        rows — a different regime). ``VIFORSDES_PAD_HOIST=0`` disables;
        ``=force`` enables off-TPU (CPU equivalence tests)."""
        mode = os.environ.get("VIFORSDES_PAD_HOIST", "1")
        if mode == "0" or self._padded_grid == self.n_grid:
            return 0
        if mode == "force" or use_flash_attention(self.n_grid):
            return self._padded_grid - self.n_grid
        return 0

    def __call__(
        self,
        params: dict,
        obs_values: Array,
        sde_parameters: Array,
        *,
        compute_dtype=jnp.bfloat16,
    ) -> Array:
        """``(obs [T_obs, O], theta [B, P]) -> context [B, n_grid, H]`` fp32."""
        batch = sde_parameters.shape[0]

        h = jnp.broadcast_to(params["bridge_token"], (self.n_grid, self.hidden_dim))
        obs_tokens = linear(params["obs_proj"], obs_values)
        h = h.at[self.obs_slot_indices].set(obs_tokens)
        h = h + sinusoidal_embedding(self.grid_times, self.hidden_dim)

        # Hoisted padding: pad the BATCH-INDEPENDENT [T, H] template (1 MB at
        # the Lorenz shape) to the flash block multiple, so no per-layer
        # q/k/v pad/slice pairs appear inside the SiT stack.
        pad = self._hoist_pad()
        if pad:
            h = jnp.pad(h, ((0, pad), (0, 0)))
        s_tokens = self.n_grid + pad

        h = jnp.broadcast_to(h[None], (batch, s_tokens, self.hidden_dim))

        # cond stays [B, C]: it is constant over the grid, so the SiT blocks
        # run the adaLN projection once per sample and broadcast over tokens.
        cond = self._cond(params, sde_parameters)

        context = sit(
            params["sit"],
            self.sit_config,
            h.astype(compute_dtype),
            cond=cond.astype(compute_dtype),
            rotary=self.rotary,
            real_len=self.n_grid if pad else None,
        )
        if pad:
            context = context[:, : self.n_grid]
        return context.astype(jnp.float32)
