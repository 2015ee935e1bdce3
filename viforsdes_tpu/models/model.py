"""Model container: encoder + transition head + theta posterior.

Parity target: reference ``models/variational_sde_posterior.py:11-36`` with the
same wiring (``context_dim = encoder.hidden_dim``). Static configuration lives
in this object; all learnable state lives in the params pytree
``{"encoder": ..., "head": ..., "theta": ...}``.
"""

from __future__ import annotations

import numpy as np
import jax

from viforsdes_tpu.config import EncoderConfig, HeadConfig
from viforsdes_tpu.models.encoder import ObservationContextEncoder
from viforsdes_tpu.models.head import DiffusionTransitionHead
from viforsdes_tpu.models.theta_posterior import ThetaPosterior

Array = jax.Array


class VariationalSDEPosterior:
    def __init__(
        self,
        observation_dim: int,
        state_dim: int,
        sde_param_dim: int,
        encoder_config: EncoderConfig,
        head_config: HeadConfig,
        sde_param_positive_dims: list[int],
        *,
        obs_times: np.ndarray,
        time_horizon: float,
        time_step: float,
        theta_full_covariance: bool = False,
    ) -> None:
        self.encoder = ObservationContextEncoder.build(
            observation_dim,
            sde_param_dim,
            encoder_config,
            obs_times=obs_times,
            time_horizon=time_horizon,
            time_step=time_step,
        )
        self.head = DiffusionTransitionHead(
            state_dim=state_dim,
            context_dim=encoder_config.hidden_dim,
            sde_param_dim=sde_param_dim,
            config=head_config,
        )
        self.theta_posterior = ThetaPosterior(
            sde_param_dim,
            sde_param_positive_dims,
            full_covariance=theta_full_covariance,
        )

    def init(
        self,
        key: Array,
        *,
        sde_param_init_mean: Array | None = None,
        sde_param_init_std: float = 1.0,
    ) -> dict:
        k_enc, k_head = jax.random.split(key)
        return {
            "encoder": self.encoder.init(k_enc),
            "head": self.head.init(k_head),
            "theta": self.theta_posterior.init(
                init_mean=sde_param_init_mean, init_std=sde_param_init_std
            ),
        }
