"""Variational posterior q(theta): diagonal Gaussian in unconstrained space,
log-normal marginals for positive-constrained dims.

Parity target: reference ``models/sde_parameter_posterior.py:10-69``:
- params: ``mean`` [P], ``log_std`` [P] (init_std -> log);
- ``rsample``: reparameterized ``mean + exp(log_std)*eps``, ``exp()`` applied
  to dims in the positive mask;
- ``log_prob``: LogNormal marginals on positive dims, Normal elsewhere,
  summed over dims;
- ``expected_value``: log-normal mean ``exp(mu + sigma^2/2)`` on positive dims.

The positive mask is static (numpy) so everything traces branch-free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from viforsdes_tpu.core.priors import lognormal_log_prob, normal_log_prob

Array = jax.Array


class ThetaPosterior:
    """Static config wrapper; all methods are pure functions of ``params``."""

    def __init__(self, sde_param_dim: int, positive_dims: list[int]) -> None:
        if sde_param_dim < 1:
            raise ValueError(f"sde_param_dim must be >= 1, got {sde_param_dim}")
        if any(d < 0 or d >= sde_param_dim for d in positive_dims):
            raise ValueError(f"sde_param_positive_dims must be in [0, {sde_param_dim})")
        self.sde_param_dim = sde_param_dim
        self.positive_dims = list(positive_dims)
        mask = np.zeros(sde_param_dim, dtype=bool)
        mask[self.positive_dims] = True
        self.positive_mask = jnp.asarray(mask)

    def init(self, init_mean: Array | None = None, init_std: float = 1.0) -> dict:
        if init_std <= 0:
            raise ValueError(f"init_std must be positive, got {init_std}")
        mean = (
            jnp.asarray(init_mean, dtype=jnp.float32)
            if init_mean is not None
            else jnp.zeros(self.sde_param_dim, dtype=jnp.float32)
        )
        return {
            "mean": mean,
            "log_std": jnp.full((self.sde_param_dim,), math.log(init_std), dtype=jnp.float32),
        }

    def rsample(self, params: dict, key: Array, n: int) -> Array:
        std = jnp.exp(params["log_std"])
        eps = jax.random.normal(key, (n, self.sde_param_dim), dtype=jnp.float32)
        theta = params["mean"] + std * eps
        return jnp.where(self.positive_mask, jnp.exp(theta), theta)

    def log_prob(self, params: dict, theta: Array) -> Array:
        """``[..., P] -> [...]`` mixing LogNormal/Normal marginals per the mask."""
        mean = params["mean"]
        std = jnp.exp(params["log_std"])
        # Double-where: feed the log-normal branch a safe positive value on
        # masked-out dims so its NaNs can't leak into gradients through where.
        safe_theta = jnp.where(self.positive_mask, jnp.maximum(theta, 1e-38), 1.0)
        lp = jnp.where(
            self.positive_mask,
            lognormal_log_prob(safe_theta, mean, std),
            normal_log_prob(theta, mean, std),
        )
        return jnp.sum(lp, axis=-1)

    def expected_value(self, params: dict) -> Array:
        mean = params["mean"]
        std = jnp.exp(params["log_std"])
        return jnp.where(self.positive_mask, jnp.exp(mean + 0.5 * std * std), mean)
