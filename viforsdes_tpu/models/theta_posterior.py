"""Variational posterior q(theta): Gaussian in unconstrained space (diagonal
by default, optionally full-covariance), log-normal marginals for
positive-constrained dims.

Parity target: reference ``models/sde_parameter_posterior.py:10-69``:
- params: ``mean`` [P], ``log_std`` [P] (init_std -> log);
- ``rsample``: reparameterized ``mean + exp(log_std)*eps``, ``exp()`` applied
  to dims in the positive mask;
- ``log_prob``: LogNormal marginals on positive dims, Normal elsewhere,
  summed over dims;
- ``expected_value``: log-normal mean ``exp(mu + sigma^2/2)`` on positive dims.

Beyond parity: ``full_covariance=True`` adds a strictly-lower-triangular
coupling (zero-init, so it starts at exact diagonal parity) making q(theta) a
full-covariance Gaussian in the unconstrained space — the reference's
mean-field family cannot represent the parameter correlations that chaotic
systems' posteriors carry (Lorenz-63 ladder, BASELINE.md), which is one
driver of its overconfident marginal CIs.

The positive mask is static (numpy) so everything traces branch-free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from viforsdes_tpu.core.priors import lognormal_log_prob, normal_log_prob

Array = jax.Array

_LOG_2PI = math.log(2.0 * math.pi)


class ThetaPosterior:
    """Static config wrapper; all methods are pure functions of ``params``."""

    def __init__(
        self,
        sde_param_dim: int,
        positive_dims: list[int],
        *,
        full_covariance: bool = False,
    ) -> None:
        if sde_param_dim < 1:
            raise ValueError(f"sde_param_dim must be >= 1, got {sde_param_dim}")
        if any(d < 0 or d >= sde_param_dim for d in positive_dims):
            raise ValueError(f"sde_param_positive_dims must be in [0, {sde_param_dim})")
        self.sde_param_dim = sde_param_dim
        self.positive_dims = list(positive_dims)
        self.full_covariance = bool(full_covariance)
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
        params = {
            "mean": mean,
            "log_std": jnp.full((self.sde_param_dim,), math.log(init_std), dtype=jnp.float32),
        }
        if self.full_covariance:
            # strictly-lower coupling, zero-init: starts at diagonal parity
            params["tril"] = jnp.zeros(
                (self.sde_param_dim, self.sde_param_dim), dtype=jnp.float32
            )
        return params

    def _scale_tril(self, params: dict) -> Array:
        """Cholesky factor of the unconstrained-space covariance: positive
        diagonal from ``log_std``, free strictly-lower entries from ``tril``."""
        L = jnp.diag(jnp.exp(params["log_std"]))
        if self.full_covariance:
            L = L + jnp.tril(params["tril"], k=-1)
        return L

    def rsample(self, params: dict, key: Array, n: int) -> Array:
        eps = jax.random.normal(key, (n, self.sde_param_dim), dtype=jnp.float32)
        if self.full_covariance:
            z = params["mean"] + eps @ self._scale_tril(params).T
        else:
            z = params["mean"] + jnp.exp(params["log_std"]) * eps
        return jnp.where(self.positive_mask, jnp.exp(z), z)

    def log_prob(self, params: dict, theta: Array) -> Array:
        """``[..., P] -> [...]``: density of theta under the (optionally
        correlated) Gaussian in unconstrained space, with the exp-transform
        Jacobian on positive dims (diagonal case == independent
        LogNormal/Normal marginals)."""
        mean = params["mean"]
        # Double-where: feed the log a safe positive value on masked-out dims
        # so its NaNs can't leak into gradients through where.
        safe_theta = jnp.where(self.positive_mask, jnp.maximum(theta, 1e-38), 1.0)
        if not self.full_covariance:
            std = jnp.exp(params["log_std"])
            lp = jnp.where(
                self.positive_mask,
                lognormal_log_prob(safe_theta, mean, std),
                normal_log_prob(theta, mean, std),
            )
            return jnp.sum(lp, axis=-1)
        log_theta = jnp.log(safe_theta)
        z = jnp.where(self.positive_mask, log_theta, theta)
        L = self._scale_tril(params)
        y = jax.lax.linalg.triangular_solve(
            jnp.broadcast_to(L, z.shape[:-1] + L.shape),
            (z - mean)[..., None],
            left_side=True,
            lower=True,
        )[..., 0]
        log_det = jnp.sum(params["log_std"])
        mvn = (
            -0.5 * jnp.sum(y * y, axis=-1)
            - log_det
            - 0.5 * self.sde_param_dim * _LOG_2PI
        )
        jacobian = jnp.sum(jnp.where(self.positive_mask, log_theta, 0.0), axis=-1)
        return mvn - jacobian

    def expected_value(self, params: dict) -> Array:
        mean = params["mean"]
        if self.full_covariance:
            L = self._scale_tril(params)
            var = jnp.sum(L * L, axis=-1)  # diag of L L^T
        else:
            std = jnp.exp(params["log_std"])
            var = std * std
        return jnp.where(self.positive_mask, jnp.exp(mean + 0.5 * var), mean)
