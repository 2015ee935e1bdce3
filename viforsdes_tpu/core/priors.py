"""Priors over SDE parameters theta.

Parity target: reference ``core/priors.py:19-60``: scalar mean/std broadcast to
``dim`` i.i.d. marginals, Normal or LogNormal, ``log_prob`` summed over dims
(the reference's ``Independent(..., 1)``), and ``sample(n)``. Log-probs are
closed-form jnp expressions (no distribution library) so they trace cleanly.
"""

from __future__ import annotations

import math
from enum import Enum, auto

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict, field_validator

Array = jax.Array

_LOG_2PI = math.log(2.0 * math.pi)


def normal_log_prob(x: Array, mean: Array, std: Array) -> Array:
    """Elementwise log N(x; mean, std^2)."""
    z = (x - mean) / std
    return -0.5 * (z * z) - jnp.log(std) - 0.5 * _LOG_2PI


def lognormal_log_prob(x: Array, mean: Array, std: Array) -> Array:
    """Elementwise log LogNormal(x; mean, std^2) = log N(log x) - log x."""
    log_x = jnp.log(x)
    return normal_log_prob(log_x, mean, std) - log_x


class PriorType(Enum):
    NORMAL = auto()
    LOG_NORMAL = auto()


class Prior(BaseModel):
    """i.i.d. Normal/LogNormal prior over theta (ref ``core/priors.py:24-60``)."""

    model_config = ConfigDict(frozen=True)

    type: PriorType
    mean: float
    std: float
    dim: int

    @field_validator("dim")
    @classmethod
    def dim_must_be_positive(cls, v: int) -> int:
        if v <= 0:
            raise ValueError("dim must be positive")
        return v

    @field_validator("std")
    @classmethod
    def std_must_be_positive(cls, v: float) -> float:
        if v <= 0:
            raise ValueError("std must be positive")
        return v

    def sample(self, key: Array, n: int) -> Array:
        """Draw ``[n, dim]`` samples from the prior."""
        eps = jax.random.normal(key, (n, self.dim), dtype=jnp.float32)
        gauss = self.mean + self.std * eps
        if self.type == PriorType.LOG_NORMAL:
            return jnp.exp(gauss)
        return gauss

    def log_prob(self, sde_parameters: Array) -> Array:
        """Log-density summed over the parameter dimension: ``[...,dim] -> [...]``."""
        mean = jnp.float32(self.mean)
        std = jnp.float32(self.std)
        if self.type == PriorType.LOG_NORMAL:
            lp = lognormal_log_prob(sde_parameters, mean, std)
        else:
            lp = normal_log_prob(sde_parameters, mean, std)
        return jnp.sum(lp, axis=-1)
