"""Observation records and observation likelihoods.

Parity target: reference ``core/observations.py:12-74``. Validation semantics
are preserved exactly (1-D times / 2-D values, matched lengths, non-decreasing
times, positive variance, optional linear observation operator). Arrays are
``jnp`` arrays; validation runs on host at construction time via numpy so the
objects remain cheap, static pytree-leaves-friendly containers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict, field_validator, model_validator
from typing_extensions import Protocol, Self, runtime_checkable

Array = jax.Array


class Observations(BaseModel):
    """Frozen record of observation times and values (ref ``core/observations.py:12-31``).

    times:  [T_obs]           (non-decreasing)
    values: [T_obs, obs_dim]
    """

    model_config = ConfigDict(frozen=True, arbitrary_types_allowed=True)

    times: np.ndarray  # host float64: static grid metadata, never a tensor
    values: Array

    @model_validator(mode="before")
    @classmethod
    def _coerce(cls, data: dict) -> dict:
        # Accept lists / numpy inputs for ergonomics. Values become jnp fp32
        # device arrays; TIMES stay host numpy float64 — they are static grid
        # metadata (slot indices, validation), and fp32 rounding of times
        # >= 16.2 exceeds the 1e-6 grid-alignment tolerance (long-horizon
        # dense-obs configs failed validation when times were fp32).
        if isinstance(data, dict):
            if "times" in data:
                data["times"] = np.asarray(data["times"], dtype=np.float64)
            if "values" in data and not isinstance(data["values"], jax.Array):
                data["values"] = jnp.asarray(
                    np.asarray(data["values"], dtype=np.float32)
                )
        return data

    @model_validator(mode="after")
    def validate_shapes_and_order(self) -> Self:
        if self.times.ndim != 1:
            raise ValueError("times must be 1D array")
        if self.values.ndim != 2:
            raise ValueError("values must be 2D array [T_obs, obs_dim]")
        if self.times.shape[0] != self.values.shape[0]:
            raise ValueError(
                f"times and values must have same first dimension: "
                f"got {self.times.shape[0]} vs {self.values.shape[0]}"
            )
        t = np.asarray(self.times)
        if not np.all(t[1:] >= t[:-1]):
            raise ValueError("times must be sorted in non-decreasing order")
        return self


@runtime_checkable
class ObservationLikelihood(Protocol):
    """Protocol for p(y | x) terms (ref ``core/observations.py:34-36``)."""

    def log_prob(self, observations: Array, state: Array) -> Array: ...


class GaussianObservationLikelihood(BaseModel):
    """Isotropic Gaussian observation model with optional linear operator.

    Ref ``core/observations.py:39-74``: ``log N(y; Hx, var·I)`` summed over the
    observation dimension; ``obs_matrix`` H is ``[obs_dim, state_dim]`` for
    partial observation, identity otherwise.
    """

    model_config = ConfigDict(frozen=True, arbitrary_types_allowed=True)

    variance: float
    obs_matrix: Array | None = None

    @model_validator(mode="before")
    @classmethod
    def _coerce(cls, data: dict) -> dict:
        if isinstance(data, dict):
            m = data.get("obs_matrix")
            if m is not None and not isinstance(m, jax.Array):
                data["obs_matrix"] = jnp.asarray(np.asarray(m, dtype=np.float32))
        return data

    @field_validator("variance")
    @classmethod
    def validate_variance(cls, v: float) -> float:
        if v <= 0:
            raise ValueError("variance must be positive")
        return v

    def log_prob(
        self,
        observations: Array,
        state: Array,
        *,
        variance: Array | float | None = None,
    ) -> Array:
        """``variance`` overrides the configured scalar — it may be a traced
        array, which is how the trainer's learnable observation variance
        (TrainingConfig.learn_obs_variance) differentiates through this term."""
        if self.obs_matrix is not None:
            if self.obs_matrix.ndim != 2:
                raise ValueError("obs_matrix must be 2D [obs_dim, state_dim]")
            if self.obs_matrix.shape[0] != observations.shape[-1]:
                raise ValueError("obs_matrix first dim must match observations")
            if self.obs_matrix.shape[1] != state.shape[-1]:
                raise ValueError("obs_matrix second dim must match state")
            predicted = jnp.einsum("od,...d->...o", self.obs_matrix, state)
        else:
            predicted = state

        if observations.shape != predicted.shape:
            raise ValueError(
                f"observation shape {observations.shape} does not match "
                f"predicted shape {predicted.shape}"
            )

        var = self.variance if variance is None else variance
        diff = observations - predicted
        log_prob = -0.5 * (diff**2) / var - 0.5 * jnp.log(2 * math.pi * var)
        return jnp.sum(log_prob, axis=-1)
