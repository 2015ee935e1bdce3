"""Bijection between constrained state x and unconstrained latent z.

Parity target: reference ``inference/state_space.py:8-38``: for dims marked
positive, ``to_state`` is softplus, ``to_latent`` its inverse
``x + log(-expm1(-x))`` (input clamped at 1e-6), and ``log_jacobian(z)`` is
``logsigmoid(z)`` summed over the positive dims; identity elsewhere. The mask
is a static numpy bool vector so all three maps are branch-free ``jnp.where``
expressions that fuse under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class StateSpace:
    def __init__(self, dim: int, positive_dims: list[int] | None = None) -> None:
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        resolved = list(positive_dims or [])
        if any(d < 0 or d >= dim for d in resolved):
            raise ValueError(f"positive_dims must be in [0, {dim}), got {resolved}")
        if len(resolved) != len(set(resolved)):
            raise ValueError(f"positive_dims must be unique, got {resolved}")
        self.dim = dim
        self.positive_dims = resolved
        mask = np.zeros(dim, dtype=bool)
        mask[resolved] = True
        self._mask = jnp.asarray(mask)
        self._any = bool(mask.any())

    def to_state(self, z: Array) -> Array:
        if not self._any:
            return z
        return jnp.where(self._mask, jax.nn.softplus(z), z)

    def to_latent(self, x: Array) -> Array:
        if not self._any:
            return x
        x_pos = jnp.maximum(x, 1e-6)
        inv = x_pos + jnp.log(-jnp.expm1(-x_pos))
        return jnp.where(self._mask, inv, x)

    def log_jacobian(self, z: Array) -> Array:
        """log|d softplus(z)/dz| summed over positive dims: ``[...,D] -> [...]``."""
        if not self._any:
            return jnp.zeros(z.shape[:-1], dtype=z.dtype)
        return jnp.sum(jnp.where(self._mask, jax.nn.log_sigmoid(z), 0.0), axis=-1)

    def latent_jacobian_diag(self, z: Array) -> Array:
        """Per-dim ``dz/dx`` evaluated at ``x = to_state(z)``: ``[...,D] -> [...,D]``.

        The bijection is elementwise, so its Jacobian is diagonal:
        ``1/sigmoid(z)`` on positive dims (inverse of ``d softplus/dz``),
        1 elsewhere. Used by the diffusion-matched bridge (head
        ``cholesky="matched"``) to map the SDE's state-space diffusion
        Cholesky into latent space: ``L_z = diag(dz/dx) @ L_x``.
        """
        if not self._any:
            return jnp.ones_like(z)
        return jnp.where(self._mask, 1.0 / jax.nn.sigmoid(z), 1.0)
