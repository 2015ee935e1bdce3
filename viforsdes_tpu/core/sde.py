"""SDE interface: user-supplied drift/diffusion functions.

Parity target: reference ``core/sde.py:9-48`` (SDE protocol, FunctionalSDE,
make_sde). The TPU-native contract differs only in array library: ``drift`` and
``diffusion`` must be pure, jax-traceable functions of ``jnp`` arrays so they
can run under ``jit``/``vmap``/``grad`` — no Python side effects, no
data-dependent control flow.

Shapes (batched over arbitrary leading dims):
  drift(x[..., D], theta[..., P])      -> [..., D]
  diffusion(x[..., D], theta[..., P])  -> [..., D, D]  (lower Cholesky factor)
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import jax

Array = jax.Array


@runtime_checkable
class SDE(Protocol):
    """Structural interface for a user-defined SDE (ref ``core/sde.py:9-14``)."""

    state_dim: int
    sde_param_dim: int

    def drift(self, x: Array, sde_parameters: Array) -> Array: ...

    def diffusion(self, x: Array, sde_parameters: Array) -> Array: ...


class FunctionalSDE:
    """Lambda-style SDE construction (ref ``core/sde.py:17-34``)."""

    def __init__(
        self,
        drift_fn: Callable[[Array, Array], Array],
        diffusion_fn: Callable[[Array, Array], Array],
        state_dim: int,
        sde_param_dim: int,
    ) -> None:
        self._drift_fn = drift_fn
        self._diffusion_fn = diffusion_fn
        self.state_dim = state_dim
        self.sde_param_dim = sde_param_dim

    def drift(self, x: Array, sde_parameters: Array) -> Array:
        return self._drift_fn(x, sde_parameters)

    def diffusion(self, x: Array, sde_parameters: Array) -> Array:
        return self._diffusion_fn(x, sde_parameters)


def make_sde(
    drift: Callable[[Array, Array], Array],
    diffusion: Callable[[Array, Array], Array],
    state_dim: int,
    sde_param_dim: int,
) -> SDE:
    """Build an SDE from plain functions (ref ``core/sde.py:37-48``)."""
    return FunctionalSDE(
        drift_fn=drift,
        diffusion_fn=diffusion,
        state_dim=state_dim,
        sde_param_dim=sde_param_dim,
    )
