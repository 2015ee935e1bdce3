"""Lower-bound clamp with straight-through-style gradient.

Parity target: reference ``primitives/bounds.py:10-31`` (``LowerBoundFunction``)
whose gradient rule is also duplicated inside the reference Triton backward
kernel (``kernels/backward.py:331-334``). Forward is ``max(x, bound)``; the
backward passes the gradient iff ``x >= bound`` OR ``grad < 0`` — letting the
optimizer push a clamped value back above the bound but not further below it.

Implemented once as a ``jax.custom_vjp`` and shared by BOTH the ``lax.scan``
sampler and the fused Pallas sampler so optimization dynamics near the
``DIAG_MIN`` boundary are identical across code paths (SURVEY §7.3 item 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _lower_bound(x: Array, bound: float) -> Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x: Array, bound: float) -> tuple[Array, Array]:
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound: float, x: Array, g: Array) -> tuple[Array]:
    return (lower_bound_grad_mask(x, bound, g),)


_lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def lower_bound(x: Array, bound: float) -> Array:
    """``max(x, bound)`` with the reference's asymmetric pass-through gradient."""
    return _lower_bound(x, float(bound))


def lower_bound_grad_mask(x: Array, bound, g: Array) -> Array:
    """The raw backward rule, exposed for kernel implementations and tests."""
    return jnp.where((x >= bound) | (g < 0), g, jnp.zeros_like(g))
