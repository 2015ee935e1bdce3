"""Euler-Maruyama reference simulator of the *true* SDE.

Parity target: reference ``core/euler_maruyama.py:11-45``. The reference runs a
Python loop issuing one kernel per step; here the whole trajectory is a single
``lax.scan`` so it compiles to one fused XLA loop on TPU, is differentiable,
and vmaps/shards over batch for free. Semantics match exactly: per step
``x += f(x,θ)·dt + L(x,θ)@ε·√dt`` with optional clamping of positive dims at
1e-6, caller-suppliable noise, ``n_steps = round(T/dt)``.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viforsdes_tpu.core.sde import SDE

Array = jax.Array


def euler_maruyama(
    sde: SDE,
    x0: Array,
    theta: Array,
    time_horizon: float,
    dt: float,
    positive_dims: Sequence[int] = (),
    noise: Array | None = None,
    *,
    key: Array | None = None,
) -> Array:
    """Simulate ``[B, n_steps+1, D]`` trajectories of the true SDE.

    Exactly one of ``noise`` (``[B, n_steps, D]`` standard normals) or ``key``
    must be provided (the reference drew implicit ``torch.randn`` when noise was
    omitted, ``core/euler_maruyama.py:28-29``; JAX makes the key explicit).
    """
    if dt <= 0:
        raise ValueError(f"dt must be positive, got {dt}")
    if time_horizon <= 0:
        raise ValueError(f"time_horizon must be positive, got {time_horizon}")
    n_steps = round(time_horizon / dt)
    sqrt_dt = dt**0.5
    batch, state_dim = x0.shape

    if noise is None:
        if key is None:
            raise ValueError("provide either `noise` or `key`")
        noise = jax.random.normal(key, (batch, n_steps, state_dim), dtype=x0.dtype)

    if positive_dims:
        pos_mask = np.zeros(state_dim, dtype=bool)
        pos_mask[list(positive_dims)] = True
        pos_mask = jnp.asarray(pos_mask)
    else:
        pos_mask = None

    def step(x: Array, eps_t: Array) -> tuple[Array, Array]:
        drift = sde.drift(x, theta)
        diffusion = sde.diffusion(x, theta)
        x_next = x + drift * dt + jnp.einsum("bij,bj->bi", diffusion, eps_t) * sqrt_dt
        if pos_mask is not None:
            x_next = jnp.where(pos_mask, jnp.maximum(x_next, 1e-6), x_next)
        return x_next, x_next

    # scan over time: noise [B, T, D] -> time-major [T, B, D]
    _, traj = jax.lax.scan(step, x0, jnp.swapaxes(noise, 0, 1))
    return jnp.concatenate([x0[:, None, :], jnp.swapaxes(traj, 0, 1)], axis=1)
