"""Weight-init policy.

Parity target: reference ``primitives/initializer.py:10-45``: truncated-normal
(std 0.02) for transformer linears with zero bias, and a zero-init helper used
for adaLN-Zero and attention gates. Weights are stored ``[in, out]`` (JAX
convention: ``y = x @ W + b``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

TRUNC_STD = 0.02

Initializer = Callable[[Array, tuple[int, ...]], Array]


def trunc_normal_init(key: Array, shape: tuple[int, ...], std: float = TRUNC_STD) -> Array:
    """N(0, std^2) truncated at +/-2 std (ref ``initializer.py:25-27``)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype=jnp.float32)


def zeros_init(key: Array, shape: tuple[int, ...]) -> Array:
    del key
    return jnp.zeros(shape, dtype=jnp.float32)


def fan_in_uniform_init(key: Array, shape: tuple[int, ...]) -> Array:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Matches the default init of the reference's plain ``nn.Linear``/``nn.GRU``
    sites (obs/theta projections, GRU weights) that bypass the transformer
    InitPolicy. ``shape`` is ``[in, out]`` so fan_in = shape[0].
    """
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def fan_in_uniform_linear_init(key: Array, in_dim: int, out_dim: int, *, bias: bool = True) -> dict:
    """Linear with torch-default weight AND bias init (both U(+-1/sqrt(fan_in)))."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / (in_dim**0.5)
    params = {"w": jax.random.uniform(k_w, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        params["b"] = jax.random.uniform(k_b, (out_dim,), jnp.float32, -bound, bound)
    return params


def linear_init(
    key: Array,
    in_dim: int,
    out_dim: int,
    *,
    bias: bool = True,
    w_init: Initializer = trunc_normal_init,
) -> dict:
    """Linear layer params: ``{"w": [in, out], "b": [out]?}``; bias zero-init."""
    params = {"w": w_init(key, (in_dim, out_dim))}
    if bias:
        params["b"] = jnp.zeros((out_dim,), dtype=jnp.float32)
    return params


def linear(params: dict, x: Array) -> Array:
    """Apply a linear layer in the dtype of ``x`` (params cast on use)."""
    w = params["w"].astype(x.dtype)
    y = x @ w
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


@dataclass(frozen=True)
class InitPolicy:
    """Pluggable per-site init (ref ``initializer.py:36-45``)."""

    attn_in: Initializer = trunc_normal_init
    attn_out: Initializer = trunc_normal_init
    mlp_in: Initializer = trunc_normal_init
    mlp_out: Initializer = trunc_normal_init
    linear: Initializer = trunc_normal_init


DEFAULT_INIT_POLICY = InitPolicy()
