"""SwiGLU MLP (ref ``primitives/mlp.py:10-54``).

``Linear(in, 2h) -> silu(left) * right -> Linear(h, in)``. The even-split
check of ``SwiGLUActivation`` is enforced at init time (widths are static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viforsdes_tpu.ops.initializers import Initializer, linear, linear_init, trunc_normal_init

Array = jax.Array


def swiglu_init(
    key: Array,
    in_dim: int,
    hidden_dim: int,
    *,
    bias: bool = True,
    w_init_in: Initializer = trunc_normal_init,
    w_init_out: Initializer = trunc_normal_init,
) -> dict:
    k_in, k_out = jax.random.split(key)
    return {
        "input_proj": linear_init(k_in, in_dim, 2 * hidden_dim, bias=bias, w_init=w_init_in),
        "output_proj": linear_init(k_out, hidden_dim, in_dim, bias=bias, w_init=w_init_out),
    }


def swiglu(params: dict, x: Array) -> Array:
    hidden = linear(params["input_proj"], x)
    left, right = jnp.split(hidden, 2, axis=-1)
    gated = jax.nn.silu(left) * right
    return linear(params["output_proj"], gated)
