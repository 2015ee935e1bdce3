"""adaLN-Zero conditioning (ref ``primitives/cond.py:11-72``).

``CondModulator``: ``SiLU -> Linear(cond_dim, 3*branches*hidden)`` with the
linear ZERO-initialized (adaLN-Zero), chunked into per-branch
``(scale, shift, gate)``. Branch application: ``affine(t) = (1+scale)*t+shift``
and ``gate(t) = t*gate_value``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from viforsdes_tpu.ops.initializers import linear, linear_init, zeros_init

Array = jax.Array


class CondBranch(NamedTuple):
    scale: Array
    shift: Array
    gate_value: Array

    def affine(self, tensor: Array) -> Array:
        return (1 + self.scale) * tensor + self.shift

    def gate(self, tensor: Array) -> Array:
        return tensor * self.gate_value


def cond_modulator_init(key: Array, cond_dim: int, hidden_dim: int, *, branches: int = 1) -> dict:
    if branches <= 0:
        raise ValueError("branches must be positive")
    return {
        "net": linear_init(key, cond_dim, hidden_dim * 3 * branches, bias=True, w_init=zeros_init),
    }


def cond_modulator(params: dict, cond: Array, *, branches: int) -> tuple[CondBranch, ...]:
    updates = linear(params["net"], jax.nn.silu(cond))
    chunks = jax.numpy.split(updates, 3 * branches, axis=-1)
    return tuple(
        CondBranch(scale=chunks[i * 3], shift=chunks[i * 3 + 1], gate_value=chunks[i * 3 + 2])
        for i in range(branches)
    )
