"""Exponential moving average of the params pytree.

Parity target: reference ``inference/exponential_moving_average.py:13-47``:
``shadow = shadow + (1-decay)*(param - shadow)`` per step (torch ``lerp_``),
decay 0.999. Here the EMA is just a second pytree updated functionally inside
the jitted train step — synchronization across data-parallel replicas is exact
by construction because it is computed from already-synchronized params
(fixing the reference's unsynced-EMA caveat, SURVEY §2.3).
"""

from __future__ import annotations

import jax

from viforsdes_tpu.inference.constants import DEFAULT_EMA_DECAY


def ema_init(params: dict) -> dict:
    # Fresh buffers (not aliases) so params and EMA can both be donated to the
    # jitted train step.
    return jax.tree.map(lambda p: p.copy() if hasattr(p, "copy") else p, params)


def ema_update(ema: dict, params: dict, decay: float = DEFAULT_EMA_DECAY) -> dict:
    return jax.tree.map(lambda s, p: s + (1.0 - decay) * (p - s), ema, params)
