"""Device mesh utilities for data-parallel training.

TPU-native replacement for the reference's DDP/NCCL machinery
(``training_context.py:59-68,89-91``; ``trainer.py:128-131``; SURVEY §5.8):
a 1-D ``jax.sharding.Mesh`` over the ``"data"`` axis. The trainer keeps params
replicated and constrains the per-step Monte-Carlo batch (theta, x0, noise) to
the data axis with ``NamedSharding`` constraints inside one ``jit``-ted train
step (``inference/trainer.py``); XLA's SPMD partitioner then inserts the
gradient all-reduce over ICI automatically. Gradient sync is therefore correct
by construction — the reference's DDP wrapper was bypassed and never synced
grads (SURVEY §2.3). Equivalence of the sharded step with the single-device
step is tested on an 8-virtual-device CPU mesh (``tests/test_parallel.py``).

Semantics note: the reference treats ``batch_size`` as per-rank (effective
batch = B * world). Here ``batch_size`` is the GLOBAL batch, sharded over the
mesh — the standard JAX convention; scale B accordingly (``local_batch_size``
converts global -> per-device for capacity planning).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first ``n_devices``) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(
            f"batch_size {global_batch} must be divisible by mesh size {n}"
        )
    return global_batch // n
