"""Result containers for the inference pipeline (ref ``inference/types.py``).

``EvidenceLowerBoundComponents``/``Result`` are NamedTuples of arrays so they
cross the jit boundary as pytrees. ``DiffusionPathSample`` is used inside
traced code only (it carries the non-array ``StateSpace``).

No ``from __future__ import annotations`` here on purpose: the NamedTuple
field annotations must be REAL classes, not strings — the typing tier
(tools/typecheck.py) checks NamedTuple returns field-by-field, and a string
annotation is resolved in the CALLER's module globals, where e.g.
``EvidenceLowerBoundComponents`` need not be imported (trainer.py returns
``EvidenceLowerBoundResult`` without importing the components type).
"""

from dataclasses import dataclass
from typing import NamedTuple, TYPE_CHECKING

import jax

if TYPE_CHECKING:
    from viforsdes_tpu.core.state_space import StateSpace

Array = jax.Array


@dataclass(frozen=True)
class DiffusionPathSample:
    """A batch of sampled latent paths plus their transition parameters.

    z: [B, T+1, D] latent paths; transition_means/cholesky: [B, T, D]/[B, T, D, D].
    (ref ``inference/types.py:12-24``)
    """

    z: Array
    transition_means: Array
    transition_cholesky: Array
    state_space: "StateSpace"

    @property
    def x(self) -> Array:
        return self.state_space.to_state(self.z)

    def log_jacobian(self) -> Array:
        """Sum over time of per-step log-Jacobians of z->x (ref ``types.py:23-24``)."""
        return self.state_space.log_jacobian(self.z[:, 1:]).sum(axis=-1)


class EvidenceLowerBoundComponents(NamedTuple):
    observation_log_prob: Array
    sde_log_prob: Array
    generative_log_prob: Array
    prior_log_prob: Array
    posterior_log_prob: Array


class EvidenceLowerBoundResult(NamedTuple):
    evidence_lower_bound: Array
    components: EvidenceLowerBoundComponents
