"""Functional glue: encoder -> noise -> head roll-out.

Parity target: reference ``inference/diffusion_path_sampler.py:35-69``: run the
encoder over the grid, draw ``eps ~ N(0,I)`` (explicit key here; time-major
``[T, B, D]`` — the recurrence consumes it without transposes), map
``x0 -> z0``, roll the head over ``context[:, :-1]``, and wrap the result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viforsdes_tpu.core.state_space import StateSpace
from viforsdes_tpu.inference.types import DiffusionPathSample
from viforsdes_tpu.models.encoder import ObservationContextEncoder
from viforsdes_tpu.models.head import DiffusionTransitionHead

Array = jax.Array


def sample_diffusion_paths(
    encoder: ObservationContextEncoder,
    head: DiffusionTransitionHead,
    params: dict,
    obs_values: Array,
    sde_parameters: Array,
    x0: Array,
    time_step: float,
    state_space: StateSpace,
    key: Array,
    *,
    compute_dtype=jnp.bfloat16,
    sde=None,
) -> DiffusionPathSample:
    batch_size, state_dim = x0.shape

    context = encoder(
        params["encoder"], obs_values, sde_parameters, compute_dtype=compute_dtype
    )
    n_steps = context.shape[1] - 1

    # time-major: the head's recurrence consumes [T, B, D] without transposes
    noise = jax.random.normal(key, (n_steps, batch_size, state_dim), dtype=jnp.float32)
    z0 = state_space.to_latent(x0)

    paths, transition_means, transition_cholesky = head.sample_diffusion_paths(
        params["head"],
        z0,
        context[:, :-1],
        sde_parameters,
        noise,
        time_step,
        sde=sde,  # only consumed by the diffusion-matched bridge (head
        state_space=state_space,  # cholesky="matched")
    )

    return DiffusionPathSample(
        z=paths,
        transition_means=transition_means,
        transition_cholesky=transition_cholesky,
        state_space=state_space,
    )
