"""SIR epidemic SDE with PARTIAL observation (BASELINE.md config 4): only the
infected count I is observed; susceptible S is latent. Log-normal theta
posterior over (beta, gamma).

Chemical-Langevin SIR (S, I), recovered pool implicit:
  dS = -beta S I / N dt + noise
  dI = (beta S I / N - gamma I) dt + noise
with the 2x2 Cholesky of the reaction-noise covariance.

This exercises two capabilities beyond the reference examples:
- ``obs_matrix`` partial observation (H = [[0, 1]]),
- explicit ``x0`` (the reference hard-wires x0 = values[0], impossible when
  obs_dim != state_dim; SURVEY C34 / training_context.py:107-117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import viforsdes_tpu as vt

POPULATION = 1000.0


class SIR:
    state_dim = 2  # (S, I)
    sde_param_dim = 2  # (beta, gamma)

    def drift(self, x: jax.Array, p: jax.Array) -> jax.Array:
        s, i = x[..., 0], x[..., 1]
        beta, gamma = p[..., 0], p[..., 1]
        infection = beta * s * i / POPULATION
        recovery = gamma * i
        return jnp.stack([-infection, infection - recovery], axis=-1)

    def diffusion(self, x: jax.Array, p: jax.Array) -> jax.Array:
        s, i = x[..., 0], x[..., 1]
        beta, gamma = p[..., 0], p[..., 1]
        a = jnp.maximum(beta * s * i / POPULATION, 1e-6)  # infection reaction rate
        b = jnp.maximum(gamma * i, 1e-6)  # recovery reaction rate
        # Cov = [[a, -a], [-a, a+b]]; closed-form Cholesky:
        l00 = jnp.sqrt(a)
        l10 = -jnp.sqrt(a)
        l11 = jnp.sqrt(b)
        zeros = jnp.zeros_like(a)
        row0 = jnp.stack([l00, zeros], axis=-1)
        row1 = jnp.stack([l10, l11], axis=-1)
        return jnp.stack([row0, row1], axis=-2)


def main() -> None:
    console = vt.Console()
    param_names = ["β", "γ"]

    # Weekly case counts of infected individuals (observed dimension: I only).
    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        values=[[5.0], [14.0], [42.0], [95.0], [155.0], [170.0], [130.0], [85.0], [50.0]],
    )

    prior = vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=0.0, std=1.0, dim=2)

    posterior = vt.infer(
        sde=SIR(),
        observations=observations,
        # observe only I: H = [[0, 1]]
        observation_likelihood=vt.GaussianObservationLikelihood(
            variance=4.0, obs_matrix=[[0.0, 1.0]]
        ),
        prior=prior,
        time_horizon=8.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.02,
                batch_size=64,
                n_iterations=20000,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            state_positive_dims=[0, 1],
            sde_param_positive_dims=[0, 1],
            console=console,
            param_names=param_names,
            x0=jnp.asarray([POPULATION - 5.0, 5.0]),  # S0, I0
        ),
    )

    summary = posterior.summary(n_samples=500)
    console.summary_table(summary, posterior.diagnostics(), param_names=param_names)

    posterior.plot(n_trajectories=30, show=False).savefig("sir_posterior.png", dpi=120)
    posterior.save("sir_posterior.npz")


if __name__ == "__main__":
    main()
