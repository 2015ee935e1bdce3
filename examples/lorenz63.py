"""Stochastic Lorenz-63 3-D example (BASELINE.md config 3: dense observations,
long horizon T=20 -> a deep 2000-step lax.scan).

dx = sigma_L (y - x) dt + s dW1
dy = (x (rho - z) - y) dt + s dW2
dz = (x y - beta z) dt + s dW3

Inferred parameters: (sigma_L, rho, beta), all positive; fixed known noise
scale s. Observations are all three coordinates every 0.5 time units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import viforsdes_tpu as vt

NOISE_SCALE = 2.0
TRUE_PARAMS = (10.0, 28.0, 8.0 / 3.0)


class StochasticLorenz63:
    state_dim = 3
    sde_param_dim = 3

    def drift(self, x: jax.Array, p: jax.Array) -> jax.Array:
        sigma_l, rho, beta = p[..., 0], p[..., 1], p[..., 2]
        x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
        return jnp.stack(
            [
                sigma_l * (x2 - x1),
                x1 * (rho - x3) - x2,
                x1 * x2 - beta * x3,
            ],
            axis=-1,
        )

    def diffusion(self, x: jax.Array, p: jax.Array) -> jax.Array:
        eye = jnp.eye(3, dtype=x.dtype)
        return jnp.broadcast_to(NOISE_SCALE * eye, x.shape + (3,))


def simulate_observations(key, time_horizon=20.0, dt=0.01, obs_every=0.5):
    """Generate synthetic ground-truth observations from the true system."""
    sde = StochasticLorenz63()
    x0 = jnp.asarray([[1.0, 1.0, 25.0]])
    theta = jnp.asarray([TRUE_PARAMS])
    traj = vt.euler_maruyama(sde, x0, theta, time_horizon, dt, key=key)
    stride = int(round(obs_every / dt))
    idx = np.arange(0, traj.shape[1], stride)
    times = idx * dt
    return vt.Observations(times=times.tolist(), values=np.asarray(traj[0, idx]))


def main() -> None:
    console = vt.Console()
    param_names = ["σ_L", "ρ", "β"]

    observations = simulate_observations(jax.random.key(17))

    prior = vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3)

    posterior = vt.infer(
        sde=StochasticLorenz63(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
        prior=prior,
        time_horizon=20.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.01,  # 2000-step scan
                batch_size=32,
                n_iterations=30000,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            sde_param_positive_dims=[0, 1, 2],
            console=console,
            param_names=param_names,
            pretrain=vt.PretrainConfig(),
        ),
    )

    summary = posterior.summary(n_samples=500)
    console.summary_table(summary, posterior.diagnostics(), param_names=param_names)
    print("true params:", TRUE_PARAMS)

    posterior.plot(n_trajectories=30, show=False).savefig("lorenz63_posterior.png", dpi=120)
    posterior.save("lorenz63_posterior.npz")


if __name__ == "__main__":
    main()
