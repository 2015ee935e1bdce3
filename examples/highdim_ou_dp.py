"""High-dimensional OU (d=32) with data-parallel training (BASELINE.md
config 5): batch 4096 sharded over all available chips (v5e-8 target), EMA
synchronized by construction.

Run on a TPU slice; also runs on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import viforsdes_tpu as vt

STATE_DIM = 32


class HighDimOU:
    """Independent OU in d=32 dims with shared (kappa, mu, sigma)."""

    state_dim = STATE_DIM
    sde_param_dim = 3

    def drift(self, x: jax.Array, p: jax.Array) -> jax.Array:
        kappa = p[..., 0:1]
        mu = p[..., 1:2]
        return kappa * (mu - x)

    def diffusion(self, x: jax.Array, p: jax.Array) -> jax.Array:
        sigma = p[..., 2:3]
        eye = jnp.eye(STATE_DIM, dtype=x.dtype)
        return sigma[..., None] * eye


def simulate_observations(key, obs_every: float = 1.0, noise_std: float = 0.0):
    """Simulate the d=32 OU trajectory and observe it every ``obs_every``.

    ``noise_std`` adds real i.i.d. Gaussian observation noise. The default 0
    (noiseless, kept for artifact continuity) makes any likelihood that
    claims variance v > 0 MISSPECIFIED — the exact Kalman MLE at claim 0.01
    then sits at sigma* = 0.391 vs true 0.5 (z = 10; benchmarks/
    highdim_claim_sweep.py), so parameter-recovery runs against noiseless
    data must anneal the claim toward 0 to have a passable optimum. Set
    ``noise_std = sqrt(claimed variance)`` for a correctly-specified
    benchmark (the claim-0.01 optimum is then z = 0.28/1.26/0.21 from truth).
    """
    sde = HighDimOU()
    x0 = 2.0 * jnp.ones((1, STATE_DIM))
    theta = jnp.asarray([[1.2, 0.8, 0.5]])
    traj = vt.euler_maruyama(sde, x0, theta, 5.0, 0.01, key=key)
    idx = np.arange(0, 501, round(obs_every / 0.01))
    values = np.asarray(traj[0, idx])
    if noise_std > 0.0:
        rng = np.random.default_rng(3)
        noise = noise_std * rng.standard_normal(values.shape)
        noise[0] = 0.0  # x0 is conditioned on exactly (trainer pins it)
        values = values + noise.astype(values.dtype)
    return vt.Observations(times=(idx * 0.01).tolist(), values=values)


def main() -> None:
    console = vt.Console()
    mesh = vt.make_data_mesh()  # all devices, 1-D "data" axis
    console.print(f"data-parallel over {len(jax.devices())} devices")

    observations = simulate_observations(jax.random.key(3))
    prior = vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3)

    posterior = vt.infer(
        sde=HighDimOU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=prior,
        time_horizon=5.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.05,
                batch_size=4096,  # global batch, sharded over the mesh
                n_iterations=5000,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            sde_param_positive_dims=[0, 2],
            console=console,
            param_names=["κ", "μ", "σ"],
            mesh=mesh,
        ),
    )

    summary = posterior.summary(n_samples=500)
    console.summary_table(summary, posterior.diagnostics(), param_names=["κ", "μ", "σ"])
    print("true params: (1.2, 0.8, 0.5)")
    posterior.save("highdim_ou_posterior.npz")


if __name__ == "__main__":
    main()
