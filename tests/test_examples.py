"""Smoke tests for the example model families (tiny configs, CPU)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viforsdes_tpu as vt

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from lotka_volterra import LotkaVolterra  # noqa: E402
from lorenz63 import StochasticLorenz63, simulate_observations as lorenz_obs  # noqa: E402
from ornstein_uhlenbeck import OrnsteinUhlenbeck  # noqa: E402
from sir_epidemic import SIR, POPULATION  # noqa: E402


def _tiny(n_iterations=2, **kw):
    return vt.InferenceConfig(
        training=vt.TrainingConfig(time_step=kw.pop("time_step", 0.5), batch_size=8, n_iterations=n_iterations),
        encoder=vt.EncoderConfig(hidden_dim=16, cond_dim=16, num_heads=2, depth=1),
        head=vt.HeadConfig(hidden_dim=8, num_layers=1),
        console=vt.Console(enabled=False),
        **kw,
    )


class TestSDEDefinitions:
    def test_ou_shapes(self):
        sde = OrnsteinUhlenbeck()
        x = jnp.ones((4, 1))
        p = jnp.ones((4, 3))
        assert sde.drift(x, p).shape == (4, 1)
        assert sde.diffusion(x, p).shape == (4, 1, 1)

    def test_lv_cholesky_is_valid(self):
        sde = LotkaVolterra()
        x = jnp.asarray([[50.0, 80.0]])
        p = jnp.asarray([[0.5, 0.0025, 0.3]])
        L = sde.diffusion(x, p)
        assert L.shape == (1, 2, 2)
        cov = L @ jnp.swapaxes(L, -1, -2)
        evals = jnp.linalg.eigvalsh(cov[0])
        assert bool(jnp.all(evals > 0))
        assert float(L[0, 0, 1]) == 0.0  # lower triangular

    def test_lorenz_drift(self):
        sde = StochasticLorenz63()
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        p = jnp.asarray([[10.0, 28.0, 8.0 / 3.0]])
        d = np.asarray(sde.drift(x, p))[0]
        np.testing.assert_allclose(d, [10.0 * 1.0, 1.0 * 25.0 - 2.0, 2.0 - 8.0], rtol=1e-5)

    def test_sir_mass_conservation_in_drift(self):
        """dS + dI = -gamma*I (recoveries leave the S+I pool)."""
        sde = SIR()
        x = jnp.asarray([[900.0, 50.0]])
        p = jnp.asarray([[0.8, 0.3]])
        d = np.asarray(sde.drift(x, p))[0]
        np.testing.assert_allclose(d.sum(), -0.3 * 50.0, rtol=1e-5)

    def test_sir_cholesky_matches_cov(self):
        sde = SIR()
        x = jnp.asarray([[900.0, 50.0]])
        p = jnp.asarray([[0.8, 0.3]])
        L = np.asarray(sde.diffusion(x, p))[0]
        a = 0.8 * 900.0 * 50.0 / POPULATION
        b = 0.3 * 50.0
        cov = L @ L.T
        np.testing.assert_allclose(cov, [[a, -a], [-a, a + b]], rtol=1e-5)


class TestEndToEnd:
    def test_sir_partial_observation_inference(self):
        """Partial observation (obs_dim 1, state_dim 2) + explicit x0 runs."""
        obs = vt.Observations(times=[0.0, 1.0, 2.0], values=[[5.0], [14.0], [42.0]])
        posterior = vt.infer(
            sde=SIR(),
            observations=obs,
            observation_likelihood=vt.GaussianObservationLikelihood(
                variance=4.0, obs_matrix=[[0.0, 1.0]]
            ),
            prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=0.0, std=1.0, dim=2),
            time_horizon=2.0,
            config=_tiny(
                state_positive_dims=[0, 1],
                sde_param_positive_dims=[0, 1],
                x0=jnp.asarray([995.0, 5.0]),
            ),
        )
        s = posterior.sample(4)
        assert s.diffusion_paths.shape == (4, 5, 2)
        assert bool(jnp.all(jnp.isfinite(s.diffusion_paths)))

    def test_sir_pretrain_with_partial_observation(self):
        """Pretrain must project simulated paths through obs_matrix."""
        from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

        obs = vt.Observations(times=[0.0, 1.0, 2.0], values=[[5.0], [14.0], [42.0]])
        trainer = VariationalInferenceTrainer(
            sde=SIR(),
            observations=obs,
            observation_likelihood=vt.GaussianObservationLikelihood(
                variance=4.0, obs_matrix=[[0.0, 1.0]]
            ),
            prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=0.0, std=1.0, dim=2),
            time_horizon=2.0,
            config=vt.TrainingConfig(time_step=0.5, batch_size=4, n_iterations=1),
            encoder_config=vt.EncoderConfig(hidden_dim=16, cond_dim=16, num_heads=2, depth=1),
            head_config=vt.HeadConfig(hidden_dim=8, num_layers=1),
            state_positive_dims=[0, 1],
            sde_param_positive_dims=[0, 1],
            console=vt.Console(enabled=False),
            x0=jnp.asarray([995.0, 5.0]),
        )
        mu = trainer.pretrain_sde_parameters(vt.PretrainConfig(n_iterations=5, batch_size=32))
        assert mu.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(mu)))

    def test_lorenz_observation_simulation(self):
        obs = lorenz_obs(jax.random.key(0), time_horizon=2.0, dt=0.01, obs_every=0.5)
        assert obs.values.shape == (5, 3)
        assert bool(jnp.all(jnp.isfinite(obs.values)))
