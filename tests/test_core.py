"""Core-layer unit tests (reference test strategy: SURVEY §4, CPU tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from viforsdes_tpu.core.observations import GaussianObservationLikelihood, Observations
from viforsdes_tpu.core.priors import Prior, PriorType
from viforsdes_tpu.core.sde import SDE, make_sde
from viforsdes_tpu.core.solvers import euler_maruyama
from viforsdes_tpu.core.state_space import StateSpace


class TestObservations:
    def test_valid(self):
        obs = Observations(times=[0.0, 1.0], values=[[1.0], [2.0]])
        assert obs.times.shape == (2,)
        assert obs.values.shape == (2, 1)

    def test_rejects_bad_ndim(self):
        with pytest.raises(ValueError):
            Observations(times=[[0.0]], values=[[1.0]])
        with pytest.raises(ValueError):
            Observations(times=[0.0], values=[1.0])

    def test_rejects_length_mismatch(self):
        with pytest.raises(ValueError):
            Observations(times=[0.0, 1.0], values=[[1.0]])

    def test_rejects_unsorted(self):
        with pytest.raises(ValueError):
            Observations(times=[1.0, 0.0], values=[[1.0], [2.0]])


class TestGaussianLikelihood:
    def test_rejects_nonpositive_variance(self):
        with pytest.raises(ValueError):
            GaussianObservationLikelihood(variance=0.0)

    def test_matches_scipy(self):
        lik = GaussianObservationLikelihood(variance=0.3)
        rng = np.random.default_rng(0)
        y = rng.normal(size=(4, 2)).astype(np.float32)
        x = rng.normal(size=(4, 2)).astype(np.float32)
        got = np.asarray(lik.log_prob(jnp.asarray(y), jnp.asarray(x)))
        want = scipy.stats.norm.logpdf(y, loc=x, scale=np.sqrt(0.3)).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_obs_matrix_partial_observation(self):
        # Observe only dim 0 of a 2-D state (ref core/observations.py:53-60).
        H = np.array([[1.0, 0.0]], dtype=np.float32)
        lik = GaussianObservationLikelihood(variance=1.0, obs_matrix=H)
        x = jnp.asarray([[1.0, 99.0]])
        y = jnp.asarray([[1.0]])
        got = float(lik.log_prob(y, x)[0])
        want = scipy.stats.norm.logpdf(0.0, scale=1.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestPrior:
    def test_validators(self):
        with pytest.raises(ValueError):
            Prior(type=PriorType.NORMAL, mean=0.0, std=-1.0, dim=2)
        with pytest.raises(ValueError):
            Prior(type=PriorType.NORMAL, mean=0.0, std=1.0, dim=0)

    def test_normal_log_prob_matches_scipy(self):
        prior = Prior(type=PriorType.NORMAL, mean=0.5, std=2.0, dim=3)
        x = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
        got = np.asarray(prior.log_prob(jnp.asarray(x)))
        want = scipy.stats.norm.logpdf(x, loc=0.5, scale=2.0).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_lognormal_log_prob_matches_scipy(self):
        prior = Prior(type=PriorType.LOG_NORMAL, mean=0.1, std=1.5, dim=2)
        x = np.abs(np.random.default_rng(2).normal(size=(5, 2))).astype(np.float32) + 0.1
        got = np.asarray(prior.log_prob(jnp.asarray(x)))
        want = scipy.stats.lognorm.logpdf(x, s=1.5, scale=np.exp(0.1)).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_sample_shape_and_positivity(self):
        prior = Prior(type=PriorType.LOG_NORMAL, mean=0.0, std=1.0, dim=4)
        s = prior.sample(jax.random.key(0), 100)
        assert s.shape == (100, 4)
        assert bool(jnp.all(s > 0))


class TestEulerMaruyama:
    def _ou(self):
        return make_sde(
            drift=lambda x, p: p[..., 0:1] * (p[..., 1:2] - x),
            diffusion=lambda x, p: p[..., 2:3][..., None],
            state_dim=1,
            sde_param_dim=3,
        )

    def test_shapes(self):
        sde = self._ou()
        x0 = jnp.ones((8, 1))
        theta = jnp.tile(jnp.asarray([1.0, 0.0, 0.5]), (8, 1))
        traj = euler_maruyama(sde, x0, theta, 2.0, 0.1, key=jax.random.key(0))
        assert traj.shape == (8, 21, 1)
        np.testing.assert_allclose(np.asarray(traj[:, 0]), np.asarray(x0))

    def test_deterministic_with_given_noise(self):
        sde = self._ou()
        x0 = jnp.ones((4, 1))
        theta = jnp.tile(jnp.asarray([1.0, 0.0, 0.5]), (4, 1))
        noise = jax.random.normal(jax.random.key(1), (4, 20, 1))
        t1 = euler_maruyama(sde, x0, theta, 2.0, 0.1, noise=noise)
        t2 = euler_maruyama(sde, x0, theta, 2.0, 0.1, noise=noise)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_manual_step_equivalence(self):
        """One EM step must equal x + f dt + L eps sqrt(dt) exactly."""
        sde = self._ou()
        x0 = jnp.asarray([[2.0]])
        theta = jnp.asarray([[1.5, 0.5, 0.3]])
        noise = jnp.asarray([[[0.7]]])
        traj = euler_maruyama(sde, x0, theta, 0.1, 0.1, noise=noise)
        dt = 0.1
        want = 2.0 + 1.5 * (0.5 - 2.0) * dt + 0.3 * 0.7 * dt**0.5
        np.testing.assert_allclose(float(traj[0, 1, 0]), want, rtol=1e-6)

    def test_positive_dims_clamped(self):
        sde = make_sde(
            drift=lambda x, p: -100.0 * jnp.ones_like(x),
            diffusion=lambda x, p: jnp.zeros(x.shape + (1,)),
            state_dim=1,
            sde_param_dim=1,
        )
        x0 = jnp.asarray([[0.1]])
        theta = jnp.asarray([[1.0]])
        traj = euler_maruyama(sde, x0, theta, 1.0, 0.1, positive_dims=[0], key=jax.random.key(0))
        assert bool(jnp.all(traj >= 1e-6))

    def test_rejects_bad_dt(self):
        with pytest.raises(ValueError):
            euler_maruyama(self._ou(), jnp.ones((1, 1)), jnp.ones((1, 3)), 1.0, -0.1, key=jax.random.key(0))


class TestStateSpace:
    def test_identity_when_no_positive_dims(self):
        ss = StateSpace(3)
        x = jnp.asarray([[-1.0, 2.0, 0.5]])
        np.testing.assert_array_equal(np.asarray(ss.to_state(x)), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(ss.to_latent(x)), np.asarray(x))
        assert float(ss.log_jacobian(x)[0]) == 0.0

    def test_roundtrip(self):
        ss = StateSpace(2, [1])
        x = jnp.asarray([[-1.0, 3.0], [0.5, 0.01]])
        z = ss.to_latent(x)
        back = ss.to_state(z)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-6)

    def test_log_jacobian_matches_autodiff(self):
        ss = StateSpace(2, [0, 1])
        z = jnp.asarray([0.3, -1.2])
        jac = jax.jacobian(ss.to_state)(z)
        want = float(jnp.log(jnp.abs(jnp.linalg.det(jac))))
        got = float(ss.log_jacobian(z))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            StateSpace(0)
        with pytest.raises(ValueError):
            StateSpace(2, [2])
        with pytest.raises(ValueError):
            StateSpace(2, [0, 0])


class TestSDEProtocol:
    def test_functional_sde_is_sde(self):
        sde = make_sde(lambda x, p: x, lambda x, p: x[..., None], 1, 1)
        assert isinstance(sde, SDE)
        assert sde.state_dim == 1
