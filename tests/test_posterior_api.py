"""Posterior artifact + infer() API + validation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viforsdes_tpu as vt


class OU:
    state_dim = 1
    sde_param_dim = 3

    def drift(self, x, p):
        return p[..., 0:1] * (p[..., 1:2] - x)

    def diffusion(self, x, p):
        return p[..., 2:3][..., None]


def _tiny_config(n_iterations=4, **kw):
    return vt.InferenceConfig(
        training=vt.TrainingConfig(time_step=0.5, batch_size=8, n_iterations=n_iterations),
        encoder=vt.EncoderConfig(hidden_dim=16, cond_dim=16, num_heads=2, depth=1),
        head=vt.HeadConfig(hidden_dim=8, num_layers=1),
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
        **kw,
    )


@pytest.fixture(scope="module")
def trained_posterior():
    obs = vt.Observations(times=[0.0, 1.0, 2.0], values=[[2.0], [1.5], [0.8]])
    return vt.infer(
        OU(),
        obs,
        vt.GaussianObservationLikelihood(variance=0.1),
        vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        2.0,
        _tiny_config(),
    )


class TestVariationalPosterior:
    def test_sample_shapes(self, trained_posterior):
        s = trained_posterior.sample(16)
        assert s.sde_parameters.shape == (16, 3)
        assert s.diffusion_paths.shape == (16, 5, 1)
        assert bool(jnp.all(jnp.isfinite(s.diffusion_paths)))

    def test_samples_vary_between_calls(self, trained_posterior):
        a = trained_posterior.sample(4).sde_parameters
        b = trained_posterior.sample(4).sde_parameters
        assert float(jnp.max(jnp.abs(a - b))) > 0

    def test_summary(self, trained_posterior):
        s = trained_posterior.summary(n_samples=64)
        assert s.sde_parameter_mean.shape == (3,)
        q = s.sde_parameter_quantiles
        assert bool(jnp.all(q.q05 <= q.q50)) and bool(jnp.all(q.q50 <= q.q95))
        assert s.diffusion_path_mean.shape == (5, 1)

    def test_diagnostics(self, trained_posterior):
        d = trained_posterior.diagnostics()
        assert d.n_iterations == 4
        assert d.final_evidence_lower_bound == d.evidence_lower_bound_history[-1]

    def test_plot(self, trained_posterior):
        fig = trained_posterior.plot(n_trajectories=3, show=False)
        assert fig is not None

    def test_save_load_roundtrip(self, trained_posterior, tmp_path):
        p = tmp_path / "ckpt.npz"
        trained_posterior.save(p)
        loaded = vt.VariationalPosterior.load(
            p, trained_posterior.model, trained_posterior.prior, trained_posterior.observations
        )
        for a, b in zip(
            jax.tree.leaves(trained_posterior.ema_params), jax.tree.leaves(loaded.ema_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert loaded.time_step == trained_posterior.time_step
        assert (
            loaded.evidence_lower_bound_history
            == trained_posterior.evidence_lower_bound_history
        )
        # loaded posterior must be able to sample
        s = loaded.sample(2)
        assert s.diffusion_paths.shape == (2, 5, 1)

    def test_save_load_preserves_x0(self, trained_posterior, tmp_path):
        """An explicit x0 survives the checkpoint roundtrip (a reloaded
        partial-observation posterior must not silently fall back to
        x0 = observations.values[0])."""
        src = trained_posterior
        custom = vt.VariationalPosterior(
            model=src.model,
            params=src.params,
            ema_params=src.ema_params,
            prior=src.prior,
            observations=src.observations,
            time_horizon=src.time_horizon,
            time_step=src.time_step,
            state_space=src.state_space,
            evidence_lower_bound_history=src.evidence_lower_bound_history,
            x0=jnp.asarray([7.5]),
        )
        p = tmp_path / "ckpt_x0.npz"
        custom.save(p)
        loaded = vt.VariationalPosterior.load(
            p, src.model, src.prior, src.observations
        )
        np.testing.assert_allclose(np.asarray(loaded._x0_single), [7.5])

    def test_partial_observation_requires_x0(self, trained_posterior):
        """obs_dim != state_dim with no explicit x0 raises instead of
        broadcasting a wrong initial state."""
        src = trained_posterior
        model2 = vt.VariationalSDEPosterior(
            observation_dim=1,
            state_dim=2,
            sde_param_dim=3,
            encoder_config=vt.EncoderConfig(hidden_dim=16, cond_dim=16, num_heads=2, depth=1),
            head_config=vt.HeadConfig(hidden_dim=8, num_layers=1),
            sde_param_positive_dims=[0, 2],
            obs_times=np.asarray([0.0, 1.0, 2.0]),
            time_horizon=2.0,
            time_step=0.5,
        )
        with pytest.raises(ValueError, match="explicit x0"):
            vt.VariationalPosterior(
                model=model2,
                params=src.params,
                ema_params=src.ema_params,
                prior=src.prior,
                observations=src.observations,
                time_horizon=src.time_horizon,
                time_step=src.time_step,
                state_space=vt.StateSpace(2, []),
                evidence_lower_bound_history=[],
            )


class TestInferValidation:
    def _obs(self, times, values):
        return vt.Observations(times=times, values=values)

    def _run(self, obs, horizon=2.0, **cfg_kw):
        return vt.infer(
            OU(),
            obs,
            vt.GaussianObservationLikelihood(variance=0.1),
            vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
            horizon,
            _tiny_config(n_iterations=1, **cfg_kw),
        )

    def test_horizon_not_multiple_of_dt(self):
        with pytest.raises(Exception, match="integer multiple"):
            self._run(self._obs([0.0], [[1.0]]), horizon=2.3)

    def test_first_obs_time_nonzero(self):
        with pytest.raises(Exception, match="first observation"):
            self._run(self._obs([0.5, 1.0], [[1.0], [2.0]]))

    def test_obs_not_on_grid(self):
        with pytest.raises(Exception, match="align"):
            self._run(self._obs([0.0, 1.23], [[1.0], [2.0]]))

    def test_large_times_survive_grid_alignment(self):
        """Times are stored host float64: at t >= 16.2 an fp32 representation
        drifts ~2e-6 off a 0.01 grid, past the 1e-6 alignment tolerance
        (regression: long-horizon dense-obs configs failed validation)."""
        import numpy as np
        from viforsdes_tpu.infer import _InferenceInputs

        times = (np.arange(0, 2001, 10) * 0.01).tolist()  # 0.0 .. 20.0
        obs = vt.Observations(times=times, values=[[1.0]] * len(times))
        assert obs.times.dtype == np.float64
        _InferenceInputs(
            observations=obs, time_horizon=20.0, time_step=0.01,
            state_dim=1, sde_param_dim=3,
            state_positive_dims=[], sde_param_positive_dims=[],
            prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        )

    def test_obs_beyond_horizon(self):
        with pytest.raises(Exception, match="within"):
            self._run(self._obs([0.0, 3.0], [[1.0], [2.0]]))

    def test_prior_dim_mismatch(self):
        obs = self._obs([0.0], [[1.0]])
        with pytest.raises(Exception, match="prior dim"):
            vt.infer(
                OU(),
                obs,
                vt.GaussianObservationLikelihood(variance=0.1),
                vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=2),
                2.0,
                _tiny_config(n_iterations=1),
            )

    def test_duplicate_positive_dims(self):
        obs = self._obs([0.0], [[1.0]])
        with pytest.raises(Exception, match="unique"):
            vt.infer(
                OU(),
                obs,
                vt.GaussianObservationLikelihood(variance=0.1),
                vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
                2.0,
                vt.InferenceConfig(
                    training=vt.TrainingConfig(time_step=0.5, batch_size=4, n_iterations=1),
                    state_positive_dims=[0, 0],
                    console=vt.Console(enabled=False),
                ),
            )


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("time_step: 0.2\nbatch_size: 32\n")
        cfg = vt.TrainingConfig.from_yaml(p)
        assert cfg.time_step == 0.2
        assert cfg.batch_size == 32
        assert cfg.n_iterations == 25000  # default preserved

    def test_validators(self):
        with pytest.raises(ValueError):
            vt.TrainingConfig(time_step=-1.0)
        with pytest.raises(ValueError):
            vt.EncoderConfig(hidden_dim=30, num_heads=4)
        with pytest.raises(ValueError):
            vt.HeadConfig(num_layers=0)
