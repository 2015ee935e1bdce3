"""Model-layer tests: theta posterior, encoder, transition head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from viforsdes_tpu.config import EncoderConfig, HeadConfig
from viforsdes_tpu.inference.constants import DIAG_MIN
from viforsdes_tpu.models.encoder import ObservationContextEncoder
from viforsdes_tpu.models.head import DiffusionTransitionHead
from viforsdes_tpu.models.theta_posterior import ThetaPosterior


class TestThetaPosterior:
    def test_rsample_shapes_and_positivity(self):
        tp = ThetaPosterior(3, [0, 2])
        params = tp.init()
        s = tp.rsample(params, jax.random.key(0), 500)
        assert s.shape == (500, 3)
        assert bool(jnp.all(s[:, 0] > 0)) and bool(jnp.all(s[:, 2] > 0))

    def test_log_prob_matches_scipy(self):
        tp = ThetaPosterior(3, [1])
        params = {"mean": jnp.asarray([0.2, -0.1, 0.5]), "log_std": jnp.log(jnp.asarray([0.5, 0.8, 1.2]))}
        theta = jnp.asarray([[0.3, 0.9, -0.2], [-1.0, 2.5, 0.7]])
        got = np.asarray(tp.log_prob(params, theta))
        t = np.asarray(theta)
        want = (
            scipy.stats.norm.logpdf(t[:, 0], 0.2, 0.5)
            + scipy.stats.lognorm.logpdf(t[:, 1], s=0.8, scale=np.exp(-0.1))
            + scipy.stats.norm.logpdf(t[:, 2], 0.5, 1.2)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_log_prob_grad_is_finite(self):
        tp = ThetaPosterior(2, [0])
        params = tp.init()
        theta = jnp.asarray([[0.5, -0.3]])
        g = jax.grad(lambda p: jnp.sum(tp.log_prob(p, theta)))(params)
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in jax.tree.leaves(g))

    def test_expected_value(self):
        tp = ThetaPosterior(2, [1])
        params = {"mean": jnp.asarray([0.4, 0.2]), "log_std": jnp.log(jnp.asarray([1.0, 0.3]))}
        ev = np.asarray(tp.expected_value(params))
        np.testing.assert_allclose(ev[0], 0.4, rtol=1e-6)
        np.testing.assert_allclose(ev[1], np.exp(0.2 + 0.5 * 0.09), rtol=1e-5)

    def test_rsample_consistency_with_log_prob(self):
        """MC mean of log q under q should be close to analytic entropy-negative."""
        tp = ThetaPosterior(1, [])
        params = {"mean": jnp.asarray([1.0]), "log_std": jnp.asarray([0.0])}
        s = tp.rsample(params, jax.random.key(3), 50_000)
        got = float(tp.log_prob(params, s).mean())
        want = -0.5 * (1 + np.log(2 * np.pi))  # -H[N(1,1)]
        np.testing.assert_allclose(got, want, atol=0.02)

    def test_validation(self):
        with pytest.raises(ValueError):
            ThetaPosterior(0, [])
        with pytest.raises(ValueError):
            ThetaPosterior(2, [5])


class TestFullCovarianceThetaPosterior:
    def test_zero_coupling_is_exact_diagonal_parity(self):
        """Zero-init tril: rsample draws, log_prob, and expected_value all
        equal the mean-field family's on the same key/params."""
        diag = ThetaPosterior(3, [0, 2])
        full = ThetaPosterior(3, [0, 2], full_covariance=True)
        p_diag = {"mean": jnp.asarray([0.3, -0.2, 0.1]), "log_std": jnp.log(jnp.asarray([0.5, 0.8, 1.2]))}
        p_full = {**p_diag, "tril": jnp.zeros((3, 3))}
        s_d = diag.rsample(p_diag, jax.random.key(4), 64)
        s_f = full.rsample(p_full, jax.random.key(4), 64)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_d), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(full.log_prob(p_full, s_f)),
            np.asarray(diag.log_prob(p_diag, s_f)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(full.expected_value(p_full)),
            np.asarray(diag.expected_value(p_diag)),
            rtol=1e-6,
        )

    def test_log_prob_matches_scipy_mvn_with_jacobian(self):
        """Correlated case vs scipy: MVN in unconstrained space + exp-Jacobian
        on the positive dim."""
        tp = ThetaPosterior(3, [1], full_covariance=True)
        mean = np.asarray([0.2, -0.1, 0.5])
        log_std = np.log(np.asarray([0.5, 0.8, 1.2]))
        tril = np.asarray([[0.0, 0, 0], [0.3, 0.0, 0], [-0.2, 0.4, 0.0]])
        params = {
            "mean": jnp.asarray(mean),
            "log_std": jnp.asarray(log_std),
            "tril": jnp.asarray(tril),
        }
        L = np.diag(np.exp(log_std)) + np.tril(tril, -1)
        theta = np.asarray([[0.3, 0.9, -0.2], [-1.0, 2.5, 0.7]])
        z = theta.copy()
        z[:, 1] = np.log(theta[:, 1])
        want = scipy.stats.multivariate_normal.logpdf(z, mean, L @ L.T) - z[:, 1]
        got = np.asarray(tp.log_prob(params, jnp.asarray(theta)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_rsample_consistency_with_log_prob(self):
        """MC mean of log q under q ~= -entropy of the correlated Gaussian."""
        tp = ThetaPosterior(2, [], full_covariance=True)
        params = {
            "mean": jnp.asarray([1.0, -0.5]),
            "log_std": jnp.asarray([0.0, np.log(0.6)]),
            "tril": jnp.asarray([[0.0, 0.0], [0.8, 0.0]]),
        }
        L = np.diag([1.0, 0.6]) + np.asarray([[0, 0], [0.8, 0]])
        s = tp.rsample(params, jax.random.key(5), 50_000)
        got = float(tp.log_prob(params, s).mean())
        want = float(
            scipy.stats.multivariate_normal(
                np.asarray([1.0, -0.5]), L @ L.T
            ).logpdf(np.asarray(s)).mean()
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # and sample covariance reproduces L L^T
        np.testing.assert_allclose(
            np.cov(np.asarray(s).T), L @ L.T, atol=0.05
        )

    def test_expected_value_uses_row_variance(self):
        tp = ThetaPosterior(2, [1], full_covariance=True)
        params = {
            "mean": jnp.asarray([0.4, 0.2]),
            "log_std": jnp.asarray([0.0, np.log(0.3)]),
            "tril": jnp.asarray([[0.0, 0.0], [0.5, 0.0]]),
        }
        var1 = 0.5**2 + 0.3**2
        ev = np.asarray(tp.expected_value(params))
        np.testing.assert_allclose(ev[1], np.exp(0.2 + 0.5 * var1), rtol=1e-5)

    def test_trainer_full_covariance_runs(self):
        from viforsdes_tpu.config import TrainingConfig
        from tests.test_inference import _make_trainer

        cfg = TrainingConfig(
            time_step=0.25, batch_size=8, n_iterations=3,
            theta_full_covariance=True,
        )
        trainer = _make_trainer(train_config=cfg)
        assert trainer.params["theta"]["tril"].shape == (3, 3)
        state = trainer.train()
        assert all(np.isfinite(v) for v in state.evidence_lower_bound_history)


class TestEncoder:
    def _build(self, hidden=16, depth=1):
        cfg = EncoderConfig(hidden_dim=hidden, cond_dim=8, num_heads=2, depth=depth)
        return ObservationContextEncoder.build(
            1, 3, cfg, obs_times=np.asarray([0.0, 1.0, 2.0]), time_horizon=2.0, time_step=0.5
        )

    def test_grid_geometry(self):
        enc = self._build()
        assert enc.n_grid == 5
        np.testing.assert_array_equal(enc.obs_slot_indices, [0, 2, 4])

    def test_output_shape_and_dtype(self):
        enc = self._build()
        params = enc.init(jax.random.key(0))
        obs_values = jnp.asarray([[2.0], [1.0], [0.5]])
        theta = jax.random.normal(jax.random.key(1), (4, 3))
        ctx = enc(params, obs_values, theta, compute_dtype=jnp.float32)
        assert ctx.shape == (4, 5, 16)
        assert ctx.dtype == jnp.float32

    def test_theta_conditioning_changes_context(self):
        enc = self._build(depth=2)
        params = enc.init(jax.random.key(0))
        # activate the zero-init adaLN so conditioning matters
        params = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.key(7), p.shape), params
        )
        obs_values = jnp.asarray([[2.0], [1.0], [0.5]])
        t1 = jnp.zeros((1, 3))
        t2 = jnp.ones((1, 3))
        c1 = enc(params, obs_values, t1, compute_dtype=jnp.float32)
        c2 = enc(params, obs_values, t2, compute_dtype=jnp.float32)
        assert float(jnp.max(jnp.abs(c1 - c2))) > 1e-4

    def test_bf16_path_finite(self):
        enc = self._build()
        params = enc.init(jax.random.key(0))
        ctx = enc(params, jnp.asarray([[2.0], [1.0], [0.5]]), jnp.ones((2, 3)), compute_dtype=jnp.bfloat16)
        assert bool(jnp.all(jnp.isfinite(ctx)))


class TestHead:
    def _head(self, state_dim=2, layers=2):
        return DiffusionTransitionHead(
            state_dim=state_dim, context_dim=6, sde_param_dim=3,
            config=HeadConfig(hidden_dim=8, num_layers=layers),
        )

    def test_init_out_proj_diag_bias(self):
        head = self._head(state_dim=3)
        params = head.init(jax.random.key(0))
        b = np.asarray(params["out_proj"]["b"])
        # mu entries zero; diag bias 1.0 at D + k(k+3)/2 (ref head.py:60-66)
        np.testing.assert_array_equal(b[:3], 0.0)
        for k in range(3):
            assert b[3 + k * (k + 3) // 2] == 1.0

    def test_tril_from_params(self):
        head = self._head(state_dim=2)
        raw = jnp.asarray([[0.5, -0.3, 0.004]])  # [diag0, off, diag1]
        L = np.asarray(head.tril_from_params(raw))[0]
        assert L[0, 0] == 0.5
        assert L[1, 0] == pytest.approx(-0.3)
        assert L[1, 1] == pytest.approx(DIAG_MIN)  # clamped
        assert L[0, 1] == 0.0

    def test_scan_matches_stepwise_oracle(self):
        """The fused scan sampler must reproduce the eager per-step forward
        exactly (the reference checked Triton against ``head.forward``)."""
        head = self._head(state_dim=2, layers=3)
        params = head.init(jax.random.key(0))
        # randomize out_proj so transitions are nontrivial
        params["out_proj"]["w"] = 0.3 * jax.random.normal(jax.random.key(1), params["out_proj"]["w"].shape)

        B, T = 4, 7
        x0 = jax.random.normal(jax.random.key(2), (B, 2))
        context = jax.random.normal(jax.random.key(3), (B, T, 6))
        theta = jax.random.normal(jax.random.key(4), (B, 3))
        noise = jax.random.normal(jax.random.key(5), (T, B, 2))  # time-major
        dt = 0.1

        paths, means, chols = head.sample_diffusion_paths(params, x0, context, theta, noise, dt)

        x = x0
        hidden = None
        sqrt_dt = dt**0.5
        for t in range(T):
            mu, L, hidden = head.forward(params, x, context[:, t], theta, hidden)
            x = x + mu * dt + jnp.einsum("bij,bj->bi", L, noise[t]) * sqrt_dt
            np.testing.assert_allclose(np.asarray(means[:, t]), np.asarray(mu), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(chols[:, t]), np.asarray(L), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(paths[:, t + 1]), np.asarray(x), rtol=1e-5, atol=1e-6)

    def test_zero_init_transition_is_identity_plus_noise(self):
        """At init (zero out_proj weight), mu=0 and L=I so the path is a pure
        random walk z0 + cumsum(eps)*sqrt(dt)."""
        head = self._head(state_dim=2, layers=1)
        params = head.init(jax.random.key(0))
        B, T = 2, 5
        x0 = jnp.zeros((B, 2))
        context = jax.random.normal(jax.random.key(1), (B, T, 6))
        theta = jnp.ones((B, 3))
        noise = jax.random.normal(jax.random.key(2), (T, B, 2))  # time-major
        paths, means, chols = head.sample_diffusion_paths(params, x0, context, theta, noise, 0.04)
        np.testing.assert_allclose(np.asarray(means), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(chols), np.broadcast_to(np.eye(2), (B, T, 2, 2)), atol=1e-6
        )
        want = np.swapaxes(np.cumsum(np.asarray(noise), axis=0), 0, 1) * 0.2
        np.testing.assert_allclose(np.asarray(paths[:, 1:]), want, rtol=1e-5, atol=1e-6)

    def test_gradients_flow_through_scan(self):
        head = self._head()
        params = head.init(jax.random.key(0))
        # activate out_proj so gradients reach the GRU (zero-init weight would
        # block dL/dh at init)
        params["out_proj"]["w"] = 0.3 * jax.random.normal(
            jax.random.key(9), params["out_proj"]["w"].shape
        )
        B, T = 2, 4
        args = (
            jax.random.normal(jax.random.key(1), (B, 2)),
            jax.random.normal(jax.random.key(2), (B, T, 6)),
            jax.random.normal(jax.random.key(3), (B, 3)),
            jax.random.normal(jax.random.key(4), (T, B, 2)),  # time-major
        )

        def loss(p):
            paths, means, chols = head.sample_diffusion_paths(p, *args, 0.1)
            return jnp.sum(paths**2) + jnp.sum(means**2) + jnp.sum(chols**2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # GRU weights must receive gradient (out_proj weight is zero-init but
        # still gets grad through chols/means).
        assert float(jnp.linalg.norm(grads["out_proj"]["w"])) > 0
        assert float(jnp.linalg.norm(grads["gru"][0]["w_hh"])) > 0

