"""Diffusion-matched bridge head mode (``HeadConfig.cholesky="matched"``).

Beyond the reference (always a free-form lower triangle, ref
``models/head.py:88-97``): the variational transition scale is built from the
USER's diffusion, ``L_q = diag(dz/dx) @ g(to_state(z), theta) *
exp(softcap(c))``, with the per-dim log-correction ``c`` zero-init — so the
bridge diffusion equals the SDE's exactly at init (Doob h-transform: the true
conditional bridge has the same diffusion coefficient as the SDE). This mode
exists because the free-Cholesky family's measured ladder-5 failure is the
bridge quadratic variation collapsing to the DIAG_MIN floor (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.config import HeadConfig
from viforsdes_tpu.core.state_space import StateSpace
from viforsdes_tpu.models.head import DiffusionTransitionHead

CONTEXT_DIM = 6
PARAM_DIM = 3
STATE_DIM = 2


class VarSDE:
    """2-D SDE with state- AND theta-dependent non-diagonal diffusion, so the
    matched bridge is exercised on every moving part (chain rule, off-diag,
    theta gradient)."""

    state_dim = STATE_DIM
    sde_param_dim = PARAM_DIM

    def drift(self, x, p):
        return p[..., 0:1] * (p[..., 1:2] - x)

    def diffusion(self, x, p):
        s = jax.nn.softplus(p[..., 2])
        d0 = 0.4 + 0.2 * jax.nn.sigmoid(x[..., 0])
        d1 = (0.3 + 0.1 * jax.nn.sigmoid(x[..., 1])) * s
        off = 0.05 * jnp.tanh(x[..., 0])
        L = jnp.zeros(x.shape[:-1] + (2, 2))
        L = L.at[..., 0, 0].set(d0)
        L = L.at[..., 1, 1].set(d1)
        return L.at[..., 1, 0].set(off)


def _head(*, sampler="auto", num_layers=2, hidden=8):
    return DiffusionTransitionHead(
        STATE_DIM, CONTEXT_DIM, PARAM_DIM,
        HeadConfig(
            hidden_dim=hidden, num_layers=num_layers,
            sampler=sampler, cholesky="matched",
        ),
    )


def _inputs(key, B, T):
    ks = jax.random.split(key, 4)
    return (
        jax.random.normal(ks[0], (B, STATE_DIM)),
        jax.random.normal(ks[1], (B, T, CONTEXT_DIM)),
        # keep theta away from softplus(p2) ~ 0 so the DIAG_MIN clamp stays
        # inactive and the exactness assertions below are clamp-free
        jnp.clip(jax.random.normal(ks[2], (B, PARAM_DIM)), -2.0, 2.0),
        jax.random.normal(ks[3], (T, B, STATE_DIM)),
    )


def _active_params(head, key):
    params = head.init(key)
    params["out_proj"]["w"] = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), params["out_proj"]["w"].shape
    )
    return params


def test_matched_output_width_and_init():
    head = _head()
    params = head.init(jax.random.key(0))
    # d mean outputs + d log-correction outputs, ALL zero-init (corr bias 0
    # => exp(0) = 1, exactly-matched bridge at init)
    assert params["out_proj"]["w"].shape == (8, 2 * STATE_DIM)
    np.testing.assert_array_equal(np.asarray(params["out_proj"]["b"]), 0.0)


def test_matched_rejects_pallas_sampler():
    with pytest.raises(ValueError, match="scan sampler"):
        _head(sampler="pallas")


def test_matched_requires_sde_and_state_space():
    head = _head()
    params = head.init(jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=3, T=4)
    with pytest.raises(ValueError, match="needs sde"):
        head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)


def test_zero_init_bridge_equals_sde_diffusion():
    """At init the sampled transition scale IS the chain-ruled SDE diffusion:
    recompute it from the returned paths and compare exactly."""
    sde = VarSDE()
    space = StateSpace(STATE_DIM, positive_dims=[0])
    head = _head()
    params = head.init(jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=4, T=7)

    paths, means, chol = head.sample_diffusion_paths(
        params, x0, ctx, theta, noise, 0.1, sde=sde, state_space=space
    )
    assert chol.shape == (4, 7, STATE_DIM, STATE_DIM)
    np.testing.assert_array_equal(np.asarray(means), 0.0)  # zero-init head

    z_t = paths[:, :-1]  # [B, T, D] latent states the scale was built at
    theta_bt = jnp.broadcast_to(theta[:, None, :], z_t.shape[:2] + (PARAM_DIM,))
    L_x = sde.diffusion(space.to_state(z_t), theta_bt)
    expected = space.latent_jacobian_diag(z_t)[..., None] * L_x
    ar = np.arange(STATE_DIM)
    expected = expected.at[..., ar, ar].set(
        jnp.maximum(expected[..., ar, ar], 1e-2)  # the head's DIAG_MIN clamp
    )
    np.testing.assert_allclose(
        np.asarray(chol), np.asarray(expected), rtol=1e-6, atol=1e-7
    )
    # Euler recurrence consistency: z_{t+1} = z_t + (L @ eps) * sqrt(dt)
    step = jnp.einsum("btij,tbj->bti", chol, noise) * jnp.sqrt(0.1)
    np.testing.assert_allclose(
        np.asarray(paths[:, 1:]), np.asarray(z_t + step), rtol=1e-5, atol=1e-6
    )


def test_matched_forward_scan_parity():
    """The eager per-step oracle (forward) matches the scan with active
    (randomized) weights."""
    sde = VarSDE()
    space = StateSpace(STATE_DIM, positive_dims=[1])
    head = _head()
    params = _active_params(head, jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=4, T=6)
    dt = 0.1

    paths, means, chol = head.sample_diffusion_paths(
        params, x0, ctx, theta, noise, dt, sde=sde, state_space=space
    )

    x, hidden = x0, None
    for t in range(6):
        mu, L, hidden = head.forward(
            params, x, ctx[:, t], theta, hidden, sde=sde, state_space=space
        )
        x = x + mu * dt + jnp.einsum("bij,bj->bi", L, noise[t]) * np.sqrt(dt)
        np.testing.assert_allclose(np.asarray(means[:, t]), np.asarray(mu), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(chol[:, t]), np.asarray(L), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(paths[:, t + 1]), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_latent_jacobian_diag_is_d_to_latent_dx():
    """Chain-rule factor == autodiff of to_latent at x = to_state(z)."""
    space = StateSpace(3, positive_dims=[0, 2])
    z = jnp.asarray([[0.3, -1.2, 2.0], [-0.5, 0.7, 0.1]])
    x = space.to_state(z)
    expected = jax.vmap(lambda xi: jnp.diagonal(jax.jacfwd(space.to_latent)(xi)))(x)
    np.testing.assert_allclose(
        np.asarray(space.latent_jacobian_diag(z)), np.asarray(expected),
        rtol=1e-5, atol=1e-6,
    )


def test_matched_theta_gradient_through_diffusion():
    """sigma-like params get a direct pathwise gradient through the bridge
    scale — the mechanism the free-Cholesky family lacks."""
    sde = VarSDE()
    space = StateSpace(STATE_DIM)
    head = _head()
    params = head.init(jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=3, T=5)

    def chol_mass(theta):
        _, _, chol = head.sample_diffusion_paths(
            params, x0, ctx, theta, noise, 0.1, sde=sde, state_space=space
        )
        return jnp.sum(chol)

    g = jax.grad(chol_mass)(theta)
    # VarSDE's diffusion depends only on p[..., 2]
    assert np.all(np.abs(np.asarray(g[:, 2])) > 1e-6)
    np.testing.assert_array_equal(np.asarray(g[:, :2]), 0.0)


def test_matched_correction_is_softcapped():
    """A huge raw correction saturates at exp(CORR_CAP), not inf."""
    sde = VarSDE()
    space = StateSpace(STATE_DIM)
    head = _head()
    z = jnp.zeros((3, STATE_DIM))
    theta = jnp.zeros((3, PARAM_DIM))
    raw = jnp.full((3, STATE_DIM), 1e4)
    L = head.matched_chol(z, theta, raw, sde, space)
    base = head.matched_chol(z, theta, jnp.zeros_like(raw), sde, space)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(base) * np.exp(head.CORR_CAP), rtol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(L)))


def test_matched_end_to_end_infer():
    """Tiny end-to-end inference with the matched bridge (positive theta dims
    + positive state dim => full chain-rule path), through the public API."""
    import viforsdes_tpu as vt

    class PosOU:
        state_dim = 1
        sde_param_dim = 3

        def drift(self, x, p):
            return p[..., 0:1] * (p[..., 1:2] - x)

        def diffusion(self, x, p):
            return p[..., 2:3][..., None]

    obs = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
    )
    posterior = vt.infer(
        PosOU(), obs, vt.GaussianObservationLikelihood(variance=0.1),
        vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3), 5.0,
        vt.InferenceConfig(
            training=vt.TrainingConfig(time_step=0.25, batch_size=8, n_iterations=8),
            encoder=vt.EncoderConfig(hidden_dim=32, cond_dim=32, num_heads=4, depth=2),
            head=vt.HeadConfig(hidden_dim=16, num_layers=2, cholesky="matched"),
            sde_param_positive_dims=[0, 2],
            state_positive_dims=[0],
            pretrain=vt.PretrainConfig(n_iterations=5, batch_size=32),
            console=vt.Console(enabled=False),
        ),
    )
    s = posterior.summary(n_samples=32)
    assert np.all(np.isfinite(np.asarray(s.sde_parameter_mean)))
    assert np.isfinite(posterior.diagnostics().final_evidence_lower_bound)

    # a matched-mode posterior cannot sample without the SDE: constructing
    # one without it must fail loudly, not at first .sample()
    with pytest.raises(ValueError, match="needs the sde"):
        vt.VariationalPosterior(
            posterior.model, posterior.params, posterior.ema_params,
            posterior.prior, obs, 5.0, 0.25, posterior.state_space, [],
        )
