"""Diag-Cholesky head mode: parity against the full-tril head and across
sampler backends.

The diag mode (``HeadConfig.cholesky="diag"``) is a strict restriction of the
reference parameterization (ref ``models/head.py:88-97`` always emits the
full lower triangle): the transition scale is the clamped diagonal only, so
a diag head must match a full head whose off-diagonal outputs are zeroed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.config import HeadConfig
from viforsdes_tpu.inference.elbo import gaussian_log_prob
from viforsdes_tpu.models.head import DiffusionTransitionHead

CONTEXT_DIM = 6
PARAM_DIM = 3


def _head(state_dim, num_layers=2, hidden=8, *, chol, sampler="scan"):
    return DiffusionTransitionHead(
        state_dim, CONTEXT_DIM, PARAM_DIM,
        HeadConfig(
            hidden_dim=hidden, num_layers=num_layers,
            sampler=sampler, cholesky=chol,
        ),
    )


def _inputs(key, B, T, state_dim):
    ks = jax.random.split(key, 4)
    return (
        jax.random.normal(ks[0], (B, state_dim)),
        jax.random.normal(ks[1], (B, T, CONTEXT_DIM)),
        jax.random.normal(ks[2], (B, PARAM_DIM)),
        jax.random.normal(ks[3], (T, B, state_dim)),
    )


def _active_params(head, key):
    params = head.init(key)
    params["out_proj"]["w"] = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), params["out_proj"]["w"].shape
    )
    return params


def _full_params_from_diag(diag_head, full_head, diag_params):
    """Embed diag-head out_proj columns into a full-tril head's layout with
    zeros off the diagonal (identical GRU weights)."""
    d = diag_head.state_dim
    full_params = jax.tree_util.tree_map(jnp.array, diag_params)
    w = np.zeros((full_head.hidden_dim, d + full_head.n_tril), np.float32)
    b = np.zeros(d + full_head.n_tril, np.float32)
    dw = np.asarray(diag_params["out_proj"]["w"])
    db = np.asarray(diag_params["out_proj"]["b"])
    w[:, :d] = dw[:, :d]
    b[:d] = db[:d]
    for k in range(d):
        col = d + k * (k + 3) // 2  # diag position in tril packing
        w[:, col] = dw[:, d + k]
        b[col] = db[d + k]
    full_params["out_proj"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return full_params


def test_init_diag_bias_is_one():
    head = _head(5, chol="diag")
    params = head.init(jax.random.key(0))
    assert params["out_proj"]["b"].shape == (10,)
    np.testing.assert_array_equal(np.asarray(params["out_proj"]["b"][5:]), 1.0)


@pytest.mark.parametrize("state_dim", [1, 3, 5])
def test_diag_matches_restricted_full(state_dim):
    """Diag head == full head with zeroed off-diagonal outputs: identical
    paths, means, and chol (diag vector vs matrix diagonal)."""
    diag_head = _head(state_dim, chol="diag")
    full_head = _head(state_dim, chol="full")
    dparams = _active_params(diag_head, jax.random.key(0))
    fparams = _full_params_from_diag(diag_head, full_head, dparams)
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=4, T=7, state_dim=state_dim)

    p_d, m_d, c_d = diag_head.sample_diffusion_paths(dparams, x0, ctx, theta, noise, 0.1)
    p_f, m_f, c_f = full_head.sample_diffusion_paths(fparams, x0, ctx, theta, noise, 0.1)

    assert c_d.ndim == 3  # [B, T, D]
    np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_f), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_f), rtol=1e-5, atol=1e-6)
    d = state_dim
    np.testing.assert_allclose(
        np.asarray(c_d),
        np.asarray(c_f)[..., np.arange(d), np.arange(d)],
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("state_dim,num_layers", [(1, 1), (3, 2), (5, 2)])
def test_diag_pallas_scan_parity(state_dim, num_layers):
    """The fused Pallas sampler (interpret mode on CPU) in diag mode matches
    the scan, forward and gradient."""
    scan_head = _head(state_dim, num_layers, chol="diag", sampler="scan")
    pallas_head = _head(state_dim, num_layers, chol="diag", sampler="pallas")
    params = _active_params(scan_head, jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=4, T=6, state_dim=state_dim)

    outs_s = scan_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    outs_p = pallas_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    for a, b in zip(outs_p, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def loss(head):
        def f(params, ctx, theta):
            p, m, c = head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
            return jnp.sum(p**2) + jnp.sum(m * c)

        return f

    g_s = jax.grad(loss(scan_head), argnums=(0, 1, 2))(params, ctx, theta)
    g_p = jax.grad(loss(pallas_head), argnums=(0, 1, 2))(params, ctx, theta)
    flat_s = jax.tree_util.tree_leaves(g_s)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_gaussian_log_prob_diag_matches_matrix():
    """[..., D] diagonal scale gives the same log-prob as the embedded
    diagonal matrix."""
    key = jax.random.key(3)
    ks = jax.random.split(key, 3)
    B, T, D = 4, 5, 6
    x = jax.random.normal(ks[0], (B, T, D))
    mu = jax.random.normal(ks[1], (B, T, D))
    scale = 0.1 + jax.nn.softplus(jax.random.normal(ks[2], (B, T, D)))

    lp_diag = gaussian_log_prob(x, mu, scale)
    L = scale[..., None] * jnp.eye(D)
    lp_full = gaussian_log_prob(x, mu, L)
    np.testing.assert_allclose(np.asarray(lp_diag), np.asarray(lp_full), rtol=1e-5)

    # gradient parity through the diag branch
    g_diag = jax.grad(lambda s: gaussian_log_prob(x, mu, s).sum())(scale)
    g_full = jax.grad(
        lambda s: gaussian_log_prob(x, mu, s[..., None] * jnp.eye(D)).sum()
    )(scale)
    np.testing.assert_allclose(np.asarray(g_diag), np.asarray(g_full), rtol=1e-4, atol=1e-6)
