"""Fused Pallas sampler vs the lax.scan oracle (interpret mode, CPU).

Mirrors the reference's kernel-vs-oracle strategy (``test_triton_kernel.py`` /
``test_gru_gradient_proof.py`` slots, SURVEY §4) but runs hardware-free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.config import HeadConfig
from viforsdes_tpu.models.head import DiffusionTransitionHead


def _heads(state_dim, num_layers, hidden=8, context_dim=6, param_dim=3):
    scan_head = DiffusionTransitionHead(
        state_dim, context_dim, param_dim,
        HeadConfig(hidden_dim=hidden, num_layers=num_layers, sampler="scan"),
    )
    pallas_head = DiffusionTransitionHead(
        state_dim, context_dim, param_dim,
        HeadConfig(hidden_dim=hidden, num_layers=num_layers, sampler="pallas"),
    )
    return scan_head, pallas_head


def _inputs(key, B, T, state_dim, context_dim=6, param_dim=3):
    ks = jax.random.split(key, 4)
    return (
        jax.random.normal(ks[0], (B, state_dim)),
        jax.random.normal(ks[1], (B, T, context_dim)),
        jax.random.normal(ks[2], (B, param_dim)),
        # noise is time-major [T, B, D] (head/path_sampler contract)
        jax.random.normal(ks[3], (T, B, state_dim)),
    )


def _active_params(head, key):
    params = head.init(key)
    params["out_proj"]["w"] = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), params["out_proj"]["w"].shape
    )
    return params


@pytest.mark.parametrize("state_dim,num_layers", [(1, 1), (2, 2), (3, 3), (1, 5)])
def test_forward_parity(state_dim, num_layers):
    scan_head, pallas_head = _heads(state_dim, num_layers)
    params = _active_params(scan_head, jax.random.key(0))
    x0, ctx, theta, noise = _inputs(jax.random.key(1), B=4, T=6, state_dim=state_dim)
    dt = 0.1

    p_s, m_s, c_s = scan_head.sample_diffusion_paths(params, x0, ctx, theta, noise, dt)
    p_p, m_p, c_p = pallas_head.sample_diffusion_paths(params, x0, ctx, theta, noise, dt)

    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("state_dim,num_layers", [(1, 1), (2, 2), (1, 3)])
def test_gradient_parity(state_dim, num_layers):
    """The hand-derived BPTT kernel must match jax.grad through the scan —
    the reference's 'gru gradient proof' equivalent."""
    scan_head, pallas_head = _heads(state_dim, num_layers)
    params = _active_params(scan_head, jax.random.key(2))
    x0, ctx, theta, noise = _inputs(jax.random.key(3), B=4, T=5, state_dim=state_dim)
    dt = 0.1

    def loss(head):
        def f(p, x0_, ctx_, theta_):
            paths, means, chols = head.sample_diffusion_paths(p, x0_, ctx_, theta_, noise, dt)
            # weighted sums exercise all three outputs' cotangents
            return (
                jnp.sum(paths * jnp.cos(jnp.arange(paths.size).reshape(paths.shape)))
                + 0.7 * jnp.sum(means**2)
                + 0.3 * jnp.sum(chols * jnp.sin(jnp.arange(chols.size).reshape(chols.shape)))
            )
        return f

    g_s = jax.grad(loss(scan_head), argnums=(0, 1, 2, 3))(params, x0, ctx, theta)
    g_p = jax.grad(loss(pallas_head), argnums=(0, 1, 2, 3))(params, x0, ctx, theta)

    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
    assert len(flat_s) == len(flat_p)
    for (path_s, leaf_s), (_, leaf_p) in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(leaf_p),
            np.asarray(leaf_s),
            rtol=2e-4,
            atol=2e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path_s)}",
        )


@pytest.mark.parametrize("state_dim,num_layers", [(1, 2), (3, 1)])
def test_gradient_parity_wrt_noise(state_dim, num_layers):
    """Scan and Pallas must agree on the NOISE cotangent too (pathwise /
    antithetic / STL estimators differentiate through eps). The Pallas rule is
    d_eps = ((d_x_next @ R^T) * vals_clamped) @ C * sqrt(dt)."""
    scan_head, pallas_head = _heads(state_dim, num_layers)
    params = _active_params(scan_head, jax.random.key(10))
    x0, ctx, theta, noise = _inputs(jax.random.key(11), B=4, T=5, state_dim=state_dim)
    dt = 0.1

    def make_loss(head):
        def f(eps):
            paths, means, chols = head.sample_diffusion_paths(params, x0, ctx, theta, eps, dt)
            return (
                jnp.sum(paths * jnp.cos(jnp.arange(paths.size).reshape(paths.shape)))
                + 0.5 * jnp.sum(means**2)
                + 0.2 * jnp.sum(chols**2)
            )
        return f

    g_s = jax.grad(make_loss(scan_head))(noise)
    g_p = jax.grad(make_loss(pallas_head))(noise)
    assert float(jnp.max(jnp.abs(g_s))) > 1e-3  # the cotangent is non-trivial
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s), rtol=2e-4, atol=2e-5)


def test_gradient_parity_wrt_noise_at_clamp_boundary():
    """The noise cotangent flows through the CLAMPED Cholesky values: when the
    raw diag sits below DIAG_MIN, d_eps must use the clamped vals."""
    scan_head, pallas_head = _heads(2, 1)
    params = _active_params(scan_head, jax.random.key(12))
    b = np.asarray(params["out_proj"]["b"]).copy()
    b[2] = -0.5  # diag0 raw ~ -0.5 < DIAG_MIN -> clamped
    params["out_proj"]["b"] = jnp.asarray(b)
    x0, ctx, theta, noise = _inputs(jax.random.key(13), B=3, T=4, state_dim=2)

    def make_loss(head):
        def f(eps):
            paths, _, _ = head.sample_diffusion_paths(params, x0, ctx, theta, eps, 0.1)
            return jnp.sum(paths**2)
        return f

    g_s = jax.grad(make_loss(scan_head))(noise)
    g_p = jax.grad(make_loss(pallas_head))(noise)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s), rtol=2e-4, atol=2e-5)


def test_gradient_parity_at_clamp_boundary():
    """lower_bound rule must match when the Cholesky diag sits below DIAG_MIN."""
    scan_head, pallas_head = _heads(2, 2)
    params = _active_params(scan_head, jax.random.key(4))
    # Force raw diag below the bound: large negative diag bias.
    b = np.asarray(params["out_proj"]["b"]).copy()
    b[2] = -0.5  # diag0 raw ~ -0.5 < DIAG_MIN
    params["out_proj"]["b"] = jnp.asarray(b)
    x0, ctx, theta, noise = _inputs(jax.random.key(5), B=3, T=4, state_dim=2)
    dt = 0.1

    def make_loss(head, sign):
        def f(p):
            paths, means, chols = head.sample_diffusion_paths(p, x0, ctx, theta, noise, dt)
            return jnp.sum(chols) * sign + jnp.sum(paths**2)
        return f

    for sign in (1.0, -1.0):  # exercise both branches of the pass-through rule
        g_s = jax.grad(make_loss(scan_head, sign))(params)
        g_p = jax.grad(make_loss(pallas_head, sign))(params)
        for ls, lp in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(lp), np.asarray(ls), rtol=2e-4, atol=2e-5)


def test_non_divisible_batch_padding():
    """Batch sizes that don't divide the block are padded internally."""
    scan_head, pallas_head = _heads(1, 2)
    params = _active_params(scan_head, jax.random.key(6))
    x0, ctx, theta, noise = _inputs(jax.random.key(7), B=5, T=3, state_dim=1)
    p_s, m_s, c_s = scan_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    p_p, m_p, c_p = pallas_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), rtol=1e-5, atol=1e-5)


def test_high_dim_state_parity():
    """d=32 (n_tril=528, the BASELINE ladder-5 scale): one-hot tril algebra
    must stay exact at large state dims."""
    scan_head, pallas_head = _heads(32, 1, hidden=16, context_dim=8)
    params = _active_params(scan_head, jax.random.key(8))
    x0, ctx, theta, noise = _inputs(jax.random.key(9), B=2, T=2, state_dim=32, context_dim=8)
    p_s, m_s, c_s = scan_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    p_p, m_p, c_p = pallas_head.sample_diffusion_paths(params, x0, ctx, theta, noise, 0.1)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=1e-5, atol=1e-5)

    def loss(head):
        def f(p):
            paths, means, chols = head.sample_diffusion_paths(p, x0, ctx, theta, noise, 0.1)
            return jnp.sum(paths**2) + jnp.sum(chols**2)
        return f

    g_s = jax.grad(loss(scan_head))(params)
    g_p = jax.grad(loss(pallas_head))(params)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)
