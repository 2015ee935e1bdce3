"""Hoisted-padding token stream (round 5): values and gradients are exact.

The encoder pads its token grid ONCE to the flash block multiple (instead of
``flash_sdpa`` padding q/k/v around every kernel call) and slices the context
back at the end; attention isolates pad tokens via segment masking. These
tests force the hoist on CPU (``VIFORSDES_PAD_HOIST=force``) and assert the
encoder's outputs AND parameter gradients match the unhoisted path exactly
(the pad tokens receive zero cotangent, so ``dW = x^T dy`` accumulates
exact zeros for pad rows).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viforsdes_tpu.config import EncoderConfig
from viforsdes_tpu.models.encoder import ObservationContextEncoder
from viforsdes_tpu.ops.flash_attention import (
    _reference_masked_attention,
    flash_sdpa,
)

BATCH = 3
OBS_DIM = 2
PARAM_DIM = 3


def _build_encoder():
    return ObservationContextEncoder.build(
        OBS_DIM,
        PARAM_DIM,
        EncoderConfig(hidden_dim=32, cond_dim=16, num_heads=2, depth=2),
        obs_times=np.array([0.0, 1.0, 2.0, 3.0]),
        time_horizon=3.0,
        time_step=0.1,  # n_grid = 31, pads to 512 under the hoist
    )


@pytest.fixture(scope="module")
def setup():
    enc = _build_encoder()
    params = enc.init(jax.random.key(0))
    # adaLN-Zero inits every block to identity — perturb the modulators so
    # attention (and therefore the pad masking) actually shapes the output
    for i, bp in enumerate(params["sit"]["blocks"]):
        bp["cond"]["net"]["w"] = 0.3 * jax.random.normal(
            jax.random.key(10 + i), bp["cond"]["net"]["w"].shape, jnp.float32
        )
    obs = jax.random.normal(jax.random.key(1), (4, OBS_DIM), jnp.float32)
    theta = jax.random.normal(jax.random.key(2), (BATCH, PARAM_DIM), jnp.float32)
    return enc, params, obs, theta


def _run(enc, params, obs, theta, monkeypatch, mode):
    monkeypatch.setenv("VIFORSDES_PAD_HOIST", mode)
    return enc(params, obs, theta, compute_dtype=jnp.float32)


def test_forward_matches_unhoisted(setup, monkeypatch):
    enc, params, obs, theta = setup
    base = _run(enc, params, obs, theta, monkeypatch, "0")
    hoisted = _run(enc, params, obs, theta, monkeypatch, "force")
    assert base.shape == hoisted.shape == (BATCH, enc.n_grid, 32)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(base), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_unhoisted(setup, monkeypatch):
    enc, params, obs, theta = setup
    w = jax.random.normal(jax.random.key(3), (BATCH, enc.n_grid, 32))

    def loss(p, mode):
        monkeypatch.setenv("VIFORSDES_PAD_HOIST", mode)
        return jnp.sum(enc(p, obs, theta, compute_dtype=jnp.float32) * w)

    g_base = jax.grad(lambda p: loss(p, "0"))(params)
    g_hoist = jax.grad(lambda p: loss(p, "force"))(params)
    flat_b, _ = jax.tree_util.tree_flatten(g_base)
    flat_h, _ = jax.tree_util.tree_flatten(g_hoist)
    for a, b in zip(flat_b, flat_h):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_flash_sdpa_real_len_masks_pad_tokens():
    """flash_sdpa(real_len=L) on a pre-padded stream == dense SDPA on [:L]."""
    b, h, s, d, L = 2, 2, 512, 8, 37
    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)

    out = flash_sdpa(
        q, k, v, impl=_reference_masked_attention, kernel_layout=True,
        real_len=L,
    )
    ref = _reference_masked_attention(
        q[:, :, :L], k[:, :, :L], v[:, :, :L], None, 1.0 / d**0.5
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, :L]), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
