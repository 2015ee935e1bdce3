"""Fused QK-prep kernel (RMS-norm + RoPE) vs the unfused composition.

Interpret mode on CPU; the composition is the exact code the flash path used
before the fusion (ops/norms.py rms_norm -> ops/embeddings.py apply_rope_1d),
so these tests pin both values and gradients to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.ops.embeddings import apply_rope_1d, precompute_rope
from viforsdes_tpu.ops.norms import rms_norm
from viforsdes_tpu.ops.pallas.qk_prep import qk_prep

EPS = 1e-6


def _composition(x, tables):
    return apply_rope_1d(rms_norm(x, eps=EPS), tables)


@pytest.mark.parametrize("s", [64, 230, 701])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_composition(s, dtype):
    b, h, d = 2, 3, 32
    tables = precompute_rope(d, end=s)
    x = jax.random.normal(jax.random.key(0), (b, h, s, d), dtype)
    got = qk_prep(x, tables.cos, tables.sin, EPS, True)
    want = _composition(x, tables)
    atol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


def test_forward_ragged_block():
    """S not a multiple of the 512 block: the masked tail must be exact."""
    b, h, s, d = 1, 2, 1001, 64
    tables = precompute_rope(d, end=s)
    x = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.float32)
    got = qk_prep(x, tables.cos, tables.sin, EPS, True)
    want = _composition(x, tables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("s", [96, 701])
def test_gradient_matches_composition(s):
    b, h, d = 2, 2, 32
    tables = precompute_rope(d, end=s)
    x = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.float32)

    def loss_fused(x):
        return jnp.sum(qk_prep(x, tables.cos, tables.sin, EPS, True) * ct)

    def loss_comp(x):
        return jnp.sum(_composition(x, tables) * ct)

    g_fused = jax.grad(loss_fused)(x)
    g_comp = jax.grad(loss_comp)(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_comp), rtol=2e-5, atol=2e-6
    )


def test_tables_get_zero_cotangent():
    s, d = 64, 32
    tables = precompute_rope(d, end=s)
    x = jax.random.normal(jax.random.key(4), (1, 1, s, d), jnp.float32)
    g = jax.grad(
        lambda c: jnp.sum(qk_prep(x, c, tables.sin, EPS, True))
    )(tables.cos)
    assert float(jnp.max(jnp.abs(g))) == 0.0
