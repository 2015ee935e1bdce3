"""Flash-attention dispatch and padding/masking logic.

The Mosaic kernel itself only runs on TPU (covered by TPU-gated parity in
benchmarks + the Lorenz ladder); these tests validate everything around it on
CPU: the pad-to-block + segment-mask + unpad plumbing against dense SDPA, and
the static dispatch rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.ops.flash_attention import (
    FLASH_SEQ_THRESHOLD,
    _reference_masked_attention,
    flash_sdpa,
    use_flash_attention,
)


@pytest.mark.parametrize("seq_len", [37, 512, 513, 1000])
def test_padding_and_masking_matches_dense_sdpa(seq_len):
    """flash_sdpa's pad/mask/unpad around a dense impl == plain SDPA."""
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 4, 16
    q = jax.random.normal(kq, (b, seq_len, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, seq_len, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, seq_len, h, d), dtype=jnp.float32)

    got = flash_sdpa(q, k, v, impl=_reference_masked_attention)
    want = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_padded_gradients_match_dense_sdpa():
    """Pad tokens must not leak gradient into real tokens."""
    key = jax.random.key(1)
    b, s, h, d = 2, 130, 2, 8
    x = jax.random.normal(key, (b, s, h, d), dtype=jnp.float32)

    def loss_flash(x):
        return flash_sdpa(x, x, x, impl=_reference_masked_attention).sum()

    def loss_dense(x):
        return jax.nn.dot_product_attention(x, x, x).sum()

    g_flash = jax.grad(loss_flash)(x)
    g_dense = jax.grad(loss_dense)(x)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_dense), atol=2e-5)


def test_dispatch_is_off_on_cpu():
    assert jax.default_backend() == "cpu"
    assert not use_flash_attention(FLASH_SEQ_THRESHOLD + 1)
    assert not use_flash_attention(100)


def test_splash_interpret_matches_dense():
    """The opt-in splash backend (interpret mode): padded + masked non-causal
    attention matches dense SDPA, forward and gradient."""
    from viforsdes_tpu.ops.flash_attention import _splash_sdpa

    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    b, s, h, d = 2, 230, 2, 64  # padded internally to 256
    pad = 256 - s
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)

    def splash(q, k, v):
        qh, kh, vh = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        qh, kh, vh = (
            jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0))) for t in (qh, kh, vh)
        )
        out = _splash_sdpa(qh, kh, vh, s, 1.0 / d**0.5, interpret=True)
        return jnp.swapaxes(out[:, :, :s, :], 1, 2)

    got = splash(q, k, v)
    want = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    g_got = jax.grad(lambda q: splash(q, k, v).sum())(q)
    g_want = jax.grad(lambda q: jax.nn.dot_product_attention(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=3e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="real Mosaic kernel needs TPU")
def test_flash_matches_dense_on_tpu():
    """Hardware tier: the real kernel vs dense SDPA at an odd long-grid shape."""
    kq, kk, kv = jax.random.split(jax.random.key(2), 3)
    b, s, h, d = 4, 1001, 4, 64
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.bfloat16)
    got = jax.jit(flash_sdpa)(q, k, v)
    want = jax.jit(jax.nn.dot_product_attention)(q, k, v)
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))) < 2e-2


def test_no_padding_when_block_aligned():
    """S already a multiple of the block: no segment ids, plain call."""
    calls = {}

    def spy_impl(q, k, v, segment_ids, sm_scale):
        calls["segment_ids"] = segment_ids
        calls["shape"] = q.shape
        return _reference_masked_attention(q, k, v, segment_ids, sm_scale)

    q = jnp.ones((1, 512, 2, 8))
    flash_sdpa(q, q, q, impl=spy_impl)
    assert calls["segment_ids"] is None
    assert calls["shape"] == (1, 2, 512, 8)
