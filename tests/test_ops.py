"""Primitive-op unit tests: norms, RoPE, SwiGLU, adaLN, attention, bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.ops.attention import AttentionConfig, attention, attention_init
from viforsdes_tpu.ops.bounds import lower_bound
from viforsdes_tpu.ops.cond import cond_modulator, cond_modulator_init
from viforsdes_tpu.ops.embeddings import (
    apply_rope_1d,
    precompute_rope,
    sinusoidal_embedding,
)
from viforsdes_tpu.ops.initializers import linear, linear_init
from viforsdes_tpu.ops.mlp import swiglu, swiglu_init
from viforsdes_tpu.ops.norms import layer_norm, rms_norm
from viforsdes_tpu.ops.sit import SiTConfig, sit, sit_init


class TestNorms:
    def test_rms_norm(self):
        x = jax.random.normal(jax.random.key(0), (4, 8))
        y = np.asarray(rms_norm(x))
        xn = np.asarray(x)
        want = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(y, want, rtol=1e-5)

    def test_layer_norm_nonaffine(self):
        x = jax.random.normal(jax.random.key(1), (4, 8)) * 3 + 2
        y = np.asarray(layer_norm(x))
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)

    def test_fp32_compute_under_bf16(self):
        x = (jax.random.normal(jax.random.key(2), (4, 8)) * 10).astype(jnp.bfloat16)
        y = rms_norm(x)
        assert y.dtype == jnp.bfloat16


class TestRope:
    def test_matches_complex_reference(self):
        """Real-arithmetic RoPE == the reference's complex formulation
        ([real||imag] halves, ``embeddings.py:55-74``)."""
        dim, seq = 8, 16
        tables = precompute_rope(dim, end=seq)
        x = np.random.default_rng(0).normal(size=(2, seq, dim)).astype(np.float32)

        # numpy complex oracle
        idx = np.arange(0, dim, 2, dtype=np.float64)
        inv_freq = 10000.0 ** (-idx / dim)
        angles = np.outer(np.arange(seq), inv_freq)
        freqs = np.exp(1j * angles)
        half = dim // 2
        rc = x[..., :half] + 1j * x[..., half:]
        rot = rc * freqs[None]
        want = np.concatenate([rot.real, rot.imag], axis=-1).astype(np.float32)

        got = np.asarray(apply_rope_1d(jnp.asarray(x), tables))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_partial_rotation_passthrough(self):
        tables = precompute_rope(4, end=8)  # rotates first 4 of 6 dims
        x = jax.random.normal(jax.random.key(0), (1, 8, 6))
        y = apply_rope_1d(x, tables)
        np.testing.assert_array_equal(np.asarray(y[..., 4:]), np.asarray(x[..., 4:]))

    def test_position_zero_is_identity(self):
        tables = precompute_rope(8, end=4)
        x = jax.random.normal(jax.random.key(1), (1, 4, 8))
        y = apply_rope_1d(x, tables)
        np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, 0]), rtol=1e-5)

    def test_too_long_sequence_raises(self):
        tables = precompute_rope(8, end=4)
        with pytest.raises(ValueError):
            apply_rope_1d(jnp.zeros((1, 5, 8)), tables)

    def test_sinusoidal_embedding(self):
        t = jnp.asarray([0.0, 1.0])
        e = sinusoidal_embedding(t, 8)
        assert e.shape == (2, 8)
        # t=0: sin parts 0, cos parts 1
        np.testing.assert_allclose(np.asarray(e[0, :4]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e[0, 4:]), 1.0, atol=1e-6)
        with pytest.raises(ValueError):
            sinusoidal_embedding(t, 7)


class TestSwiGLU:
    def test_manual_equivalence(self):
        params = swiglu_init(jax.random.key(0), 6, 10)
        x = jax.random.normal(jax.random.key(1), (3, 6))
        got = np.asarray(swiglu(params, x))
        h = np.asarray(linear(params["input_proj"], x))
        left, right = h[:, :10], h[:, 10:]
        silu = left / (1 + np.exp(-left)) * left / left  # silu = x*sigmoid(x)
        silu = left * (1 / (1 + np.exp(-left)))
        want = np.asarray(linear(params["output_proj"], jnp.asarray(silu * right)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCondModulator:
    def test_zero_init_gives_identity_modulation(self):
        """adaLN-Zero: at init scale=shift=gate=0 -> affine is identity, gate
        kills the branch (ref ``cond.py:24-52``)."""
        params = cond_modulator_init(jax.random.key(0), 4, 8, branches=2)
        cond = jax.random.normal(jax.random.key(1), (2, 4))
        b1, b2 = cond_modulator(params, cond, branches=2)
        x = jax.random.normal(jax.random.key(2), (2, 8))
        np.testing.assert_allclose(np.asarray(b1.affine(x)), np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b1.gate(x)), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b2.gate(x)), 0.0, atol=1e-6)


class TestLowerBound:
    def test_forward(self):
        x = jnp.asarray([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(np.asarray(lower_bound(x, 1.0)), [1.0, 1.0, 2.0])

    def test_gradient_rule(self):
        """grad passes iff x >= bound OR upstream grad < 0 (ref ``bounds.py:20-21``)."""
        def f(x, g_sign):
            return jnp.sum(lower_bound(x, 1.0) * g_sign)

        x = jnp.asarray([0.5, 2.0, 0.5, 2.0])
        g_sign = jnp.asarray([1.0, 1.0, -1.0, -1.0])
        grads = jax.grad(f)(x, g_sign)
        # below bound + positive grad -> blocked; others pass
        np.testing.assert_allclose(np.asarray(grads), [0.0, 1.0, -1.0, -1.0])


class TestAttention:
    def test_shapes_and_value_state(self):
        cfg = AttentionConfig(embed_dim=16, num_heads=4)
        params = attention_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        out, v = attention(params, cfg, x)
        assert out.shape == (2, 5, 16)
        assert v.shape == (2, 5, 4, 4)

    def test_gate_is_half_at_init(self):
        """Zero-init gate proj -> sigmoid(0)=0.5 multiplies attention output
        (ref ``attn.py:52-54``)."""
        cfg_g = AttentionConfig(embed_dim=16, num_heads=4, gate=True)
        cfg_ng = AttentionConfig(embed_dim=16, num_heads=4, gate=False)
        params = attention_init(jax.random.key(0), cfg_g)
        params_ng = {k: v for k, v in params.items() if k != "gate_proj"}
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        out_g, _ = attention(params, cfg_g, x)
        out_ng, _ = attention(params_ng, cfg_ng, x)
        # out = W_o(0.5*attn) + b; out_ng = W_o(attn) + b  =>  out_g - b = 0.5*(out_ng - b)
        b = np.asarray(params["out_proj"]["b"])
        np.testing.assert_allclose(
            np.asarray(out_g) - b, 0.5 * (np.asarray(out_ng) - b), rtol=1e-4, atol=1e-5
        )

    def test_matches_naive_sdpa(self):
        """Our attention (no rope/gate/norm) == softmax(qk/sqrt(d))v einsum."""
        cfg = AttentionConfig(embed_dim=8, num_heads=2, qk_norm=False, gate=False)
        params = attention_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (1, 6, 8))
        out, _ = attention(params, cfg, x)

        qkv = np.asarray(linear(params["qkv_proj"], x))
        q, k, v = np.split(qkv, 3, axis=-1)
        q = q.reshape(1, 6, 2, 4).transpose(0, 2, 1, 3)
        k = k.reshape(1, 6, 2, 4).transpose(0, 2, 1, 3)
        v = v.reshape(1, 6, 2, 4).transpose(0, 2, 1, 3)
        logits = q @ k.transpose(0, 1, 3, 2) / 2.0
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        attn = (w @ v).transpose(0, 2, 1, 3).reshape(1, 6, 8)
        want = np.asarray(linear(params["out_proj"], jnp.asarray(attn)))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_residual_v_mixing(self):
        cfg = AttentionConfig(embed_dim=8, num_heads=2, residual_v=True)
        params = attention_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (1, 4, 8))
        v0 = jax.random.normal(jax.random.key(2), (1, 4, 2, 4))
        _, v_mixed = attention(params, cfg, x, v0=v0)
        _, v_plain = attention(params, cfg, x, v0=None)
        want = 0.5 * np.asarray(v_plain) + 0.5 * np.asarray(v0)
        np.testing.assert_allclose(np.asarray(v_mixed), want, rtol=1e-5, atol=1e-6)

    def test_v0_shape_mismatch_raises(self):
        cfg = AttentionConfig(embed_dim=8, num_heads=2, residual_v=True)
        params = attention_init(jax.random.key(0), cfg)
        x = jnp.zeros((1, 4, 8))
        with pytest.raises(ValueError):
            attention(params, cfg, x, v0=jnp.zeros((1, 3, 2, 4)))

    def test_flash_kernel_layout_branch_matches_dense(self, monkeypatch):
        """The flash branch (QK-norm + RoPE + gate in [B, H, S, D] kernel
        layout, round-3 layout change) == the dense [B, S, H, D] branch,
        values AND gradients, with a dense impl standing in for the Mosaic
        kernel on CPU."""
        import functools
        import importlib

        # ops/__init__ re-exports the `attention` FUNCTION under the same
        # name as the submodule, so plain `import ... as` binds the function
        attn_mod = importlib.import_module("viforsdes_tpu.ops.attention")
        from viforsdes_tpu.ops.flash_attention import (
            _reference_masked_attention,
            flash_sdpa,
        )
        from viforsdes_tpu.ops.embeddings import precompute_rope

        cfg = AttentionConfig(embed_dim=16, num_heads=4, residual_v=True)
        params = attention_init(jax.random.key(0), cfg)
        params["gate_proj"]["w"] = 0.3 * jax.random.normal(
            jax.random.key(5), params["gate_proj"]["w"].shape
        )
        s = 37  # not block-aligned: exercises the pad/mask path too
        rope = precompute_rope(4, end=s)
        x = jax.random.normal(jax.random.key(1), (2, s, 16))
        v0_bshd = jax.random.normal(jax.random.key(2), (2, s, 4, 4))

        def loss_dense(x, v0):
            out, v = attention(params, cfg, x, rotary=rope, v0=v0)
            return jnp.sum(out**2) + jnp.sum(jnp.sin(v)), (out, v)

        (l_dense, (out_dense, v_dense)), g_dense = jax.value_and_grad(
            loss_dense, argnums=(0, 1), has_aux=True
        )(x, v0_bshd)

        monkeypatch.setattr(attn_mod, "use_flash_attention", lambda s_: True)
        monkeypatch.setattr(
            attn_mod,
            "flash_sdpa",
            functools.partial(flash_sdpa, impl=_reference_masked_attention),
        )

        v0_bhsd = jnp.swapaxes(v0_bshd, 1, 2)

        def loss_flash(x, v0):
            out, v = attention(params, cfg, x, rotary=rope, v0=v0)
            # v state is [B, H, S, D] on the flash path
            return jnp.sum(out**2) + jnp.sum(jnp.sin(v)), (out, v)

        (l_flash, (out_flash, v_flash)), g_flash = jax.value_and_grad(
            loss_flash, argnums=(0, 1), has_aux=True
        )(x, v0_bhsd)

        np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_dense), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(v_flash, 1, 2)), np.asarray(v_dense), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(float(l_flash), float(l_dense), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(g_flash[0]), np.asarray(g_dense[0]), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(g_flash[1], 1, 2)), np.asarray(g_dense[1]), rtol=3e-4, atol=3e-5
        )

class TestDenseRematSDPA:
    def test_matches_dot_product_attention(self):
        """_dense_sdpa_remat == jax.nn.dot_product_attention, values + grads
        (same math, different residual policy)."""
        from viforsdes_tpu.ops.attention import _dense_sdpa_remat

        kq, kk, kv, kc = jax.random.split(jax.random.key(9), 4)
        b, s, h, d = 2, 23, 4, 16
        q = jax.random.normal(kq, (b, s, h, d))
        k = jax.random.normal(kk, (b, s, h, d))
        v = jax.random.normal(kv, (b, s, h, d))
        ct = jax.random.normal(kc, (b, s, h, d))

        got = _dense_sdpa_remat(q, k, v)
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

        def loss(fn, q, k, v):
            return jnp.sum(fn(q, k, v) * ct)

        g_got = jax.grad(lambda *a: loss(_dense_sdpa_remat, *a), argnums=(0, 1, 2))(q, k, v)
        g_want = jax.grad(
            lambda *a: loss(jax.nn.dot_product_attention, *a), argnums=(0, 1, 2)
        )(q, k, v)
        for gg, gw in zip(g_got, g_want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=3e-6)


class TestSiT:
    def _cfg(self):
        return SiTConfig(
            in_dim=8, hidden_dim=8, out_dim=8, cond_dim=4, num_heads=2, depth=3,
            mlp_hidden_dim=16,
        )

    def test_shapes(self):
        cfg = self._cfg()
        params = sit_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 6, 8))
        cond = jax.random.normal(jax.random.key(2), (2, 6, 4))
        out = sit(params, cfg, x, cond=cond)
        assert out.shape == (2, 6, 8)

    def test_adaln_zero_makes_blocks_identity_at_init(self):
        """With zero-init modulators, every block's gate is 0 so the stack is
        input_proj -> output_proj only."""
        cfg = self._cfg()
        params = sit_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 6, 8))
        cond = jax.random.normal(jax.random.key(2), (2, 6, 4))
        out = sit(params, cfg, x, cond=cond)
        want = linear(params["output_proj"], linear(params["input_proj"], x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_grad_flows_to_all_params(self):
        cfg = self._cfg()
        params = sit_init(jax.random.key(3), cfg)
        # Perturb the zero-init cond nets so gates are active.
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(jax.random.key(9), p.shape), params
        )
        x = jax.random.normal(jax.random.key(1), (2, 6, 8))
        cond = jax.random.normal(jax.random.key(2), (2, 6, 4))
        grads = jax.grad(lambda p: jnp.sum(sit(p, cfg, x, cond=cond) ** 2))(params)
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
        assert all(n > 0 for n in norms), "some params receive zero gradient"


class TestSiTRemat:
    def test_remat_matches_plain(self):
        """jax.checkpoint'd blocks (long-grid memory fix) are bit-compatible."""
        cfg = SiTConfig(
            in_dim=8, hidden_dim=8, out_dim=8, cond_dim=4, num_heads=2, depth=3,
            mlp_hidden_dim=16,
        )
        params = sit_init(jax.random.key(0), cfg)
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(jax.random.key(9), p.shape), params
        )
        x = jax.random.normal(jax.random.key(1), (2, 6, 8))
        cond = jax.random.normal(jax.random.key(2), (2, 4))
        out_plain = sit(params, cfg, x, cond=cond, remat=False)
        out_remat = sit(params, cfg, x, cond=cond, remat=True)
        np.testing.assert_allclose(np.asarray(out_remat), np.asarray(out_plain), rtol=1e-6)
        g1 = jax.grad(lambda p: jnp.sum(sit(p, cfg, x, cond=cond, remat=False) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(sit(p, cfg, x, cond=cond, remat=True) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

