"""Split fused SiT kernels (attention half + MLP half) vs the pure-JAX block
(interpret mode, CPU, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.ops.embeddings import precompute_rope
from viforsdes_tpu.ops.pallas.sit_split import (
    FusedSplitSiTBlock,
    SplitBlockSpec,
    pack_split_weights,
)
from viforsdes_tpu.ops.initializers import linear
from viforsdes_tpu.ops.sit import SiTConfig, sit_block, sit_block_init


def _setup(idx, B=5, S=6, E=8, heads=2, mlp=12, key=0):
    cfg = SiTConfig(
        in_dim=E, hidden_dim=E, out_dim=E, cond_dim=4, num_heads=heads,
        depth=2, mlp_hidden_dim=mlp,
    )
    params = sit_block_init(jax.random.key(key), cfg, idx)
    params["cond"]["net"]["w"] = 0.2 * jax.random.normal(
        jax.random.key(key + 1), params["cond"]["net"]["w"].shape
    )
    # deliberately DIFFERENT fwd/bwd tiles to exercise independent padding
    spec = SplitBlockSpec(
        seq_len=S, embed_dim=E, num_heads=heads, mlp_hidden=mlp,
        residual_v=idx > 0, bt_attn_fwd=4, bt_attn_bwd=2, bt_mlp_fwd=2,
        bt_mlp_bwd=4, mxu_dtype="fp32", interpret=True,
    )
    rope = precompute_rope(E // heads, end=S)
    fused = FusedSplitSiTBlock(spec, rope.cos, rope.sin)

    ks = jax.random.split(jax.random.key(key + 2), 3)
    x = jax.random.normal(ks[0], (B, S, E), jnp.float32)
    cond = jax.random.normal(ks[1], (B, 4), jnp.float32)
    v0_flat = jax.random.normal(ks[2], (B, S, E), jnp.float32)
    return cfg, params, spec, fused, rope, x, cond, v0_flat


def _reference(cfg, params, idx, x, cond, rope, v0_flat):
    B, S, E = x.shape
    heads = cfg.num_heads
    dh = E // heads
    v0 = v0_flat.reshape(B, S, heads, dh) if idx > 0 else None
    out, v_state = sit_block(params, cfg, idx, x, cond=cond, rotary=rope, v0=v0)
    return out, v_state.reshape(B, S, E)


def _fused_call(fused, params, x, cond, v0_flat):
    cond_vec = linear(params["cond"]["net"], jax.nn.silu(cond))
    kw = pack_split_weights(fused.spec, params)
    return fused(kw, x, cond_vec, v0_flat)


@pytest.mark.parametrize("idx", [0, 1])
def test_forward_parity(idx):
    cfg, params, spec, fused, rope, x, cond, v0 = _setup(idx)
    want_out, want_v = _reference(cfg, params, idx, x, cond, rope, v0)
    got_out, got_v = _fused_call(fused, params, x, cond, v0)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("idx", [0, 1])
def test_gradient_parity(idx):
    cfg, params, spec, fused, rope, x, cond, v0 = _setup(idx)

    def loss_ref(params, x, cond, v0):
        out, v = _reference(cfg, params, idx, x, cond, rope, v0)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))) + 0.5 * jnp.sum(v**2)

    def loss_fused(params, x, cond, v0):
        out, v = _fused_call(fused, params, x, cond, v0)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))) + 0.5 * jnp.sum(v**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, x, cond, v0)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(params, x, cond, v0)

    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    assert len(flat_r) == len(flat_f)
    for (path, leaf_r), (_, leaf_f) in zip(flat_r, flat_f):
        if idx == 0 and "v0" in str(path):
            continue  # block 0 ignores v0
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_r), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_encoder_level_split_parity():
    """Whole-encoder split-fused path == standard SiT path (fp32, interpret)."""
    from viforsdes_tpu.config import EncoderConfig
    from viforsdes_tpu.models.encoder import ObservationContextEncoder

    def build(fused):
        return ObservationContextEncoder.build(
            1, 3,
            EncoderConfig(hidden_dim=16, cond_dim=8, num_heads=2, depth=2, fused_blocks=fused),
            obs_times=np.asarray([0.0, 1.0, 2.0]), time_horizon=2.0, time_step=0.5,
        )

    enc_std, enc_split = build("off"), build("split")
    params = enc_std.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(7), p.shape), params
    )
    obs = jnp.asarray([[2.0], [1.0], [0.5]])
    theta = jax.random.normal(jax.random.key(1), (4, 3))

    c_std = enc_std(params, obs, theta, compute_dtype=jnp.float32)
    c_split = enc_split(params, obs, theta, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c_split), np.asarray(c_std), rtol=2e-5, atol=2e-5)

    def loss(enc):
        return lambda p, th: jnp.sum(enc(p, obs, th, compute_dtype=jnp.float32) ** 2)

    gs = jax.grad(loss(enc_std), argnums=(0, 1))(params, theta)
    gf = jax.grad(loss(enc_split), argnums=(0, 1))(params, theta)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5)
