"""Whole-stack fused SiT kernel vs the pure-JAX stack (interpret mode, CPU,
fp32): forward and full gradient parity including the internal value-residual
stream and the stacked-weight gradient layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforsdes_tpu.ops.embeddings import precompute_rope
from viforsdes_tpu.ops.initializers import linear
from viforsdes_tpu.ops.pallas.sit_stack import (
    FusedSiTStack,
    SiTStackSpec,
    pack_stack_weights,
)
from viforsdes_tpu.ops.sit import SiTConfig, sit_block, sit_init


def _setup(B=5, S=6, E=8, heads=2, mlp=12, depth=3, key=0, bt_fwd=4, bt_bwd=2):
    cfg = SiTConfig(
        in_dim=E, hidden_dim=E, out_dim=E, cond_dim=4, num_heads=heads,
        depth=depth, mlp_hidden_dim=mlp,
    )
    params = sit_init(jax.random.key(key), cfg)
    # activate the zero-init adaLN + out projections so grads are non-trivial
    for bp in params["blocks"]:
        bp["cond"]["net"]["w"] = 0.2 * jax.random.normal(
            jax.random.key(key + 1), bp["cond"]["net"]["w"].shape
        )
    spec = SiTStackSpec(
        seq_len=S, embed_dim=E, num_heads=heads, mlp_hidden=mlp, depth=depth,
        bt_fwd=bt_fwd, bt_bwd=bt_bwd, mxu_dtype="fp32", interpret=True,
    )
    rope = precompute_rope(E // heads, end=S)
    fused = FusedSiTStack(spec, rope.cos, rope.sin)

    ks = jax.random.split(jax.random.key(key + 2), 2)
    x = jax.random.normal(ks[0], (B, S, E), jnp.float32)
    cond = jax.random.normal(ks[1], (B, 4), jnp.float32)
    return cfg, params, spec, fused, rope, x, cond


def _reference_blocks(cfg, params, x, cond, rope):
    """The block stack exactly as ops.sit.sit runs it (without in/out proj)."""
    tokens = x
    cached_v = None
    for idx, bp in enumerate(params["blocks"]):
        tokens, v = sit_block(bp, cfg, idx, tokens, cond=cond, rotary=rope, v0=cached_v)
        if cached_v is None:
            cached_v = v
    return tokens


def _fused_blocks(fused, params, x, cond):
    cond_all = jnp.concatenate(
        [
            linear(bp["cond"]["net"], jax.nn.silu(cond))
            for bp in params["blocks"]
        ],
        axis=-1,
    )
    kw = pack_stack_weights(fused.spec, params["blocks"])
    return fused(kw, x, cond_all)


def test_forward_parity():
    cfg, params, spec, fused, rope, x, cond = _setup()
    want = _reference_blocks(cfg, params, x, cond, rope)
    got = _fused_blocks(fused, params, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("batch", [1, 4, 5])
def test_forward_parity_odd_batches(batch):
    cfg, params, spec, fused, rope, x, cond = _setup(B=batch)
    want = _reference_blocks(cfg, params, x, cond, rope)
    got = _fused_blocks(fused, params, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_gradient_parity():
    cfg, params, spec, fused, rope, x, cond = _setup()
    weights = jnp.sin(0.1 * jnp.arange(x.size).reshape(x.shape))

    def loss_ref(params, x, cond):
        return jnp.sum(_reference_blocks(cfg, params, x, cond, rope) * weights)

    def loss_fused(params, x, cond):
        return jnp.sum(_fused_blocks(fused, params, x, cond) * weights)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, cond)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(params, x, cond)

    flat_ref, tree_ref = jax.tree.flatten(g_ref)
    flat_fused, tree_fused = jax.tree.flatten(g_fused)
    assert tree_ref == tree_fused
    paths = jax.tree_util.tree_leaves_with_path(g_ref)
    for (path, a), b in zip(paths, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_encoder_level_stack_parity():
    """Whole-encoder stack-fused path == standard SiT path (fp32, interpret)."""
    from viforsdes_tpu.config import EncoderConfig
    from viforsdes_tpu.models.encoder import ObservationContextEncoder

    def build(fused):
        return ObservationContextEncoder.build(
            1, 3,
            EncoderConfig(hidden_dim=16, cond_dim=8, num_heads=2, depth=2, fused_blocks=fused),
            obs_times=np.asarray([0.0, 1.0, 2.0]), time_horizon=2.0, time_step=0.5,
        )

    enc_std, enc_stack = build("off"), build("on")
    params = enc_std.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(7), p.shape), params
    )
    obs = jnp.asarray([[2.0], [1.0], [0.5]])
    theta = jax.random.normal(jax.random.key(1), (4, 3))

    c_std = enc_std(params, obs, theta, compute_dtype=jnp.float32)
    c_stack = enc_stack(params, obs, theta, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c_stack), np.asarray(c_std), rtol=2e-5, atol=2e-5)

    def loss(enc):
        return lambda p, th: jnp.sum(enc(p, obs, th, compute_dtype=jnp.float32) ** 2)

    gs = jax.grad(loss(enc_std), argnums=(0, 1))(params, theta)
    gf = jax.grad(loss(enc_stack), argnums=(0, 1))(params, theta)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5)


def test_single_block_stack_matches_block():
    """depth=1 degenerates to one residual_v=False block."""
    cfg, params, spec, fused, rope, x, cond = _setup(depth=1)
    want = _reference_blocks(cfg, params, x, cond, rope)
    got = _fused_blocks(fused, params, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
