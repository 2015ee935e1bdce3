"""Blockwise (flash) attention for long grids.

Motivation (SURVEY §5.7, VERDICT round-1 item 5): the encoder's non-causal
SDPA materializes ``[B, H, S, S]`` attention probabilities. At the Lorenz-63
ladder shape (B=32, H=4, S=2001) that is ~1 GB *per block per pass* of HBM
traffic — the step is bandwidth-bound on probabilities alone. A blockwise
kernel keeps the online-softmax state in VMEM and never writes the S² matrix,
making attention O(S) in memory.

The kernel itself is ``jax.experimental.pallas.ops.tpu.flash_attention`` —
JAX's own Mosaic flash kernel (fwd + custom-VJP bwd, segment-id masking).
This module owns the framework-facing contract:

- layout: our attention keeps ``[B, S, H, D]`` end-to-end; the kernel wants
  ``[B, H, S, D]``;
- padding: the grid length is ``round(T/dt)+1`` (odd, e.g. 2001); the kernel
  requires S divisible by its 512-wide blocks. We pad to the next multiple
  and mask the pad tokens with segment ids (pad queries attend only to pad
  keys, and are sliced off afterwards);
- scale: ``1/sqrt(head_dim)`` to match ``jax.nn.dot_product_attention``.

The pure pad/mask/unpad plumbing is CPU-testable by injecting a dense masked
reference impl (``_reference_masked_attention``); the real kernel is covered
by TPU-gated parity tests and the Lorenz ladder run.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp

Array = jax.Array

# The Mosaic flash kernel tiles S into 512-wide major blocks; pad to this.
_FLASH_BLOCK = 512

# Below this grid length the dense XLA path is faster (probs fit comfortably
# and the kernel's fixed overhead + padding waste dominate); above it, probs
# spill to HBM and blockwise wins.
FLASH_SEQ_THRESHOLD = 512


def use_flash_attention(seq_len: int) -> bool:
    """Static dispatch: real Mosaic kernel only on TPU, only for long grids.

    Default ON for long grids: with tuned block sizes the full Lorenz train
    step measured 237 ms flash vs 304 ms dense, interleaved same-process
    (profile_longgrid.py, v5e-1). ``VIFORSDES_DISABLE_FLASH=1`` force-disables
    (benchmark A/B knob).
    """
    if os.environ.get("VIFORSDES_DISABLE_FLASH"):
        return False
    return seq_len > FLASH_SEQ_THRESHOLD and jax.default_backend() == "tpu"


def _pick_block(s_padded: int) -> int:
    """Largest tuned block size that divides the padded sequence length.

    Both kernels require their block sizes to divide the (padded) sequence
    length; padding is to a multiple of ``_FLASH_BLOCK`` (512), so 1024-wide
    blocks (the tuned fast config) are only legal when the padded length is an
    even multiple of 512. Grids padding to an odd multiple (e.g. S=1100 ->
    1536) fall back to 512-wide blocks rather than crashing at trace time.
    """
    if s_padded <= 1024:
        return s_padded
    return 1024 if s_padded % 1024 == 0 else _FLASH_BLOCK


def _reference_masked_attention(q, k, v, segment_ids, sm_scale):
    """Dense masked SDPA with the kernel's signature, for CPU tests.

    q/k/v are ``[B, H, S, D]``; segment_ids masks cross-segment attention
    exactly like the Mosaic kernel does.
    """
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    if segment_ids is not None:
        mask = segment_ids.q[:, None, :, None] == segment_ids.kv[:, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _kernel():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


@functools.lru_cache(maxsize=None)
def _dqfix_fork():
    """Guarded import of the fixed flash fork (round-3 verdict weak #3).

    ``ops/pallas/flash_fixed.py`` reuses PRIVATE kernel symbols from
    ``jax.experimental.pallas.ops.tpu.flash_attention`` (lifted from jax
    0.8.x); an upstream refactor must degrade the default training path to
    the library kernel with a loud warning — never brick it at import time.
    Returns the fork's entry point, or None when unavailable.
    """
    try:
        from viforsdes_tpu.ops.pallas.flash_fixed import flash_attention_dqfix

        return flash_attention_dqfix
    except Exception as exc:
        warnings.warn(
            "viforsdes_tpu: the flash_fixed fork failed to import "
            f"({type(exc).__name__}: {exc}); falling back to the library "
            "flash_attention. Training still works but re-adds the di "
            "broadcast + l/m relayout traffic (~6% of the Lorenz-63 step, "
            "BASELINE.md).",
            RuntimeWarning,
            stacklevel=2,
        )
        return None


@functools.lru_cache(maxsize=None)
def _splash_kernel(s_padded: int, num_heads: int, interpret: bool):
    """Build a cached splash-attention kernel for a padded sequence length.

    Splash wins isolated benchmarks (12.39 vs 14.45 ms at (32, 4, 2048, 64);
    161.4 vs 179.8 ms encoder fwd+bwd) but LOSES badly inside the full jitted
    train step (533.6 vs 191 ms Lorenz step) — kept opt-in via
    VIFORSDES_SPLASH=1 until that lowering pathology is understood.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    blk = _pick_block(s_padded)
    mask = sm.MultiHeadMask([sm.FullMask((s_padded, s_padded))] * num_heads)
    # flash_sdpa may be tracing when the cache misses: keep the kernel's own
    # setup arrays concrete so nothing traced leaks into the cached object
    with jax.ensure_compile_time_eval():
        kernel = sk.make_splash_mha(
            mask,
            head_shards=1,
            q_seq_shards=1,
            block_sizes=sk.BlockSizes(
                block_q=blk, block_kv=blk, block_kv_compute=blk,
                block_q_dkv=blk, block_kv_dkv=blk, block_kv_dkv_compute=blk,
                block_q_dq=blk, block_kv_dq=blk,
            ),
            interpret=interpret,
        )
    return kernel, sk


def _splash_sdpa(qh, kh, vh, real_len: int, sm_scale: float, *, interpret=False):
    """Non-causal splash attention over padded [B, H, S_pad, D] tensors.

    sm_scale is folded into q (splash applies no scale itself); pad tokens
    are masked with per-example segment ids (identical for every example
    since padding is uniform).
    """
    s_padded = qh.shape[2]
    kernel, sk = _splash_kernel(s_padded, qh.shape[1], interpret)
    segment_ids = None
    if real_len != s_padded:
        seg = jnp.zeros((s_padded,), dtype=jnp.int32).at[real_len:].set(1)
        segment_ids = sk.SegmentIds(q=seg, kv=seg)
    qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
    return jax.vmap(
        lambda q, k, v: kernel(q, k, v, segment_ids=segment_ids)
    )(qs, kh, vh)


def flash_sdpa(
    q: Array, k: Array, v: Array, *, impl=None, kernel_layout: bool = False,
    real_len: int | None = None,
) -> Array:
    """Non-causal flash attention over ``[B, S, H, D]`` tensors.

    Pads the sequence axis to a multiple of the kernel block, masks the pad
    via segment ids, and slices the pad back off. ``impl`` injects a dense
    reference implementation for CPU tests; ``None`` selects the Mosaic
    kernel. ``kernel_layout=True`` means the caller already passes (and wants
    back) ``[B, H, S, D]`` — the Mosaic kernel's native layout — skipping the
    boundary transposes (the round-3 trace showed the per-block layout
    round-trips costing several ms/step at the Lorenz shape, BASELINE.md).

    ``real_len`` supports the hoisted-padding token stream (round 5): the
    caller already padded the sequence axis to a block multiple ONCE at the
    encoder level (instead of this function padding q/k/v around every kernel
    call), and only the first ``real_len`` positions are real. Tokens past
    ``real_len`` are masked exactly like locally-added padding (segment 1)
    and the output keeps the caller's padded length (the caller slices once).
    """
    if kernel_layout:
        b, h, s, d = q.shape
        qh, kh, vh = q, k, v
    else:
        b, s, h, d = q.shape
        # [B, S, H, D] -> [B, H, S, D]
        qh, kh, vh = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    sm_scale = 1.0 / (d**0.5)

    valid = s if real_len is None else real_len
    pad = (-s) % _FLASH_BLOCK
    segment_ids = None
    if pad:
        qh, kh, vh = (
            jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0))) for t in (qh, kh, vh)
        )
    if pad or valid < s:
        # Real tokens are segment 0, pad tokens segment 1: pad queries attend
        # only to pad keys (their rows are discarded/ignored downstream),
        # real queries never see pad keys.
        seg = jnp.zeros((b, s + pad), dtype=jnp.int32).at[:, valid:].set(1)
        fa = _kernel()
        segment_ids = fa.SegmentIds(q=seg, kv=seg)

    # Splash stays OPT-IN (VIFORSDES_SPLASH=1): it wins the encoder-only
    # interleaved benchmark (fwd+bwd 161.4 ms vs flash 179.8 ms, gradients
    # agreeing to bf16 tolerance) but the FULL jitted Lorenz train step
    # measured 533.6 ms with splash vs 191 ms with flash — something about
    # its lowering inside the big donated train-step program is pathological.
    # Do not flip without measuring the full step.
    if impl is None and os.environ.get("VIFORSDES_SPLASH") == "1":
        out = _splash_sdpa(qh, kh, vh, valid, sm_scale)
        if pad:
            out = out[:, :, :s, :]
        return out if kernel_layout else jnp.swapaxes(out, 1, 2)

    if impl is None:
        fa = _kernel()
        # Tuned block sizes: the library defaults measured 56.6 ms fwd+bwd at
        # (32, 4, 2048, 64) on v5e-1 vs 13.1 ms with 1024-wide blocks
        # (benchmarks/profile_flash_sweep.py); 2048-wide fails to compile
        # (VMEM). Scale down for shorter padded grids; the block must divide
        # the padded length (odd 512-multiples fall back to 512-wide blocks).
        blk = _pick_block(qh.shape[2])
        bs = fa.BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
            block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
            block_q_dq=blk,
        )
        # The dq backward runs through the fixed fork (ops/pallas/
        # flash_fixed.py): the library broadcasts `di` to block_k_major width
        # before launch but the kernel reads only MIN_BLOCK_SIZE columns —
        # 13.5 ms/step of never-read HBM writes at the Lorenz shape
        # (round-3 trace, BASELINE.md). VIFORSDES_FLASH_DQFIX=0 restores the
        # library path (A/B knob).
        fork = (
            _dqfix_fork()
            if os.environ.get("VIFORSDES_FLASH_DQFIX", "1") == "1"
            else None
        )
        if fork is not None:
            out = fork(
                qh, kh, vh, segment_ids=segment_ids, sm_scale=sm_scale,
                block_sizes=bs,
            )
        else:
            out = fa.flash_attention(
                qh, kh, vh, segment_ids=segment_ids, sm_scale=sm_scale,
                block_sizes=bs,
            )
    else:
        out = impl(qh, kh, vh, segment_ids, sm_scale)

    if pad:
        out = out[:, :, :s, :]
    return out if kernel_layout else jnp.swapaxes(out, 1, 2)
