"""Fused Pallas TPU kernel for the recurrent diffusion path sampler.

TPU-native replacement for the reference's Triton kernel family
(``kernels/forward.py:91-376``, ``kernels/backward.py:156-624``,
``kernels/autograd.py:13-268``). Same math, different mapping to hardware:

- **Batch-tiled, not one-program-per-trajectory**: the reference runs one GPU
  program per path with scalar-loop matvecs; here each grid step processes a
  whole batch tile so every projection is a proper MXU matmul
  ``[B_tile, in] @ [in, 3H]`` (SURVEY §7.3 item 2).
- **Grid = (batch_tiles, T / TC)**: TPU grids execute sequentially, so the
  time recurrence lives in the grid's inner dimension; each grid step
  processes a chunk of TC consecutive time steps (statically unrolled) so the
  per-step DMA/loop overhead is amortized TC-fold, while Pallas's automatic
  pipelining double-buffers the chunked HBM streams. Carried state
  (x_t, h layers) lives in VMEM scratch persisting across grid steps.
- **No atomics in backward**: the reference accumulates weight grads across
  GPU programs with ``tl.atomic_add`` (non-deterministic fp32 sums). Here the
  sequential grid accumulates weight grads into output blocks that stay
  resident in VMEM for the whole kernel — bitwise deterministic.
- **Tril algebra as one-hot matmuls**: with static row/col one-hot matrices R
  [n_tril, D] and C [n_tril, D], ``L @ eps = ((vals * (eps @ C^T)) @ R)`` and
  the backward outer-product is ``(dx @ R^T) * (eps @ C^T)``. No D x D
  materialization, no per-entry scalar loops (the reference unrolls scalar
  loops per tril entry, ``forward.py:334-363``), and no layer cap (the
  reference hard-caps ``MAX_LAYERS=4``, ``kernels/constants.py:13``).
- **Recompute-based BPTT**: only h_t per layer is stashed (plus the raw tril
  row); gates (r, z, n) are recomputed in the backward from h_{t-1} — 5x less
  residual bandwidth than the reference's full activation stash
  (``forward.py:240-256``), trading one extra cell matmul per step.

The input projections for context and theta are hoisted OUT of the kernel
entirely (one big ``[B*T, C] @ [C, 3H]`` XLA matmul) and enter as the
precomputed ``gates_const`` stream; the kernel only projects the tiny state
input and the recurrent weights. fp32 throughout (ref ``autograd.py:80-87``).

The ``lower_bound`` gradient rule (pass iff ``raw >= bound`` OR ``g < 0``) is
applied in-kernel to the SUMMED Cholesky cotangent (path + ELBO uses), exactly
like the reference backward (``backward.py:324-334``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_chunk(n_steps: int, max_chunk: int) -> int:
    """Largest divisor of n_steps that is <= max_chunk (no masking needed)."""
    for tc in range(min(max_chunk, n_steps), 0, -1):
        if n_steps % tc == 0:
            return tc
    return 1


# Per-kernel VMEM budget for the double-buffered streams (the 16 MB scoped
# limit must also hold weights, scratch, and live temporaries).
_STREAM_VMEM_BUDGET = 6_000_000


def _fit_chunk_and_block(n_steps: int, max_chunk: int, block_b: int, lanes: int):
    """Shrink (t_chunk, block_b) until the double-buffered stream blocks fit
    the VMEM budget — stream width grows with state_dim (n_tril ~ d^2/2), so
    a fixed chunk OOMs large-d configs."""
    while True:
        tc = _pick_chunk(n_steps, max_chunk)
        while tc > 1 and tc * block_b * lanes * 4 * 2 > _STREAM_VMEM_BUDGET:
            max_chunk = tc - 1
            tc = _pick_chunk(n_steps, max_chunk)
        if tc * block_b * lanes * 4 * 2 <= _STREAM_VMEM_BUDGET or block_b <= 8:
            return tc, block_b
        block_b = max(8, block_b // 2)


class SamplerSpec(NamedTuple):
    """Static configuration of one fused-sampler instantiation."""

    state_dim: int
    hidden_dim: int
    num_layers: int
    time_step: float
    diag_min: float
    block_b: int = 128
    max_t_chunk: int = 10
    # the backward streams ~5x more bytes per step (h, raw, three cotangents),
    # so its chunk is kept smaller to fit the VMEM budget
    max_t_chunk_bwd: int = 5
    interpret: bool = False
    # "full" = lower-triangular Cholesky (n_tril = d(d+1)/2 outputs);
    # "diag" = diagonal transition scale (d outputs). The kernel body is
    # index-generic — diag mode is R = C = I with every entry clamped — so
    # both modes share the same fwd/bwd kernels.
    cholesky: str = "full"

    @property
    def n_tril(self) -> int:
        if self.cholesky == "diag":
            return self.state_dim
        return self.state_dim * (self.state_dim + 1) // 2


def _tril_onehots(
    d: int, cholesky: str = "full"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """R[k] = one-hot(row_k), C[k] = one-hot(col_k), diag mask [n_tril].

    ``cholesky="diag"``: k indexes the diagonal only, so R = C = I and the
    whole mask is True — ``((vals * (eps @ C^T)) @ R)`` reduces to
    ``vals * eps``."""
    if cholesky == "diag":
        rows = cols = np.arange(d)
    else:
        rows, cols = np.tril_indices(d)
    n = len(rows)
    R = np.zeros((n, d), np.float32)
    C = np.zeros((n, d), np.float32)
    R[np.arange(n), rows] = 1.0
    C[np.arange(n), cols] = 1.0
    return R, C, (rows == cols)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# =============================================================== forward ====


def _fwd_kernel(
    spec: SamplerSpec,
    tc: int,
    save_h: bool,
    # refs: inputs
    x0_ref,
    gc_ref,
    eps_ref,
    w_x_ref,
    w_hh0_ref,
    b_hh0_ref,
    w_ih_st_ref,
    w_hh_st_ref,
    b_ih_st_ref,
    b_hh_st_ref,
    w_out_ref,
    b_out_ref,
    R_ref,
    C_ref,
    diag_ref,
    # refs: outputs
    paths_ref,
    raw_ref,
    *rest,
):
    if save_h:
        h_all_ref, x_s, h_s = rest
    else:
        (x_s, h_s) = rest

    d = spec.state_dim
    h = spec.hidden_dim
    L = spec.num_layers
    dt = spec.time_step
    sqrt_dt = spec.time_step**0.5
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x_s[:] = x0_ref[:]
        h_s[:] = jnp.zeros_like(h_s)

    def cell(gi, h_prev, w_hh, b_hh):
        gh = _dot(h_prev, w_hh) + b_hh
        r = jax.nn.sigmoid(gi[:, :h] + gh[:, :h])
        z = jax.nn.sigmoid(gi[:, h : 2 * h] + gh[:, h : 2 * h])
        n = jnp.tanh(gi[:, 2 * h :] + r * gh[:, 2 * h :])
        return (1.0 - z) * n + z * h_prev

    x = x_s[:]
    hs = h_s[:]
    w_x = w_x_ref[:]
    w_hh0 = w_hh0_ref[:]
    b_hh0 = b_hh0_ref[0, :]
    w_out = w_out_ref[:]
    b_out = b_out_ref[0, :]
    diag = diag_ref[0, :]
    Rm = R_ref[:]
    Cm = C_ref[:]

    for i in range(tc):
        gates0 = gc_ref[i] + _dot(x, w_x)
        h_new = cell(gates0, hs[:, :h], w_hh0, b_hh0)
        new_cols = [h_new]
        h_in = h_new
        for layer in range(1, L):
            li = layer - 1
            gi = _dot(h_in, w_ih_st_ref[li]) + b_ih_st_ref[li]
            h_new_l = cell(
                gi, hs[:, layer * h : (layer + 1) * h], w_hh_st_ref[li], b_hh_st_ref[li]
            )
            new_cols.append(h_new_l)
            h_in = h_new_l
        hs = new_cols[0] if L == 1 else jnp.concatenate(new_cols, axis=-1)

        out = _dot(h_in, w_out) + b_out
        mu = out[:, :d]
        raw_tril = out[:, d:]
        vals = jnp.where(diag > 0, jnp.maximum(raw_tril, spec.diag_min), raw_tril)

        eps = eps_ref[i]
        eps_c = _dot(eps, Cm.T)
        l_eps = _dot(vals * eps_c, Rm)

        x = x + mu * dt + l_eps * sqrt_dt
        paths_ref[i] = x
        raw_ref[i] = out
        if save_h:
            h_all_ref[i] = hs

    x_s[:] = x
    h_s[:] = hs


# =============================================================== backward ===


def _bwd_kernel(
    spec: SamplerSpec,
    tc: int,
    n_chunks: int,
    # refs: inputs
    gc_ref,
    eps_ref,
    x_ref,  # paths_full[t] = input state of step t, chunked
    h_cur_ref,
    h_prevchunk_ref,
    raw_ref,
    d_paths_ref,
    d_means_ref,
    d_cholv_ref,
    w_x_ref,
    w_hh0_ref,
    b_hh0_ref,
    w_ih_st_ref,
    w_hh_st_ref,
    b_ih_st_ref,
    b_hh_st_ref,
    w_out_ref,
    b_out_ref,
    R_ref,
    C_ref,
    diag_ref,
    # refs: outputs
    d_gc_ref,
    d_eps_ref,
    d_x0_ref,
    d_w_x_ref,
    d_w_hh0_ref,
    d_b_hh0_ref,
    d_w_ih_st_ref,
    d_w_hh_st_ref,
    d_b_ih_st_ref,
    d_b_hh_st_ref,
    d_w_out_ref,
    d_b_out_ref,
    # scratch
    dx_s,
    dh_s,
):
    d = spec.state_dim
    h = spec.hidden_dim
    L = spec.num_layers
    dt = spec.time_step
    sqrt_dt = spec.time_step**0.5
    b_idx = pl.program_id(0)
    c = pl.program_id(1)
    chunk = n_chunks - 1 - c  # the chunk of time steps being differentiated

    @pl.when(c == 0)
    def _init_tile():
        dx_s[:] = jnp.zeros_like(dx_s)
        dh_s[:] = jnp.zeros_like(dh_s)
        d_x0_ref[:] = jnp.zeros_like(d_x0_ref)

    @pl.when((c == 0) & (b_idx == 0))
    def _init_accums():
        d_w_x_ref[:] = jnp.zeros_like(d_w_x_ref)
        d_w_hh0_ref[:] = jnp.zeros_like(d_w_hh0_ref)
        d_b_hh0_ref[:] = jnp.zeros_like(d_b_hh0_ref)
        d_w_ih_st_ref[:] = jnp.zeros_like(d_w_ih_st_ref)
        d_w_hh_st_ref[:] = jnp.zeros_like(d_w_hh_st_ref)
        d_b_ih_st_ref[:] = jnp.zeros_like(d_b_ih_st_ref)
        d_b_hh_st_ref[:] = jnp.zeros_like(d_b_hh_st_ref)
        d_w_out_ref[:] = jnp.zeros_like(d_w_out_ref)
        d_b_out_ref[:] = jnp.zeros_like(d_b_out_ref)

    w_x = w_x_ref[:]
    w_hh0 = w_hh0_ref[:]
    b_hh0 = b_hh0_ref[0, :]
    w_out = w_out_ref[:]
    diag = diag_ref[0, :]
    Rm = R_ref[:]
    Cm = C_ref[:]

    def recompute(gi, h_prev, w_hh, b_hh):
        gh = _dot(h_prev, w_hh) + b_hh
        r = jax.nn.sigmoid(gi[:, :h] + gh[:, :h])
        z = jax.nn.sigmoid(gi[:, h : 2 * h] + gh[:, h : 2 * h])
        n_hh = gh[:, 2 * h :]
        n = jnp.tanh(gi[:, 2 * h :] + r * n_hh)
        return r, z, n, n_hh

    dx = dx_s[:]
    dh = dh_s[:]

    # chunk-local weight-grad accumulators (flushed to resident refs once)
    acc_w_x = jnp.zeros_like(w_x)
    acc_w_hh0 = jnp.zeros_like(w_hh0)
    acc_b_hh0 = jnp.zeros((1, 3 * h), jnp.float32)
    # per-deeper-layer accumulators as static python lists (scatter-add on a
    # stacked array does not lower in Mosaic)
    acc_w_ih_st = [jnp.zeros((h, 3 * h), jnp.float32) for _ in range(L - 1)]
    acc_w_hh_st = [jnp.zeros((h, 3 * h), jnp.float32) for _ in range(L - 1)]
    acc_b_ih_st = [jnp.zeros((3 * h,), jnp.float32) for _ in range(L - 1)]
    acc_b_hh_st = [jnp.zeros((3 * h,), jnp.float32) for _ in range(L - 1)]
    acc_w_out = jnp.zeros_like(w_out)
    acc_b_out = jnp.zeros((1, w_out.shape[1]), jnp.float32)

    for i in range(tc - 1, -1, -1):
        x_t = x_ref[i]
        if i > 0:
            h_prev_all = h_cur_ref[i - 1]
        else:
            # first step of this chunk: h from the last row of the previous
            # chunk, or zeros at the very start of the sequence
            h_prev_all = h_prevchunk_ref[tc - 1] * (chunk > 0).astype(jnp.float32)
        h_cur_all = h_cur_ref[i]

        # ---- recompute gate activations per layer (from h_{t-1}) ----------
        gates0 = gc_ref[i] + _dot(x_t, w_x)
        acts = [recompute(gates0, h_prev_all[:, :h], w_hh0, b_hh0)]
        for layer in range(1, L):
            li = layer - 1
            gi_l = (
                _dot(h_cur_all[:, (layer - 1) * h : layer * h], w_ih_st_ref[li])
                + b_ih_st_ref[li]
            )
            acts.append(
                recompute(
                    gi_l,
                    h_prev_all[:, layer * h : (layer + 1) * h],
                    w_hh_st_ref[li],
                    b_hh_st_ref[li],
                )
            )

        # ---- output-projection + Euler-update backward --------------------
        d_x_next = d_paths_ref[i] + dx
        raw_tril = raw_ref[i][:, d:]
        eps = eps_ref[i]
        eps_c = _dot(eps, Cm.T)
        dx_r = _dot(d_x_next, Rm.T)
        dL_path = dx_r * eps_c * sqrt_dt
        dL_total = d_cholv_ref[i] + dL_path
        # noise cotangent: x_next depends on eps via (vals * (eps @ C^T)) @ R,
        # so d_eps = ((d_x_next @ R^T) * vals) @ C * sqrt(dt), with vals the
        # CLAMPED tril values (recomputed from the stashed raw row)
        vals = jnp.where(diag > 0, jnp.maximum(raw_tril, spec.diag_min), raw_tril)
        d_eps_ref[i] = _dot(dx_r * vals, Cm) * sqrt_dt
        # lower_bound rule on the summed cotangent (ref backward.py:324-334)
        pass_thr = (raw_tril >= spec.diag_min) | (dL_total < 0)
        d_tril = jnp.where(diag > 0, jnp.where(pass_thr, dL_total, 0.0), dL_total)
        d_mu = d_means_ref[i] + d_x_next * dt
        d_out = jnp.concatenate([d_mu, d_tril], axis=-1)

        h_top = h_cur_all[:, (L - 1) * h :]
        d_from_above = _dot(d_out, w_out.T)
        acc_w_out = acc_w_out + _dot(h_top.T, d_out)
        acc_b_out = acc_b_out + jnp.sum(d_out, axis=0, keepdims=True)

        # ---- GRU BPTT, top layer down --------------------------------------
        new_dh_cols: list = [None] * L
        for layer in range(L - 1, -1, -1):
            r, z, n, n_hh = acts[layer]
            h_prev_l = h_prev_all[:, layer * h : (layer + 1) * h]
            d_h_l = dh[:, layer * h : (layer + 1) * h] + d_from_above

            dn = d_h_l * (1.0 - z)
            dz = d_h_l * (h_prev_l - n)
            dh_prev_direct = d_h_l * z
            da_n = dn * (1.0 - n * n)
            d_r = da_n * n_hh
            d_gh_n = da_n * r
            da_r = d_r * r * (1.0 - r)
            da_z = dz * z * (1.0 - z)
            d_gi = jnp.concatenate([da_r, da_z, da_n], axis=-1)
            d_gh = jnp.concatenate([da_r, da_z, d_gh_n], axis=-1)

            w_hh_l = w_hh0 if layer == 0 else w_hh_st_ref[layer - 1]
            dh_prev = dh_prev_direct + _dot(d_gh, w_hh_l.T)

            if layer == 0:
                acc_w_hh0 = acc_w_hh0 + _dot(h_prev_l.T, d_gh)
                acc_b_hh0 = acc_b_hh0 + jnp.sum(d_gh, axis=0, keepdims=True)
                d_gc_ref[i] = d_gi
                dx = d_x_next + _dot(d_gi, w_x.T)
                acc_w_x = acc_w_x + _dot(x_t.T, d_gi)
            else:
                li = layer - 1
                acc_w_hh_st[li] = acc_w_hh_st[li] + _dot(h_prev_l.T, d_gh)
                acc_b_hh_st[li] = acc_b_hh_st[li] + jnp.sum(d_gh, axis=0)
                h_below = h_cur_all[:, (layer - 1) * h : layer * h]
                acc_w_ih_st[li] = acc_w_ih_st[li] + _dot(h_below.T, d_gi)
                acc_b_ih_st[li] = acc_b_ih_st[li] + jnp.sum(d_gi, axis=0)
                d_from_above = _dot(d_gi, w_ih_st_ref[li].T)

            new_dh_cols[layer] = dh_prev

        dh = new_dh_cols[0] if L == 1 else jnp.concatenate(new_dh_cols, axis=-1)

    dx_s[:] = dx
    dh_s[:] = dh

    d_w_x_ref[:] += acc_w_x
    d_w_hh0_ref[:] += acc_w_hh0
    d_b_hh0_ref[:] += acc_b_hh0
    for li in range(L - 1):
        d_w_ih_st_ref[li] += acc_w_ih_st[li]
        d_w_hh_st_ref[li] += acc_w_hh_st[li]
        d_b_ih_st_ref[li] += acc_b_ih_st[li]
        d_b_hh_st_ref[li] += acc_b_hh_st[li]
    d_w_out_ref[:] += acc_w_out
    d_b_out_ref[:] += acc_b_out

    @pl.when(c == n_chunks - 1)
    def _final():
        d_x0_ref[:] = dx_s[:]


# ====================================================== pallas_call setup ==


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, t: (0,) * nd, memory_space=pltpu.VMEM)


def _chunk_spec(tc, block_b, width):
    """Time-major chunked stream: array [T, B, X], block (TC, block_b, X) so
    the trailing two dims satisfy TPU tiling (block_b % 8 == 0, X == full)."""
    return pl.BlockSpec(
        (tc, block_b, width), lambda b, c: (c, b, 0), memory_space=pltpu.VMEM
    )


def _chunk_spec_rev(tc, block_b, width, n_chunks, shift=0):
    def index_map(b, c):
        return (jnp.maximum(n_chunks - 1 - c - shift, 0), b, 0)

    return pl.BlockSpec((tc, block_b, width), index_map, memory_space=pltpu.VMEM)


def _weight_specs(spec: SamplerSpec):
    d, h, L = spec.state_dim, spec.hidden_dim, spec.num_layers
    L1 = max(L - 1, 1)
    n_out = d + spec.n_tril
    return [
        _const_spec((d, 3 * h)),        # w_x
        _const_spec((h, 3 * h)),        # w_hh0
        _const_spec((1, 3 * h)),        # b_hh0
        _const_spec((L1, h, 3 * h)),    # w_ih_stack
        _const_spec((L1, h, 3 * h)),    # w_hh_stack
        _const_spec((L1, 3 * h)),       # b_ih_stack
        _const_spec((L1, 3 * h)),       # b_hh_stack
        _const_spec((h, n_out)),        # w_out
        _const_spec((1, n_out)),        # b_out
        _const_spec((spec.n_tril, d)),  # R
        _const_spec((spec.n_tril, d)),  # C
        _const_spec((1, spec.n_tril)),  # diag mask
    ]


def _prep_weights(spec: SamplerSpec, weights: dict):
    """Pack the head's param pytree into the kernel's fp32 weight operands."""
    d, h, L = spec.state_dim, spec.hidden_dim, spec.num_layers
    L1 = max(L - 1, 1)
    p0 = weights["gru"][0]
    w_ih0 = p0["w_ih"].astype(jnp.float32)
    w_x = w_ih0[:d]
    w_hh0 = p0["w_hh"].astype(jnp.float32)
    b_hh0 = p0["b_hh"].astype(jnp.float32).reshape(1, 3 * h)
    if L > 1:
        w_ih_st = jnp.stack([p["w_ih"].astype(jnp.float32) for p in weights["gru"][1:]])
        w_hh_st = jnp.stack([p["w_hh"].astype(jnp.float32) for p in weights["gru"][1:]])
        b_ih_st = jnp.stack([p["b_ih"].astype(jnp.float32) for p in weights["gru"][1:]])
        b_hh_st = jnp.stack([p["b_hh"].astype(jnp.float32) for p in weights["gru"][1:]])
    else:
        w_ih_st = jnp.zeros((L1, h, 3 * h), jnp.float32)
        w_hh_st = jnp.zeros((L1, h, 3 * h), jnp.float32)
        b_ih_st = jnp.zeros((L1, 3 * h), jnp.float32)
        b_hh_st = jnp.zeros((L1, 3 * h), jnp.float32)
    w_out = weights["out_proj"]["w"].astype(jnp.float32)
    b_out = weights["out_proj"]["b"].astype(jnp.float32).reshape(1, -1)
    R, C, diag = _tril_onehots(d, spec.cholesky)
    return (
        w_x,
        w_hh0,
        b_hh0,
        w_ih_st,
        w_hh_st,
        b_ih_st,
        b_hh_st,
        w_out,
        b_out,
        jnp.asarray(R),
        jnp.asarray(C),
        jnp.asarray(diag.astype(np.float32)).reshape(1, -1),
    )


class FusedPathSampler:
    """custom_vjp-wrapped fused sampler for a fixed head configuration.

    Public call: ``(weights_pytree, x0 [B,D], gates_const TIME-MAJOR [T,B,3H],
    noise TIME-MAJOR [T,B,D]) -> (paths [B,T+1,D], means [B,T,D],
    chol_vals [B,T,n_tril])`` with chol diag already clamped at ``diag_min``.
    The input streams and their cotangents stay time-major across the
    custom_vjp boundary (no transposes); only the public outputs are
    batch-major (the ELBO consumes them that way).
    """

    def __init__(self, spec: SamplerSpec) -> None:
        self.spec = spec

        @jax.custom_vjp
        def call(kernel_weights, x0, gates_const, noise):
            paths, raw, _ = self._forward(kernel_weights, x0, gates_const, noise, save_h=False)
            return self._public(x0, paths, raw)

        def call_fwd(kernel_weights, x0, gates_const, noise):
            paths, raw, h_all = self._forward(kernel_weights, x0, gates_const, noise, save_h=True)
            outs = self._public(x0, paths, raw)
            residuals = (kernel_weights, x0, gates_const, noise, outs[0], h_all, raw)
            return outs, residuals

        def call_bwd(residuals, cotangents):
            return self._backward(residuals, cotangents)

        call.defvjp(call_fwd, call_bwd)
        self._call = call

    # ------------------------------------------------------------------ API

    def __call__(self, weights: dict, x0: Array, gates_const: Array, noise: Array):
        kernel_weights = _prep_weights(self.spec, weights)
        return self._call(kernel_weights, x0, gates_const, noise)

    def _public(self, x0, paths_rest, raw):
        d = self.spec.state_dim
        paths = jnp.concatenate([x0[:, None, :], paths_rest], axis=1)
        means = raw[:, :, :d]
        raw_tril = raw[:, :, d:]
        diag = jnp.asarray(_tril_onehots(d, self.spec.cholesky)[2])
        chol_vals = jnp.where(diag, jnp.maximum(raw_tril, self.spec.diag_min), raw_tril)
        return paths, means, chol_vals

    # -------------------------------------------------------------- forward

    def _forward(self, kernel_weights, x0, gates_const, noise, *, save_h: bool):
        spec = self.spec
        n_steps, batch, _ = gates_const.shape  # streams arrive time-major
        d, h, L = spec.state_dim, spec.hidden_dim, spec.num_layers
        n_out = d + spec.n_tril
        # fwd streams per step: gates 3H + eps d + paths d + raw n_out (+ h LH)
        lanes = 3 * h + 2 * d + n_out + L * h
        block_b = min(spec.block_b, _round_up(batch, 8))
        tc, block_b = _fit_chunk_and_block(n_steps, spec.max_t_chunk, block_b, lanes)
        pad_b = _round_up(batch, block_b)
        if pad_b != batch:
            pad = ((0, 0), (0, pad_b - batch), (0, 0))
            gates_const = jnp.pad(gates_const, pad)
            noise = jnp.pad(noise, pad)
            x0 = jnp.pad(x0, ((0, pad_b - batch), (0, 0)))

        # Time-major [T, B, X] end to end; chunk blocks are (TC, block_b, X).
        gc_t = gates_const.astype(jnp.float32)
        eps_t = noise.astype(jnp.float32)

        out_shapes = [
            jax.ShapeDtypeStruct((n_steps, pad_b, d), jnp.float32),      # paths_rest
            jax.ShapeDtypeStruct((n_steps, pad_b, n_out), jnp.float32),  # raw
        ]
        out_specs = [
            _chunk_spec(tc, block_b, d),
            _chunk_spec(tc, block_b, n_out),
        ]
        if save_h:
            out_shapes.append(jax.ShapeDtypeStruct((n_steps, pad_b, L * h), jnp.float32))
            out_specs.append(_chunk_spec(tc, block_b, L * h))

        grid = (pad_b // block_b, n_steps // tc)
        kernel = functools.partial(_fwd_kernel, spec, tc, save_h)
        results = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, d), lambda b, c: (b, 0), memory_space=pltpu.VMEM),
                _chunk_spec(tc, block_b, 3 * h),
                _chunk_spec(tc, block_b, d),
                *_weight_specs(spec),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((block_b, d), jnp.float32),
                pltpu.VMEM((block_b, L * h), jnp.float32),
            ],
            interpret=spec.interpret,
        )(x0.astype(jnp.float32), gc_t, eps_t, *kernel_weights)

        paths_rest = jnp.swapaxes(results[0], 0, 1)[:batch]
        raw = jnp.swapaxes(results[1], 0, 1)[:batch]
        # h_all stays time-major: the backward consumes it that way.
        h_all = results[2] if save_h else None
        return paths_rest, raw, h_all

    # ------------------------------------------------------------- backward

    def _backward(self, residuals, cotangents):
        spec = self.spec
        (kernel_weights, x0, gates_const, noise, paths_full, h_all, raw) = residuals
        d_paths_full, d_means, d_cholv = cotangents

        n_steps, batch, _ = gates_const.shape  # gc/noise are time-major
        d, h, L = spec.state_dim, spec.hidden_dim, spec.num_layers
        L1 = max(L - 1, 1)
        n_out = d + spec.n_tril
        # bwd streams per step: gates 3H, eps/x/d_paths/d_means 4d, h x2 2LH,
        # raw n_out, d_cholv n_tril, d_gc out 3H, d_eps out d
        lanes = 6 * h + 5 * d + 2 * L * h + n_out + spec.n_tril
        block_b = min(spec.block_b, _round_up(batch, 8))
        tc, block_b = _fit_chunk_and_block(n_steps, spec.max_t_chunk_bwd, block_b, lanes)
        n_chunks = n_steps // tc
        pad_b = _round_up(batch, block_b)

        def tmaj(a):
            """[B, T, X] -> padded time-major [T, pad_b, X]."""
            a = jnp.swapaxes(a.astype(jnp.float32), 0, 1)
            if pad_b != batch:
                a = jnp.pad(a, ((0, 0), (0, pad_b - batch), (0, 0)))
            return a

        def pad_tmaj(a):
            """already time-major [T, B, X] -> [T, pad_b, X]."""
            a = a.astype(jnp.float32)
            if pad_b != batch:
                a = jnp.pad(a, ((0, 0), (0, pad_b - batch), (0, 0)))
            return a

        args = [
            pad_tmaj(gates_const),
            pad_tmaj(noise),
            tmaj(paths_full[:, :-1]),  # x_t = state entering step t
            pad_tmaj(h_all),
            pad_tmaj(h_all),
            tmaj(raw),
            tmaj(d_paths_full[:, 1:]),
            tmaj(d_means),
            tmaj(d_cholv),
            *kernel_weights,
        ]

        rev = functools.partial(_chunk_spec_rev, tc)
        in_specs = [
            rev(block_b, 3 * h, n_chunks),
            rev(block_b, d, n_chunks),
            rev(block_b, d, n_chunks),
            rev(block_b, L * h, n_chunks),           # h_cur chunk
            rev(block_b, L * h, n_chunks, shift=1),  # previous chunk of h
            rev(block_b, n_out, n_chunks),
            rev(block_b, d, n_chunks),
            rev(block_b, d, n_chunks),
            rev(block_b, spec.n_tril, n_chunks),
            *_weight_specs(spec),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((n_steps, pad_b, 3 * h), jnp.float32),  # d_gates_const
            jax.ShapeDtypeStruct((n_steps, pad_b, d), jnp.float32),      # d_noise
            jax.ShapeDtypeStruct((pad_b, d), jnp.float32),               # d_x0
            jax.ShapeDtypeStruct((d, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((h, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((L1, h, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((L1, h, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((L1, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((L1, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((h, n_out), jnp.float32),
            jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        ]
        out_specs = [
            rev(block_b, 3 * h, n_chunks),
            rev(block_b, d, n_chunks),
            pl.BlockSpec((block_b, d), lambda b, c: (b, 0), memory_space=pltpu.VMEM),
            _const_spec((d, 3 * h)),
            _const_spec((h, 3 * h)),
            _const_spec((1, 3 * h)),
            _const_spec((L1, h, 3 * h)),
            _const_spec((L1, h, 3 * h)),
            _const_spec((L1, 3 * h)),
            _const_spec((L1, 3 * h)),
            _const_spec((h, n_out)),
            _const_spec((1, n_out)),
        ]

        grid = (pad_b // block_b, n_chunks)
        kernel = functools.partial(_bwd_kernel, spec, tc, n_chunks)
        results = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((block_b, d), jnp.float32),
                pltpu.VMEM((block_b, L * h), jnp.float32),
            ],
            interpret=spec.interpret,
        )(*args)

        (
            d_gc,
            d_eps,
            d_x0_rec,
            d_w_x,
            d_w_hh0,
            d_b_hh0,
            d_w_ih_st,
            d_w_hh_st,
            d_b_ih_st,
            d_b_hh_st,
            d_w_out,
            d_b_out,
        ) = results

        # cotangents leave time-major, matching the primal layout — no
        # boundary transposes (round-1 VERDICT item 6)
        d_gc = d_gc[:, :batch]
        d_noise = d_eps[:, :batch].astype(noise.dtype)
        d_x0 = d_x0_rec[:batch] + d_paths_full[:, 0].astype(jnp.float32)

        d_kernel_weights = (
            d_w_x,
            d_w_hh0,
            d_b_hh0,
            d_w_ih_st,
            d_w_hh_st,
            d_b_ih_st,
            d_b_hh_st,
            d_w_out,
            d_b_out,
            jnp.zeros_like(kernel_weights[9]),   # R
            jnp.zeros_like(kernel_weights[10]),  # C
            jnp.zeros_like(kernel_weights[11]),  # diag
        )
        return (d_kernel_weights, d_x0, d_gc, d_noise)
