"""Diffusion transition head: stacked GRU + zero-init output projection that
emits per-step Gaussian transition parameters (mu, Cholesky L), and the fused
path sampler that rolls the Euler recurrence
``z_{t+1} = z_t + mu_t*dt + (L_t @ eps_t)*sqrt(dt)``.

Parity targets:
- module semantics: reference ``models/head.py:20-209`` (GRU with input
  ``[z_t, context_t, theta]``, PyTorch gate order r,z,n; ``out_proj`` zero-init
  with diag-bias 1.0 at index ``D + k(k+3)/2``; Cholesky diag clamped by
  ``lower_bound(., DIAG_MIN)``);
- fused sampler semantics: reference Triton ``kernels/forward.py:91-376`` /
  ``kernels/backward.py:156-624`` — here a single ``lax.scan`` whose BPTT
  gradient is derived by JAX (replacing the hand-written backward kernel), with
  an optional Pallas fused kernel for the hot path.

TPU-first design (SURVEY §7.3 item 2): the theta and context input projections
are constant-per-path / precomputable, so they are hoisted OUT of the
recurrence as one large ``[B*T, C] @ [C, 3H]`` MXU matmul (the reference's
Triton kernel hoists theta only, ``forward.py:157-175``, and re-projects the
context every step with scalar loops). The in-loop work is then just the tiny
state projection plus the ``[B,H] @ [H,3H]`` recurrent matmul per layer. The
recurrence runs in fp32 (ref ``kernels/autograd.py:80-87``) no matter the
encoder compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from viforsdes_tpu.config import HeadConfig
from viforsdes_tpu.inference.constants import DIAG_MIN
from viforsdes_tpu.ops.bounds import lower_bound
from viforsdes_tpu.ops.initializers import fan_in_uniform_init

Array = jax.Array


# Matmul precision for the recurrence. The reference pins the recurrence to
# fp32 (``autograd.py:80-87``); on TPU, f32 dot inputs are rounded to bf16 on
# the MXU with fp32 accumulation under DEFAULT. True-fp32 emulation
# (HIGH/HIGHEST) costs 100x+ compile time on the current toolchain for scans,
# so DEFAULT is used: elementwise gate math and the Euler accumulation stay
# exact fp32; only matmul inputs are bf16-rounded. CPU runs (and the test
# suite) are exact fp32.
_FP32 = jax.lax.Precision.DEFAULT


def _gru_cell(
    gates_in: Array,  # [B, 3H] input contribution incl. b_ih
    h: Array,  # [B, H]
    w_hh: Array,  # [H, 3H]
    b_hh: Array,  # [3H]
) -> Array:
    """Standard (PyTorch-semantics) GRU cell, gate order r,z,n.

    r = sig(gi_r + gh_r); z = sig(gi_z + gh_z); n = tanh(gi_n + r*gh_n);
    h' = (1-z)*n + z*h  (ref ``kernels/forward.py:83-88``).
    """
    gh = jnp.dot(h, w_hh, precision=_FP32) + b_hh
    gi_r, gi_z, gi_n = jnp.split(gates_in, 3, axis=-1)
    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    return (1.0 - z) * n + z * h


class DiffusionTransitionHead:
    """Static-config head; params live in an explicit pytree."""

    def __init__(
        self,
        state_dim: int,
        context_dim: int,
        sde_param_dim: int,
        config: HeadConfig,
    ) -> None:
        if config.num_layers < 1:
            raise ValueError(f"num_layers must be >= 1, got {config.num_layers}")
        self.state_dim = state_dim
        self.context_dim = context_dim
        self.sde_param_dim = sde_param_dim
        self.hidden_dim = config.hidden_dim
        self.num_layers = config.num_layers
        # cholesky="diag": the transition scale is a per-dim diagonal (d
        # outputs) instead of a full lower triangle (d(d+1)/2). Beyond the
        # reference (always full-tril): at large state_dim the full triangle
        # dominates the head's output layer (528 of 560 outputs at d=32) and
        # its O(d^2) per-step matmul — for SDEs whose bridge covariance is
        # (near-)diagonal, diag mode removes both. Cholesky arrays are then
        # [..., D] everywhere downstream (ELBO, diagnostics).
        #
        # cholesky="matched": the diffusion-matched bridge (see
        # HeadConfig.cholesky). The head emits d per-dim log-corrections c;
        # the transition scale is L_q = diag(dz/dx) @ g(x_t, theta) *
        # exp(softcap(c)) built inside the recurrence from the USER's
        # diffusion — so this mode always runs the lax.scan sampler (a user
        # jnp function cannot run inside the Pallas kernel).
        self.cholesky = config.cholesky
        if self.cholesky in ("diag", "matched"):
            self.n_tril = state_dim
        else:
            self.n_tril = state_dim * (state_dim + 1) // 2
        if self.cholesky == "matched" and config.sampler == "pallas":
            raise ValueError(
                "cholesky='matched' evaluates the user's diffusion inside the"
                " recurrence and requires the scan sampler; set sampler to"
                " 'auto' or 'scan'"
            )
        self.input_dim = state_dim + context_dim + sde_param_dim
        self.sampler = config.sampler
        self.sampler_block_b = config.sampler_block_b
        self._fused_samplers: dict = {}

        rows, cols = np.tril_indices(state_dim)
        self.tril_rows = rows
        self.tril_cols = cols
        self.diag_mask = jnp.asarray(rows == cols)

    # ------------------------------------------------------------------ init

    def init(self, key: Array) -> dict:
        """GRU weights U(+-1/sqrt(H)) (torch GRU default); out_proj zero-init
        with Cholesky-diag bias 1.0 (ref ``head.py:60-66``)."""
        keys = jax.random.split(key, 4 * self.num_layers)
        h = self.hidden_dim
        gru = []
        for layer in range(self.num_layers):
            in_dim = self.input_dim if layer == 0 else h
            k = keys[4 * layer : 4 * layer + 4]
            bound = 1.0 / (h**0.5)
            gru.append(
                {
                    # stored [in, 3H] so the apply is x @ W (fan-in-of-H init
                    # regardless of in_dim, matching torch GRU).
                    "w_ih": jax.random.uniform(k[0], (in_dim, 3 * h), jnp.float32, -bound, bound),
                    "w_hh": fan_in_uniform_init(k[1], (h, 3 * h)),
                    "b_ih": jax.random.uniform(k[2], (3 * h,), jnp.float32, -bound, bound),
                    "b_hh": jax.random.uniform(k[3], (3 * h,), jnp.float32, -bound, bound),
                }
            )
        out_b = np.zeros(self.state_dim + self.n_tril, dtype=np.float32)
        if self.cholesky == "diag":
            out_b[self.state_dim :] = 1.0
        elif self.cholesky == "matched":
            # log-corrections stay 0: exp(0) = 1 => the bridge diffusion
            # equals the SDE's exactly at init
            pass
        else:
            for kk in range(self.state_dim):
                out_b[self.state_dim + kk * (kk + 3) // 2] = 1.0
        return {
            "gru": gru,
            "out_proj": {
                "w": jnp.zeros((h, self.state_dim + self.n_tril), jnp.float32),
                "b": jnp.asarray(out_b),
            },
        }

    # ------------------------------------------------------------ tril build

    def tril_from_params(self, params_tril: Array) -> Array:
        """``[..., n_tril] -> [..., D, D]`` lower-triangular with clamped diag
        (ref ``head.py:88-97``)."""
        processed = jnp.where(
            self.diag_mask, lower_bound(params_tril, DIAG_MIN), params_tril
        )
        out_shape = params_tril.shape[:-1] + (self.state_dim, self.state_dim)
        L = jnp.zeros(out_shape, params_tril.dtype)
        return L.at[..., self.tril_rows, self.tril_cols].set(processed)

    def chol_from_params(self, raw: Array) -> Array:
        """Raw chol outputs -> the transition scale in this head's layout:
        full mode ``[..., n_tril] -> [..., D, D]`` tril matrix; diag mode
        ``[..., D] -> [..., D]`` clamped diagonal. (Matched mode builds its
        scale from the SDE's diffusion instead — ``matched_chol``.)"""
        if self.cholesky == "diag":
            return lower_bound(raw, DIAG_MIN)
        return self.tril_from_params(raw)

    # ------------------------------------------------- diffusion-matched mode

    # Soft cap on the matched-mode log-correction: |c| <= CORR_CAP bounds the
    # learned multiplier to [e^-4, e^4] (smooth tanh saturation, unit slope
    # at 0) so a transient gradient spike cannot exp-overflow the bridge.
    CORR_CAP = 4.0

    def matched_chol(
        self,
        z: Array,
        sde_parameters: Array,
        raw_corr: Array,
        sde,
        state_space,
    ) -> Array:
        """Diffusion-matched transition scale: ``L_q = diag(dz/dx) @
        g(to_state(z), theta) * exp(softcap(c))`` with the diag clamped by the
        shared ``lower_bound`` STE.

        The true conditional bridge of an SDE has the SAME diffusion
        coefficient as the SDE (Doob h-transform) — the head only needs to
        learn the bridge DRIFT, so the free-Cholesky family's collapse mode
        (bridge quadratic variation pinned at the DIAG_MIN floor, dragging the
        sigma posterior with it — the measured ladder-5 mechanism) is
        structurally unreachable: here q's quadratic variation tracks theta by
        construction. Replaces the raw-output path of ref ``head.py:88-97``;
        ``c`` is zero-init so the bridge diffusion equals the SDE's at init.
        """
        x = state_space.to_state(z)
        L_x = sde.diffusion(x, sde_parameters)
        jac = state_space.latent_jacobian_diag(z)
        corr = self.CORR_CAP * jnp.tanh(raw_corr / self.CORR_CAP)
        scale = jac * jnp.exp(corr)  # [..., D]: per-row (= per output dim)
        L = scale[..., None] * L_x
        ar = np.arange(self.state_dim)
        diag = lower_bound(L[..., ar, ar], DIAG_MIN)
        return L.at[..., ar, ar].set(diag)

    # -------------------------------------------------------- step-wise path

    def forward(
        self,
        params: dict,
        x_t: Array,
        context_t: Array,
        sde_parameters: Array,
        hidden: Array | None = None,
        *,
        sde=None,
        state_space=None,
    ) -> tuple[Array, Array, Array]:
        """Single eager step (the unit-test oracle; ref ``head.py:68-86``).

        hidden: ``[L, B, H]`` or None -> zeros. Returns (mu, L, hidden').
        Matched mode additionally needs ``sde`` and ``state_space`` (``x_t``
        is latent-space, as everywhere in the head).
        """
        batch = x_t.shape[0]
        if hidden is None:
            hidden = jnp.zeros((self.num_layers, batch, self.hidden_dim), jnp.float32)
        inp = jnp.concatenate([x_t, context_t, sde_parameters], axis=-1)
        new_hidden = []
        h_in = inp
        for layer, p in enumerate(params["gru"]):
            gates_in = jnp.dot(h_in, p["w_ih"], precision=_FP32) + p["b_ih"]
            h_new = _gru_cell(gates_in, hidden[layer], p["w_hh"], p["b_hh"])
            new_hidden.append(h_new)
            h_in = h_new
        out = jnp.dot(h_in, params["out_proj"]["w"], precision=_FP32) + params["out_proj"]["b"]
        mu = out[..., : self.state_dim]
        raw = out[..., self.state_dim :]
        if self.cholesky == "matched":
            if sde is None or state_space is None:
                raise ValueError("cholesky='matched' needs sde and state_space")
            L = self.matched_chol(x_t, sde_parameters, raw, sde, state_space)
        else:
            L = self.chol_from_params(raw)
        return mu, L, jnp.stack(new_hidden)

    # ------------------------------------------------------- shared precompute

    def _gates_const(self, params: dict, context: Array, theta: Array):
        """Hoist the context/theta input projections out of the recurrence:
        one big MXU matmul over [B*T, C] plus a theta term constant in t
        (generalizing the reference kernel's theta-only hoist,
        ``forward.py:157-175``). Returns (gates_const TIME-MAJOR [T,B,3H],
        w_x [D,3H]) — time-major end to end so neither the scan nor the
        Pallas kernel transposes the stream at the custom_vjp boundary."""
        d = self.state_dim
        context = context.astype(jnp.float32)
        theta = theta.astype(jnp.float32)
        p0 = params["gru"][0]
        w_ih0 = p0["w_ih"].astype(jnp.float32)
        # Split layer-0 input weights by input segment [state | context | theta].
        w_x = w_ih0[:d]
        w_c = w_ih0[d : d + self.context_dim]
        w_t = w_ih0[d + self.context_dim :]
        gates_const = (
            jnp.einsum("btc,ch->tbh", context, w_c, precision=_FP32)
            + jnp.dot(theta, w_t, precision=_FP32)[None, :, :]
            + p0["b_ih"].astype(jnp.float32)
        )
        return gates_const, w_x

    # -------------------------------------------------------- fused Pallas path

    def _fused_sampler(self, time_step: float):
        from viforsdes_tpu.ops.pallas.sde_sampler import FusedPathSampler, SamplerSpec

        interpret = jax.default_backend() != "tpu"
        key = (float(time_step), interpret)
        if key not in self._fused_samplers:
            self._fused_samplers[key] = FusedPathSampler(
                SamplerSpec(
                    state_dim=self.state_dim,
                    hidden_dim=self.hidden_dim,
                    num_layers=self.num_layers,
                    time_step=float(time_step),
                    diag_min=DIAG_MIN,
                    block_b=self.sampler_block_b,
                    interpret=interpret,
                    cholesky=self.cholesky,
                )
            )
        return self._fused_samplers[key]

    def _sample_pallas(self, params, x0, gates_const, noise, time_step):
        sampler = self._fused_sampler(time_step)
        paths, means, chol_vals = sampler(params, x0, gates_const, noise)
        if self.cholesky == "diag":
            return paths, means, chol_vals  # [B, T, D] diagonal scale
        out_shape = chol_vals.shape[:-1] + (self.state_dim, self.state_dim)
        L = jnp.zeros(out_shape, chol_vals.dtype)
        L = L.at[..., self.tril_rows, self.tril_cols].set(chol_vals)
        return paths, means, L

    # ------------------------------------------------------- fused (scan) path

    def sample_diffusion_paths(
        self,
        params: dict,
        x0: Array,
        context: Array,
        sde_parameters: Array,
        standard_noise: Array,
        time_step: float,
        *,
        sde=None,
        state_space=None,
    ) -> tuple[Array, Array, Array]:
        """Roll the full path: ``(z0 [B,D], context [B,T,C], theta [B,P],
        eps TIME-MAJOR [T,B,D]) -> (paths [B,T+1,D], means [B,T,D],
        chol [B,T,D,D])``. Matched mode requires ``sde``/``state_space``
        (the user's diffusion runs inside the recurrence).

        Functional replacement for ``_SDEFunction.apply`` + both Triton kernels
        (ref ``kernels/autograd.py:35-268``). fp32 throughout. The noise and
        the hoisted gate stream travel time-major so the recurrence (scan or
        Pallas) consumes them without boundary transposes.
        """
        batch, n_steps, _ = context.shape
        d = self.state_dim
        h = self.hidden_dim
        dt = jnp.float32(time_step)
        sqrt_dt = jnp.float32(time_step**0.5)

        x0 = x0.astype(jnp.float32)
        noise = standard_noise.astype(jnp.float32)
        gates_const, w_x = self._gates_const(params, context, sde_parameters)

        sampler = self.sampler
        if self.cholesky == "matched":
            if sde is None or state_space is None:
                raise ValueError("cholesky='matched' needs sde and state_space")
            sampler = "scan"  # user diffusion fn runs inside the recurrence
        elif sampler == "auto":
            # Interleaved same-process measurement on v5e (OU headline
            # config): full train step 10.0 ms with the fused kernel vs
            # 10.9 ms with the scan (kernel alone: fwd 0.59 vs 0.73 ms,
            # bwd 0.85 vs 0.99 ms).
            sampler = "pallas" if jax.default_backend() == "tpu" else "scan"
        if sampler == "pallas":
            return self._sample_pallas(params, x0, gates_const, noise, time_step)

        gates_const_t = gates_const  # already [T, B, 3H]
        noise_t = noise  # already [T, B, D]

        deeper = [
            {k: v.astype(jnp.float32) for k, v in p.items()} for p in params["gru"][1:]
        ]
        p0 = params["gru"][0]
        w_hh0 = p0["w_hh"].astype(jnp.float32)
        b_hh0 = p0["b_hh"].astype(jnp.float32)
        w_out = params["out_proj"]["w"].astype(jnp.float32)
        b_out = params["out_proj"]["b"].astype(jnp.float32)

        h0 = jnp.zeros((self.num_layers, batch, h), jnp.float32)

        if self.cholesky == "diag":
            def apply_noise(L, eps_t):
                return L * eps_t
        else:
            def apply_noise(L, eps_t):
                return jnp.einsum("bij,bj->bi", L, eps_t, precision=_FP32)

        theta_f32 = sde_parameters.astype(jnp.float32)

        def step(carry, inputs):
            x, hs = carry
            g_const, eps_t = inputs

            gates_in = g_const + jnp.dot(x, w_x, precision=_FP32)
            h_new0 = _gru_cell(gates_in, hs[0], w_hh0, b_hh0)
            new_hs = [h_new0]
            h_in = h_new0
            for li, p in enumerate(deeper):
                gates_l = jnp.dot(h_in, p["w_ih"], precision=_FP32) + p["b_ih"]
                h_new = _gru_cell(gates_l, hs[li + 1], p["w_hh"], p["b_hh"])
                new_hs.append(h_new)
                h_in = h_new

            out = jnp.dot(h_in, w_out, precision=_FP32) + b_out
            mu = out[..., :d]
            if self.cholesky == "matched":
                L = self.matched_chol(x, theta_f32, out[..., d:], sde, state_space)
            else:
                L = self.chol_from_params(out[..., d:])
            x_next = x + mu * dt + apply_noise(L, eps_t) * sqrt_dt
            return (x_next, jnp.stack(new_hs)), (x_next, mu, L)

        (_, _), (xs, mus, Ls) = jax.lax.scan(step, (x0, h0), (gates_const_t, noise_t))

        paths = jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)
        means = jnp.swapaxes(mus, 0, 1)
        cholesky = jnp.swapaxes(Ls, 0, 1)
        return paths, means, cholesky
