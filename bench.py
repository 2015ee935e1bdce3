"""Benchmark: ELBO training steps/sec on the OU headline config.

Config matches the reference's ``examples/ornstein_uhlenbeck.py:59-82``:
OU 1-D, 6 observations, T=5, dt=0.05 (100 path steps), batch 128,
encoder 256 hidden / 4 heads / 8 deep, head 64 hidden / 2 GRU layers.

Prints ONE JSON line:
  {"metric": "ou_train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...}

Measurement discipline (this tunnel drifts ~15% across processes, BASELINE.md):
the reported value is the MEDIAN over several same-process timing windows, with
the IQR reported alongside so round-over-round deltas can be judged against
measurement noise. Also reported:
- ``path_steps_per_sec_per_chip``: batch * n_path_steps * steps/s — the
  BASELINE.md north-star throughput metric;
- ``mfu``: analytic model FLOPs per train step (fwd x3 for fwd+bwd) divided by
  measured time and the chip's peak bf16 throughput — the absolute yardstick
  (the reference publishes no numbers and its Triton sampler cannot run here).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is computed
against the first number this repo recorded on TPU (REFERENCE_STEPS_PER_SEC
below) so later rounds show relative progress; null until established.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

# First TPU v5e measurement of this implementation (round 1); later rounds are
# compared against it. See BASELINE.md.
REFERENCE_STEPS_PER_SEC: float | None = 52.9

# Peak dense bf16 matmul throughput per chip, FLOP/s (for the MFU estimate).
PEAK_FLOPS = {"tpu v5e": 197e12, "tpu v5 lite": 197e12, "tpu v5p": 459e12,
              "tpu v4": 275e12, "tpu v6e": 918e12}
DEFAULT_PEAK = 197e12

WARMUP_STEPS = 5
# 100 steps/window = 5 queued chunk dispatches: block_until_ready only at the
# window edge, so the host->device RTT overlaps device execution instead of
# being exposed once per chunk (measured: 1 chunk/window 13.2 ms/step vs 5
# chunks/window 9.68 ms/step, benchmarks/profile_dispatch.py).
WINDOW_STEPS = 100
N_WINDOWS = 7

# Steps per dispatch. The trainer's scan-chunked dispatch (steps_per_call,
# trainer.py) is how long training runs actually execute; one dispatch per
# WINDOW_STEPS also removes the per-step host->device RTT of this tunnel from
# the measurement (device-op sum 9.0 ms/step vs ~11 ms wall per-step,
# BASELINE.md). BENCH_CHUNK=1 restores per-step dispatch.
CHUNK = int(os.environ.get("BENCH_CHUNK", str(WINDOW_STEPS)))

BATCH = 128
N_STEPS = 100  # T=5, dt=0.05
ENC_HIDDEN, ENC_COND, ENC_HEADS, ENC_DEPTH = 256, 256, 4, 8
HEAD_HIDDEN, HEAD_LAYERS = 64, 2


def estimate_step_flops() -> float:
    """Analytic matmul FLOPs for ONE training step (forward x3 for fwd+bwd).

    Counts the model's dense compute (encoder SiT, cond MLP, recurrent head);
    elementwise/ELBO work is excluded, so the resulting MFU is a slight
    underestimate (conservative).
    """
    B, S = BATCH, N_STEPS + 1
    E, C, NH, DEPTH = ENC_HIDDEN, ENC_COND, ENC_HEADS, ENC_DEPTH
    M = int(E * 8 / 3)
    H, L = HEAD_HIDDEN, HEAD_LAYERS
    D, P = 1, 3  # OU: state_dim=1, sde_param_dim=3
    n_tril = D * (D + 1) // 2
    N = B * S

    per_block = (
        2 * N * E * 3 * E          # qkv projection
        + 4 * B * S * S * E        # SDPA: logits + probs@v (nh*dh = E)
        + 2 * N * E * (E // NH)    # sigmoid output gate
        + 2 * N * E * E            # attention out projection
        + 2 * N * E * 2 * M        # SwiGLU in
        + 2 * N * M * E            # SwiGLU out
        + 2 * B * C * 6 * E        # adaLN-Zero cond projection (hoisted)
    )
    encoder = DEPTH * per_block + 2 * 2 * N * E * E  # + input/output proj
    cond_mlp = 2 * B * (P * C + C * C + C * C)

    T = N_STEPS
    head = (
        2 * B * T * C * 3 * H                      # hoisted context projection
        + 2 * B * P * 3 * H                        # hoisted theta projection
        + T * B * (
            2 * D * 3 * H                          # layer-0 state projection
            + L * 2 * H * 3 * H                    # recurrent matmuls
            + (L - 1) * 2 * H * 3 * H              # deeper-layer input proj
            + 2 * H * (D + n_tril)                 # output projection
        )
    )
    forward = encoder + cond_mlp + head
    return 3.0 * forward  # fwd + bwd (bwd ~ 2x fwd)


def main() -> None:
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    class OU:
        state_dim = 1
        sde_param_dim = 3

        def drift(self, x, p):
            return p[..., 0:1] * (p[..., 1:2] - x)

        def diffusion(self, x, p):
            return p[..., 2:3][..., None]

    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
    )
    trainer = VariationalInferenceTrainer(
        sde=OU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.TrainingConfig(time_step=0.05, batch_size=BATCH, n_iterations=1),
        encoder_config=vt.EncoderConfig(
            hidden_dim=ENC_HIDDEN, cond_dim=ENC_COND, num_heads=ENC_HEADS, depth=ENC_DEPTH
        ),
        head_config=vt.HeadConfig(hidden_dim=HEAD_HIDDEN, num_layers=HEAD_LAYERS),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
    )

    params, opt_state, ema = trainer.params, trainer.opt_state, trainer.ema_params
    step_fn = trainer._train_step
    chunk_fn = trainer._get_train_chunk(CHUNK) if CHUNK > 1 else None

    step_idx = 0

    def run_steps(n):
        nonlocal params, opt_state, ema, step_idx
        metrics = None
        if chunk_fn is not None and n % CHUNK == 0:
            for _ in range(n // CHUNK):
                steps_arr = jnp.arange(step_idx, step_idx + CHUNK, dtype=jnp.int32)
                scales = jnp.ones(CHUNK, dtype=jnp.float32)
                params, opt_state, ema, metrics = chunk_fn(
                    params, opt_state, ema, steps_arr, scales
                )
                step_idx += CHUNK
            jax.block_until_ready(metrics)
            return jax.tree.map(lambda a: a[-1], metrics)
        for _ in range(n):
            key = jax.random.fold_in(trainer._train_key, step_idx)
            params, opt_state, ema, metrics = step_fn(params, opt_state, ema, key)
            step_idx += 1
        jax.block_until_ready(metrics)
        return metrics

    # warmup: one chunk dispatch when chunking (avoids also compiling the
    # single-step program), else WARMUP_STEPS single steps
    metrics = run_steps(CHUNK if chunk_fn is not None else WARMUP_STEPS)

    rates = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        metrics = run_steps(WINDOW_STEPS)
        rates.append(WINDOW_STEPS / (time.perf_counter() - t0))

    elbo = float(metrics.elbo)
    if not (elbo == elbo):  # NaN guard: a broken step must not report a speed
        print(json.dumps({"metric": "ou_train_steps_per_sec", "value": 0.0,
                          "unit": "steps/s", "vs_baseline": None,
                          "error": "non-finite ELBO"}))
        sys.exit(1)

    steps_per_sec = statistics.median(rates)
    qs = statistics.quantiles(rates, n=4)
    iqr = qs[2] - qs[0]

    device_kind = jax.devices()[0].device_kind.lower()
    peak = next(
        (v for k, v in PEAK_FLOPS.items() if k in device_kind), DEFAULT_PEAK
    )
    flops = estimate_step_flops()
    mfu = flops * steps_per_sec / peak

    vs_baseline = (
        steps_per_sec / REFERENCE_STEPS_PER_SEC if REFERENCE_STEPS_PER_SEC else None
    )
    print(
        json.dumps(
            {
                "metric": "ou_train_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
                # vs_baseline divides by THIS repo's first-build 52.9 steps/s
                # (the reference's Triton sampler cannot run without CUDA);
                # it is NOT a vs-reference speedup.
                "vs_baseline_basis": "self_round1",
                "iqr": round(iqr, 3),
                "steps_per_dispatch": CHUNK,
                "windows": [round(r, 2) for r in rates],
                "path_steps_per_sec_per_chip": round(steps_per_sec * BATCH * N_STEPS),
                "model_flops_per_step": round(flops),
                "mfu": round(mfu, 4),
                "device_kind": device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
