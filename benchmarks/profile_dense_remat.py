"""End-to-end A/B of the remat'd dense SDPA on the FULL OU headline step.

Round-3 trace finding (BASELINE.md): jax.nn.dot_product_attention keeps
f32[B, H, S, S] softmax probabilities as backward residuals; at the OU
headline shape their HBM round-trips (copy-done) plus the attention-bwd
layout copies cost ~1.8 ms of the 9.25 ms device step. _dense_sdpa_remat
(ops/attention.py) rematerializes logits+softmax+PV in the backward so the
probs never hit HBM.

Full jitted train steps in one process, interleaved windows
(VIFORSDES_DENSE_REMAT read at trace time).

Usage: python benchmarks/profile_dense_remat.py [--iters 200] [--windows 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def build(tag: str, env: dict):
    import jax
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer
    from ornstein_uhlenbeck import OrnsteinUhlenbeck

    for k_, v_ in env.items():
        os.environ[k_] = v_
    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
    )
    tr = VariationalInferenceTrainer(
        sde=OrnsteinUhlenbeck(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.TrainingConfig(time_step=0.05, batch_size=128, n_iterations=1),
        encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
        head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
        state_positive_dims=[],
        sde_param_positive_dims=[0, 2],
        console=vt.Console(enabled=False),
    )
    state = [tr.params, tr.opt_state, tr.ema_params, tr._train_key]
    t0 = time.perf_counter()
    p, o, e, mx = tr._train_step(*state)
    jax.block_until_ready(mx)
    print(f"compile {tag} {env}: {time.perf_counter() - t0:.1f}s", flush=True)
    return tr, [p, o, e, state[3]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    variants = {}
    for tag, env in [
        ("library_sdpa", {"VIFORSDES_DENSE_REMAT": "0"}),
        ("dense_remat", {"VIFORSDES_DENSE_REMAT": "1"}),
    ]:
        variants[tag] = build(tag, env)

    results = {t: [] for t in variants}
    for w in range(args.windows):
        for tag, (tr, state) in variants.items():
            p, o, e, k = state
            mx = None
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, e, mx = tr._train_step(p, o, e, jax.random.fold_in(k, w * 1000 + i))
            jax.block_until_ready(mx)
            ms = (time.perf_counter() - t0) / args.iters * 1000
            variants[tag] = (tr, [p, o, e, k])
            results[tag].append(ms)
            print(f"window {w} {tag}: {ms:.2f} ms/step", flush=True)

    for tag, ms_list in results.items():
        med = statistics.median(ms_list)
        print(f"{tag}: median {med:.2f} ms/step ({1000/med:.1f} steps/s) windows={['%.2f'%m for m in ms_list]}")


if __name__ == "__main__":
    main()
