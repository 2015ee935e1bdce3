"""Ground-truth per-op profile of the REAL jitted train step via jax.profiler.

Round-2's lesson (BASELINE.md): on this tunnel, op-isolation and encoder-only
micro-benchmarks produced reversals against end-to-end numbers three separate
times. This harness is the antidote — it captures an xplane device trace of
the actual donated train step mid-training and converts it with xprof into a
per-HLO-op time table, so optimization decisions are made from the compiled
program's real timeline rather than from reconstructed micro-benchmarks.

Usage:
    python benchmarks/profile_trace.py ou      [--steps 30]
    python benchmarks/profile_trace.py lorenz  [--steps 8]

Writes benchmarks/trace_<name>.json: top ops by self-time, grouped by
category, plus the measured wall-clock per step for cross-checking the trace
against reality (the two must agree for the trace to be decision-grade).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def build_trainer(which: str):
    import jax
    import viforsdes_tpu as vt
    from viforsdes_tpu.inference.trainer import VariationalInferenceTrainer

    if which == "ou":
        from ornstein_uhlenbeck import OrnsteinUhlenbeck

        return VariationalInferenceTrainer(
            sde=OrnsteinUhlenbeck(),
            observations=vt.Observations(
                times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
                values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
            ),
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
    if which == "lorenz":
        from lorenz63 import StochasticLorenz63, simulate_observations

        observations = simulate_observations(jax.random.key(17), obs_every=0.1)
        return VariationalInferenceTrainer(
            sde=StochasticLorenz63(),
            observations=observations,
            observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
            prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
            time_horizon=20.0,
            config=vt.TrainingConfig(time_step=0.01, batch_size=32, n_iterations=1),
            encoder_config=vt.EncoderConfig(hidden_dim=256, cond_dim=256, num_heads=4, depth=8),
            head_config=vt.HeadConfig(hidden_dim=64, num_layers=2),
            state_positive_dims=[],
            sde_param_positive_dims=[0, 1, 2],
            console=vt.Console(enabled=False),
        )
    raise SystemExit(f"unknown config {which!r}")


def capture(which: str, n_steps: int, logdir: Path) -> float:
    import jax

    tr = build_trainer(which)
    p, o, e, k = tr.params, tr.opt_state, tr.ema_params, tr._train_key

    t0 = time.perf_counter()
    p, o, e, mx = tr._train_step(p, o, e, k)
    jax.block_until_ready(mx)
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(3):  # warm
        p, o, e, mx = tr._train_step(p, o, e, jax.random.fold_in(k, i))
    jax.block_until_ready(mx)

    t0 = time.perf_counter()
    with jax.profiler.trace(str(logdir)):
        for i in range(n_steps):
            p, o, e, mx = tr._train_step(p, o, e, jax.random.fold_in(k, 100 + i))
        jax.block_until_ready(mx)
    wall_ms = (time.perf_counter() - t0) / n_steps * 1000
    print(f"traced {n_steps} steps, wall {wall_ms:.2f} ms/step", flush=True)
    return wall_ms


def analyze(logdir: Path, n_steps: int) -> dict:
    """Convert the xplane to xprof's HLO-op stats and aggregate."""
    from xprof.convert import raw_to_tool_data

    xspaces = sorted(glob.glob(str(logdir / "**/*.xplane.pb"), recursive=True))
    if not xspaces:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xspaces[-1]], "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    rows = _parse_hlo_stats(data)
    return rows


def _parse_hlo_stats(data: str) -> dict:
    """hlo_stats arrives as gviz JSON; reduce it to (category, op) -> time."""
    tab = json.loads(data)
    cols = [c["label"] for c in tab["cols"]]
    out = []
    for row in tab["rows"]:
        vals = [c["v"] if isinstance(c, dict) else c for c in row["c"]]
        out.append(dict(zip(cols, vals)))
    return {"cols": cols, "rows": out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["ou", "lorenz"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--analyze-only", action="store_true",
                    help="re-analyze an existing logdir without touching the TPU")
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="wall ms/step from the capture run (with --analyze-only)")
    ap.add_argument("--tag", default=None,
                    help="suffix for the output json (e.g. 'splash'), so "
                    "variant traces don't clobber the committed default ones")
    args = ap.parse_args()
    n_steps = args.steps or (30 if args.which == "ou" else 8)
    suffix = f"{args.which}_{args.tag}" if args.tag else args.which
    logdir = Path(args.logdir or f"/tmp/jaxtrace_{suffix}")

    wall_ms = args.wall_ms or 0.0
    if not args.analyze_only:
        wall_ms = capture(args.which, n_steps, logdir)
    stats = analyze(logdir, n_steps)

    # aggregate: self-time by HLO category and the top individual ops
    rows = stats["rows"]
    total_us = 0.0
    by_cat: dict[str, float] = {}
    ops = []
    for r in rows:
        t = r.get("Total self time (us)")
        if t is None:
            continue
        t = float(t)
        cat = str(r.get("HLO op category", "?"))
        total_us += t
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        ops.append(
            {
                "op": str(r.get("HLO op name", "?")),
                "category": cat,
                "program": str(r.get("Program id", "")),
                "occurrences": r.get("#Occurrences"),
                "avg_us": r.get("Avg. self time (us)"),
                "bound_by": r.get("Bound by"),
                "gflops_per_sec": r.get("Model GFLOP/s"),
                "hbm_gib_per_sec": r.get("HBM BW (GiB/s)"),
                "op_text": str(r.get("HLO op text", ""))[:220],
                "total_us": t,
            }
        )
    ops.sort(key=lambda d: -d["total_us"])
    per_step_scale = 1.0 / n_steps / 1000.0  # us-total -> ms/step

    # Roofline aggregate over ALL ops (the top-40 list covers only a fraction
    # of step time): per (category, bound-by) totals plus, for each bound
    # class, the time-weighted achieved rate — GFLOP/s for compute-bound ops
    # vs the v5e bf16 peak (394 TFLOP/s), GiB/s for HBM-bound ops vs the v5e
    # HBM peak (~819 GB/s = 763 GiB/s). "At the roofline" means the weighted
    # rate is near peak; a low rate with tiny per-op times means the bucket is
    # dispatch/granularity-bound, not bandwidth-starved.
    roofline: dict[str, dict] = {}
    for o in ops:
        bound = str(o.get("bound_by") or "Unknown")
        b = roofline.setdefault(
            bound,
            {"ms_per_step": 0.0, "n_ops": 0, "_rate_num": 0.0, "_rate_den": 0.0,
             "by_category_ms": {}},
        )
        b["ms_per_step"] += o["total_us"] * per_step_scale
        b["n_ops"] += int(o.get("occurrences") or 0)
        cat_ms = b["by_category_ms"]
        cat_ms[o["category"]] = (
            cat_ms.get(o["category"], 0.0) + o["total_us"] * per_step_scale
        )
        rate = {
            "Compute": o.get("gflops_per_sec"),
            "HBM": o.get("hbm_gib_per_sec"),
        }.get(bound)
        if rate:
            b["_rate_num"] += float(rate) * o["total_us"]
            b["_rate_den"] += o["total_us"]
    for bound, b in roofline.items():
        num, den = b.pop("_rate_num"), b.pop("_rate_den")
        b["ms_per_step"] = round(b["ms_per_step"], 3)
        b["by_category_ms"] = {
            k: round(v, 3)
            for k, v in sorted(b["by_category_ms"].items(), key=lambda kv: -kv[1])
        }
        if den:
            key = {"Compute": "weighted_gflops_per_sec",
                   "HBM": "weighted_hbm_gib_per_sec"}[bound]
            b[key] = round(num / den, 1)
            if bound == "Compute":
                b["pct_of_v5e_bf16_peak"] = round(100.0 * (num / den) / 394_000, 1)
            else:
                b["pct_of_v5e_hbm_peak"] = round(100.0 * (num / den) / 763.0, 1)

    summary = {
        "config": args.which,
        "n_steps_traced": n_steps,
        "wall_ms_per_step": round(wall_ms, 2),
        "device_total_ms_per_step": round(total_us * per_step_scale, 2),
        "by_category_ms_per_step": {
            k: round(v * per_step_scale, 3)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "roofline_by_bound": dict(
            sorted(roofline.items(), key=lambda kv: -kv[1]["ms_per_step"])
        ),
        "top_ops_ms_per_step": [
            {**d, "ms_per_step": round(d.pop("total_us") * per_step_scale, 3)}
            for d in ops[:40]
        ],
    }
    out = Path(__file__).parent / f"trace_{suffix}.json"
    out.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary["by_category_ms_per_step"], indent=2))
    for d in summary["top_ops_ms_per_step"][:25]:
        print(f"{d['ms_per_step']:9.3f} ms  {d['category']:<18} {d['op'][:70]}")
    print(f"wall {wall_ms:.2f} ms/step vs device-sum "
          f"{summary['device_total_ms_per_step']:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
