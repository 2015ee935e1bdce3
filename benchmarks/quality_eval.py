"""Quality-parity evaluation: run the BASELINE.md config-ladder models to
convergence and record posterior summaries.

Usage: python benchmarks/quality_eval.py
         [ou|ou_synthetic|lv|both|lorenz|sir|highdim|all|coverage]
         [--iters N] [--seeds K]
Writes benchmarks/results_<name>.json (committed results are round evidence).
``coverage`` runs OU-synthetic across K seeds and reports per-parameter
|bias|/sigma z-scores plus empirical 2-sigma and 90%-CI coverage.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import viforsdes_tpu as vt  # noqa: E402


def run_ou(n_iterations: int) -> dict:
    from ornstein_uhlenbeck import OrnsteinUhlenbeck

    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
        values=[[2.0], [1.5], [0.8], [1.2], [0.9], [1.1]],
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=OrnsteinUhlenbeck(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.1),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(time_step=0.05, batch_size=128, n_iterations=n_iterations),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            sde_param_positive_dims=[0, 2],
            param_names=["kappa", "mu", "sigma"],
            pretrain=vt.PretrainConfig(),
            console=vt.Console(enabled=False),
        ),
    )
    elapsed = time.perf_counter() - t0
    return _summarize("ou", posterior, ["kappa", "mu", "sigma"], n_iterations, elapsed)


def run_lv(n_iterations: int) -> dict:
    from lotka_volterra import LotkaVolterra

    observations = vt.Observations(
        times=[0.0, 10.0, 20.0, 30.0, 40.0],
        values=[
            [71.0, 79.0],
            [47.61225908, 447.20971405],
            [80.53119269, 50.26254069],
            [23.10087379, 339.40432691],
            [158.05238324, 66.79611979],
        ],
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=LotkaVolterra(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=1.0),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=0.0, std=1.5, dim=3),
        time_horizon=40.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(time_step=0.1, batch_size=24, n_iterations=n_iterations),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            state_positive_dims=[0, 1],
            sde_param_positive_dims=[0, 1, 2],
            param_names=["theta1", "theta2", "theta3"],
            pretrain=vt.PretrainConfig(),
            console=vt.Console(enabled=False),
        ),
    )
    elapsed = time.perf_counter() - t0
    return _summarize("lv", posterior, ["theta1", "theta2", "theta3"], n_iterations, elapsed)


def _summarize(name, posterior, param_names, n_iterations, elapsed, true_params=None) -> dict:
    s = posterior.summary(n_samples=1000)
    hist = posterior.evidence_lower_bound_history
    tail = hist[-200:]
    mean = np.asarray(s.sde_parameter_mean)
    std = np.asarray(s.sde_parameter_std)
    result = {
        "name": name,
        "n_iterations": n_iterations,
        "train_seconds": round(elapsed, 1),
        "steps_per_sec": round(n_iterations / elapsed, 2),
        "elbo_final_mean200": float(np.mean(tail)),
        "elbo_best": float(np.max(hist)),
        "posterior_mean": {k: float(v) for k, v in zip(param_names, mean)},
        "posterior_std": {k: float(v) for k, v in zip(param_names, std)},
        "posterior_q05": {k: float(v) for k, v in zip(param_names, np.asarray(s.sde_parameter_quantiles.q05))},
        "posterior_q95": {k: float(v) for k, v in zip(param_names, np.asarray(s.sde_parameter_quantiles.q95))},
    }
    if true_params is not None:
        truth = np.asarray(true_params, dtype=np.float64)
        result["true_params"] = {k: float(v) for k, v in zip(param_names, truth)}
        result["within_2sigma"] = {
            k: bool(abs(m - t) <= 2.0 * sd)
            for k, m, sd, t in zip(param_names, mean, std, truth)
        }
        # Calibration diagnostic (round-2 verdict weak #4): the boolean above
        # becomes unreachable as stds shrink, so report |bias|/sigma directly —
        # z <= 2 is the bar; z >> 2 with small bias means overconfident CIs.
        result["z_scores"] = {
            k: round(abs(m - t) / max(sd, 1e-12), 2)
            for k, m, sd, t in zip(param_names, mean, std, truth)
        }
        result["rel_bias"] = {
            k: round((m - t) / t, 4) if t != 0 else float(m - t)
            for k, m, t in zip(param_names, mean, truth)
        }
    out = Path(__file__).parent / f"results_{name}.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result), flush=True)
    return result


def run_ou_synthetic(
    n_iterations: int,
    seed: int = 11,
    name: str = "ou_synthetic",
    *,
    iw_samples: int = 1,
    full_cov: bool = False,
    warmup: int = 0,
    init_std: float = 1.0,
) -> dict:
    """OU headline shape with synthetic ground truth (VERDICT round-1 item 3):
    the reference's 6 hand-fixed observations have no generating theta, so
    recovery is unfalsifiable there; here observations are simulated from a
    known theta and recovery is asserted within 2 sigma."""
    import jax
    import jax.numpy as jnp
    from ornstein_uhlenbeck import OrnsteinUhlenbeck

    true_theta = (1.5, 1.0, 0.4)  # kappa, mu, sigma
    sde = OrnsteinUhlenbeck()
    x0 = jnp.asarray([[2.5]])
    traj = vt.euler_maruyama(
        sde, x0, jnp.asarray([true_theta]), 5.0, 0.05, key=jax.random.key(seed)
    )
    idx = np.arange(0, 101, 10)  # 11 obs, every 0.5
    observations = vt.Observations(
        times=(idx * 0.05).tolist(), values=np.asarray(traj[0, idx])
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=sde,
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=0.01),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.05, batch_size=128, n_iterations=n_iterations,
                iw_samples=iw_samples, theta_full_covariance=full_cov,
                theta_warmup_steps=warmup,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            sde_param_positive_dims=[0, 2],
            sde_param_init_std=init_std,
            param_names=["kappa", "mu", "sigma"],
            pretrain=vt.PretrainConfig(),
            console=vt.Console(enabled=False),
        ),
    )
    elapsed = time.perf_counter() - t0
    return _summarize(
        name, posterior, ["kappa", "mu", "sigma"], n_iterations, elapsed,
        true_params=true_theta,
    )


def run_coverage(
    n_iterations: int,
    n_seeds: int = 5,
    *,
    iw_samples: int = 1,
    full_cov: bool = False,
    warmup: int = 0,
    init_std: float = 1.0,
) -> dict:
    """Empirical CI calibration across seeds (round-2 verdict task 4).

    Each seed simulates its own OU trajectory from the same true theta and
    runs the full pipeline; coverage = fraction of seeds whose interval
    contains the truth, reported for the 2-sigma interval and the (q05, q95)
    90% quantile interval. Well-calibrated posteriors give ~0.95 / ~0.90;
    the failing ladders' signature (tiny stds, biased means) gives ~0.
    """
    param_names = ["kappa", "mu", "sigma"]
    runs = []
    for i in range(n_seeds):
        runs.append(
            run_ou_synthetic(
                n_iterations, seed=11 + 37 * i, name=f"coverage_seed{i}",
                iw_samples=iw_samples, full_cov=full_cov,
                warmup=warmup, init_std=init_std,
            )
        )
    truth = runs[0]["true_params"]
    coverage_2s = {}
    coverage_90 = {}
    mean_abs_z = {}
    for k in param_names:
        in_2s = [abs(r["posterior_mean"][k] - truth[k]) <= 2 * r["posterior_std"][k] for r in runs]
        in_90 = [r["posterior_q05"][k] <= truth[k] <= r["posterior_q95"][k] for r in runs]
        coverage_2s[k] = sum(in_2s) / n_seeds
        coverage_90[k] = sum(in_90) / n_seeds
        mean_abs_z[k] = round(float(np.mean([r["z_scores"][k] for r in runs])), 2)
    result = {
        "name": "coverage",
        "n_seeds": n_seeds,
        "n_iterations": n_iterations,
        "iw_samples": iw_samples,
        "theta_full_covariance": full_cov,
        "theta_warmup_steps": warmup,
        "sde_param_init_std": init_std,
        "true_params": truth,
        "coverage_2sigma": coverage_2s,
        "coverage_q05_q95": coverage_90,
        "mean_abs_z": mean_abs_z,
        "per_seed": [
            {
                "posterior_mean": r["posterior_mean"],
                "posterior_std": r["posterior_std"],
                "z_scores": r["z_scores"],
            }
            for r in runs
        ],
    }
    out = Path(__file__).parent / "results_coverage.json"
    out.write_text(json.dumps(result, indent=2))
    # per-seed results_coverage_seed*.json are intermediate artifacts
    for i in range(n_seeds):
        (Path(__file__).parent / f"results_coverage_seed{i}.json").unlink(missing_ok=True)
    print(json.dumps(result), flush=True)
    return result


def run_highdim(
    n_iterations: int,
    *,
    iw_samples: int = 1,
    full_cov: bool = False,
    batch_size: int = 1024,
    grad_accum_steps: int = 1,
    obs_every: float = 0.25,
    obs_variance: float = 0.1,
    obs_noise: float = 0.0,
    warmup: int = 500,
    init_std: float = 0.5,
    learn_obs_var: bool = False,
    obs_var_final: float | None = None,
    anneal_steps: int = 0,
    head_dim: int = 128,
    head_layers: int = 2,
    head_chol: str = "full",
    checkpoint_every: int | None = None,
    resume_from: str | None = None,
    name: str = "highdim",
) -> dict:
    """Ladder config 5 quality (single chip; DP mechanics covered by
    tests/test_parallel.py and dryrun_multichip): OU d=32, recovery of the
    shared (kappa, mu, sigma) against the generating theta.

    Round-3 note on obs_variance: the simulated observations are NOISELESS
    trajectory values, but the round-2 run told the likelihood variance=0.1 —
    larger than a segment's own diffusion variance (sigma^2 * 0.25 ~ 0.06), so
    the ELBO could book real path variation as observation noise, which is
    exactly the measured failure (sigma 0.26 vs true 0.5). A small claimed
    variance (0.01, matching run_ou_synthetic) pins the paths to the data."""
    import jax
    from highdim_ou_dp import HighDimOU, simulate_observations

    true_theta = (1.2, 0.8, 0.5)
    # Dense observations (every 0.25, 21 obs) and a 128-wide head: with the
    # original 6 obs and a 64-wide head the 32-dim bridges were too crude and
    # theta collapsed toward weak dynamics (kappa 1.06 -> 0.31-0.37) despite a
    # near-truth pretrain — the same degenerate-basin failure documented for
    # Lorenz-63 in BASELINE.md.
    # obs_noise > 0 draws real observation noise so the claimed likelihood
    # variance is correctly specified (set obs_noise = sqrt(obs_variance)):
    # with NOISELESS data the exact optimum at claim 0.01 is sigma* = 0.391
    # (z = 10 from truth) — unpassable for ANY inference method
    # (benchmarks/highdim_claim_sweep.py; BASELINE.md round-5 verdict).
    observations = simulate_observations(
        jax.random.key(3), obs_every=obs_every, noise_std=obs_noise
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=HighDimOU(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=obs_variance),
        prior=vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        time_horizon=5.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.05, batch_size=batch_size, n_iterations=n_iterations,
                theta_warmup_steps=warmup,
                iw_samples=iw_samples, theta_full_covariance=full_cov,
                grad_accum_steps=grad_accum_steps,
                learn_obs_variance=learn_obs_var,
                obs_variance_final=obs_var_final,
                obs_variance_anneal_steps=anneal_steps,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(
                hidden_dim=head_dim, num_layers=head_layers, cholesky=head_chol
            ),
            sde_param_positive_dims=[0, 2],
            sde_param_init_std=init_std,
            param_names=["kappa", "mu", "sigma"],
            pretrain=vt.PretrainConfig(),
            console=vt.Console(enabled=False),
            checkpoint_every=checkpoint_every,
            checkpoint_path=(
                Path(__file__).parent / f"ckpt_{name}.npz"
                if checkpoint_every
                else None
            ),
            resume_from=resume_from,
        ),
    )
    elapsed = time.perf_counter() - t0
    result = _summarize(
        name, posterior, ["kappa", "mu", "sigma"], n_iterations, elapsed,
        true_params=true_theta,
    )
    # Bridge health (round 5): the ladder-5 failures were traced to the
    # variational bridges saturating the DIAG_MIN cholesky floor
    # (benchmarks/bridge_diagnosis.py, BASELINE.md) — report the transition
    # stats with every run so collapse is visible in the artifact.
    from highdim_ab import bridge_stats

    result["bridge"] = bridge_stats(posterior, observations)
    result["config"] = {
        "obs_every": obs_every,
        "obs_noise": obs_noise,
        "obs_variance": obs_variance,
        "iw_samples": iw_samples,
        "theta_full_covariance": full_cov,
        "batch_size": batch_size,
        "grad_accum_steps": grad_accum_steps,
        "theta_warmup_steps": warmup,
        "sde_param_init_std": init_std,
        "head_dim": head_dim,
        "head_layers": head_layers,
        "head_chol": head_chol,
        "pretrain_global_objective": vt.PretrainConfig().global_objective,
        "learn_obs_variance": learn_obs_var,
        "learned_obs_variance": posterior.observation_variance(),
        "obs_variance_final": obs_var_final,
        "obs_variance_anneal_steps": anneal_steps,
    }
    (Path(__file__).parent / f"results_{name}.json").write_text(
        json.dumps(result, indent=2)
    )
    return result


def run_lorenz(
    n_iterations: int,
    *,
    obs_every: float = 0.1,
    head_dim: int = 64,
    head_layers: int = 2,
    obs_variance: float = 1.0,
    iw_samples: int = 1,
    full_cov: bool = False,
    batch_size: int = 32,
    seed: int | None = None,
    name: str = "lorenz",
) -> dict:
    """Ladder 3: dense obs, T=20, 2000-step scan.

    Config notes (BASELINE.md round-2 diagnosis): at 0.5-unit spacing the
    variational family's ELBO genuinely prefers degenerate drift (the GRU
    bridges cannot track chaos across 50-step segments; at 0.2 the beta
    component still partially collapses). 0.1-unit spacing (10-step segments)
    keeps bridging feasible but leaves ~20% bias; round-3 knobs (obs_every,
    head_dim/head_layers) execute the remaining leads. theta_warmup lets the
    zero-init path model learn before theta moves; init_std 0.3 keeps early
    theta samples near the global pretrain's mean."""
    import jax
    from lorenz63 import StochasticLorenz63, simulate_observations, TRUE_PARAMS

    # seed=None reproduces the round-3 configuration (data key 17, train seed
    # 0); an explicit seed varies BOTH the simulated dataset and the training
    # RNG, making replicates a full-pipeline robustness check.
    data_key, train_seed = (17, 0) if seed is None else (seed, seed)
    observations = simulate_observations(
        jax.random.key(data_key), obs_every=obs_every
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=StochasticLorenz63(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(variance=obs_variance),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=1.0, std=1.5, dim=3),
        time_horizon=20.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.01, batch_size=batch_size, n_iterations=n_iterations,
                theta_warmup_steps=1000,
                iw_samples=iw_samples, theta_full_covariance=full_cov,
            ),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=head_dim, num_layers=head_layers),
            sde_param_positive_dims=[0, 1, 2],
            sde_param_init_std=0.3,
            param_names=["sigma_L", "rho", "beta"],
            pretrain=vt.PretrainConfig(n_iterations=300, batch_size=1024),
            console=vt.Console(enabled=False),
            seed=train_seed,
        ),
    )
    elapsed = time.perf_counter() - t0
    result = _summarize(
        name, posterior, ["sigma_L", "rho", "beta"], n_iterations, elapsed,
        true_params=TRUE_PARAMS,
    )
    result["seed"] = {"data_key": data_key, "train_seed": train_seed}
    (Path(__file__).parent / f"results_{name}.json").write_text(
        json.dumps(result, indent=2)
    )
    return result


def run_sir(n_iterations: int) -> dict:
    import jax.numpy as jnp
    from sir_epidemic import SIR, POPULATION

    observations = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        values=[[5.0], [14.0], [42.0], [95.0], [155.0], [170.0], [130.0], [85.0], [50.0]],
    )
    t0 = time.perf_counter()
    posterior = vt.infer(
        sde=SIR(),
        observations=observations,
        observation_likelihood=vt.GaussianObservationLikelihood(
            variance=4.0, obs_matrix=[[0.0, 1.0]]
        ),
        prior=vt.Prior(type=vt.PriorType.LOG_NORMAL, mean=0.0, std=1.0, dim=2),
        time_horizon=8.0,
        config=vt.InferenceConfig(
            training=vt.TrainingConfig(time_step=0.02, batch_size=64, n_iterations=n_iterations),
            encoder=vt.EncoderConfig(hidden_dim=256, num_heads=4, depth=8),
            head=vt.HeadConfig(hidden_dim=64, num_layers=2),
            state_positive_dims=[0, 1],
            sde_param_positive_dims=[0, 1],
            param_names=["beta", "gamma"],
            x0=jnp.asarray([POPULATION - 5.0, 5.0]),
            console=vt.Console(enabled=False),
        ),
    )
    elapsed = time.perf_counter() - t0
    return _summarize("sir", posterior, ["beta", "gamma"], n_iterations, elapsed)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    iters = None
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if which in ("ou", "both", "all"):
        run_ou(iters or 20000)
    if which in ("ou_synthetic", "all"):
        run_ou_synthetic(
            iters or 20000,
            iw_samples=int(sys.argv[sys.argv.index("--iw") + 1]) if "--iw" in sys.argv else 1,
            full_cov="--full-cov" in sys.argv,
        )
    if which in ("lv", "both", "all"):
        run_lv(iters or 30000)
    if which in ("lorenz", "all"):
        kw = {}
        for flag, cast, key in [
            ("--obs-every", float, "obs_every"),
            ("--head-dim", int, "head_dim"),
            ("--head-layers", int, "head_layers"),
            ("--obs-variance", float, "obs_variance"),
            ("--iw", int, "iw_samples"),
            ("--batch", int, "batch_size"),
            ("--seed", int, "seed"),
            ("--name", str, "name"),
        ]:
            if flag in sys.argv:
                kw[key] = cast(sys.argv[sys.argv.index(flag) + 1])
        if "--full-cov" in sys.argv:
            kw["full_cov"] = True
        run_lorenz(iters or 10000, **kw)
    if which in ("sir", "all"):
        run_sir(iters or 10000)
    if which in ("highdim", "all"):
        kw = {}
        for flag, cast, key in [
            ("--iw", int, "iw_samples"),
            ("--batch", int, "batch_size"),
            ("--accum", int, "grad_accum_steps"),
            ("--obs-every", float, "obs_every"),
            ("--obs-variance", float, "obs_variance"),
            ("--obs-noise", float, "obs_noise"),
            ("--warmup", int, "warmup"),
            ("--init-std", float, "init_std"),
            ("--ckpt-every", int, "checkpoint_every"),
            ("--obs-var-final", float, "obs_var_final"),
            ("--anneal-steps", int, "anneal_steps"),
            ("--head-dim", int, "head_dim"),
            ("--head-layers", int, "head_layers"),
            ("--chol", str, "head_chol"),
            ("--resume", str, "resume_from"),
            ("--name", str, "name"),
        ]:
            if flag in sys.argv:
                kw[key] = cast(sys.argv[sys.argv.index(flag) + 1])
        if "--full-cov" in sys.argv:
            kw["full_cov"] = True
        if "--learn-obs-var" in sys.argv:
            kw["learn_obs_var"] = True
        run_highdim(iters or 8000, **kw)
    if which == "coverage":
        seeds = 5
        if "--seeds" in sys.argv:
            seeds = int(sys.argv[sys.argv.index("--seeds") + 1])
        run_coverage(
            iters or 10000,
            n_seeds=seeds,
            iw_samples=int(sys.argv[sys.argv.index("--iw") + 1]) if "--iw" in sys.argv else 1,
            full_cov="--full-cov" in sys.argv,
            warmup=int(sys.argv[sys.argv.index("--warmup") + 1]) if "--warmup" in sys.argv else 0,
            init_std=float(sys.argv[sys.argv.index("--init-std") + 1]) if "--init-std" in sys.argv else 1.0,
        )
