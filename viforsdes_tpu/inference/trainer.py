"""Training loop for black-box variational inference of SDEs.

Parity target: reference ``inference/trainer.py:34-262``:
- per step: sample theta ~ q (reparameterized), roll diffusion paths, compute
  the ELBO, step AdamW on ``-ELBO`` with global-norm clip, update the EMA;
- smoothed loss via bias-corrected EMA (decay 0.98, ``trainer.py:133-138``);
- best-ELBO tracking, per-step callback, rich progress UI;
- ``pretrain_sde_parameters``: moment-matching pre-fit of the theta-posterior
  mean against observations via Euler-Maruyama simulation of the true SDE
  (``trainer.py:208-259``).

TPU-first design:
- ONE jitted ``train_step(params, opt_state, ema, key) -> (..., metrics)``
  containing the whole step (sampling, ELBO, grad, optimizer, EMA). The Python
  loop only pumps steps and the console — the reference's per-op Python
  dispatch overhead and its separate ``torch.compile`` accelerator (C35) are
  replaced by this single compiled program.
- RNG: the per-step key is ``fold_in(base_key, step)`` — deterministic,
  resume-friendly, replacing implicit ``torch.randn`` state.
- Data parallel: pass a ``Mesh``; the global batch is sharded over the
  ``"data"`` axis with ``NamedSharding`` constraints and XLA inserts the
  gradient all-reduce (replacing DDP; SURVEY §2.3 notes the reference's DDP
  never actually synced grads — here sync is by construction). Metrics are
  means over the global batch, matching the reference's all-reduce-AVG intent.
- Device->host syncs happen once per console interval, not per step: metrics
  are staged as device arrays and fetched in chunks so the accelerator stays
  ahead of Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viforsdes_tpu.config import (
    EncoderConfig,
    HeadConfig,
    PretrainConfig,
    TrainingConfig,
)
from viforsdes_tpu.core.observations import (
    GaussianObservationLikelihood,
    ObservationLikelihood,
    Observations,
)
from viforsdes_tpu.core.priors import Prior
from viforsdes_tpu.core.sde import SDE
from viforsdes_tpu.core.solvers import euler_maruyama
from viforsdes_tpu.core.state_space import StateSpace
from viforsdes_tpu.inference.constants import (
    LOSS_EMA_DECAY,
    MAX_CONSECUTIVE_NONFINITE_STEPS,
    OBS_VARIANCE_FLOOR,
)
from viforsdes_tpu.inference.ema import ema_init, ema_update
from viforsdes_tpu.inference.elbo import (
    compute_evidence_lower_bound,
    observation_indices,
)
from viforsdes_tpu.inference.optimizer import make_optimizer
from viforsdes_tpu.inference.path_sampler import sample_diffusion_paths
from viforsdes_tpu.inference.types import EvidenceLowerBoundResult
from viforsdes_tpu.models.model import VariationalSDEPosterior
from viforsdes_tpu.parallel.mesh import DATA_AXIS
from viforsdes_tpu.utils.console import Console

Array = jax.Array


class StepMetrics(NamedTuple):
    elbo: Array
    observation_log_prob: Array
    sde_log_prob: Array
    generative_log_prob: Array
    prior_log_prob: Array
    posterior_log_prob: Array
    grad_norm: Array
    param_means: Array
    # consecutive non-finite update steps (optax ApplyIfFiniteState); the host
    # loop aborts when it exceeds MAX_CONSECUTIVE_NONFINITE_STEPS
    notfinite_count: Array


@dataclass
class TrainingState:
    """Final state returned by ``train`` (ref ``trainer.py:34-40``)."""

    step: int
    evidence_lower_bound_history: list[float]
    best_evidence_lower_bound: float
    params: dict
    ema_params: dict


class VariationalInferenceTrainer:
    def __init__(
        self,
        sde: SDE,
        observations: Observations,
        observation_likelihood: ObservationLikelihood,
        prior: Prior,
        time_horizon: float,
        config: TrainingConfig,
        encoder_config: EncoderConfig,
        head_config: HeadConfig,
        state_positive_dims: list[int],
        sde_param_positive_dims: list[int],
        *,
        console: Console | None = None,
        param_names: list[str] | None = None,
        sde_param_init_mean: Array | None = None,
        sde_param_init_std: float = 1.0,
        seed: int = 0,
        mesh: Mesh | None = None,
        x0: Array | None = None,
    ) -> None:
        self.sde = sde
        self.observations = observations
        self.observation_likelihood = observation_likelihood
        self.prior = prior
        self.time_horizon = float(time_horizon)
        self.config = config
        self.param_names = param_names
        self.console = console if console is not None else Console()
        self.state_space = StateSpace(sde.state_dim, state_positive_dims)
        self.sde_param_positive_dims = list(sde_param_positive_dims)
        self.mesh = mesh

        self.model = VariationalSDEPosterior(
            observation_dim=observations.values.shape[-1],
            state_dim=sde.state_dim,
            sde_param_dim=sde.sde_param_dim,
            encoder_config=encoder_config,
            head_config=head_config,
            sde_param_positive_dims=self.sde_param_positive_dims,
            obs_times=np.asarray(observations.times),
            time_horizon=self.time_horizon,
            time_step=config.time_step,
            theta_full_covariance=config.theta_full_covariance,
        )

        self.n_steps = self.model.encoder.n_grid - 1
        self.obs_indices = observation_indices(
            np.asarray(observations.times), config.time_step, self.n_steps
        )

        base = jax.random.key(seed)
        self._init_key, self._train_key, self._pretrain_key, self._eval_key = (
            jax.random.split(base, 4)
        )

        self.params = self.model.init(
            self._init_key,
            sde_param_init_mean=sde_param_init_mean,
            sde_param_init_std=sde_param_init_std,
        )
        if config.learn_obs_variance:
            # Learnable observation variance (config.py rationale): a scalar
            # log-variance in the params pytree, effective variance
            # OBS_VARIANCE_FLOOR + exp(log_variance), initialized at the
            # likelihood's claimed value.
            if not isinstance(observation_likelihood, GaussianObservationLikelihood):
                raise ValueError(
                    "learn_obs_variance requires a GaussianObservationLikelihood"
                )
            if observation_likelihood.variance <= OBS_VARIANCE_FLOOR:
                raise ValueError(
                    f"learn_obs_variance: initial variance must exceed the "
                    f"floor {OBS_VARIANCE_FLOOR}"
                )
            self.params["obs"] = {
                "log_variance": jnp.asarray(
                    np.log(observation_likelihood.variance - OBS_VARIANCE_FLOOR),
                    dtype=jnp.float32,
                )
            }
        if config.obs_variance_final is not None:
            # Deterministic anneal (config.py rationale: the learned variance
            # inflates early in training — round-4 ladder-5 falsification).
            if not isinstance(observation_likelihood, GaussianObservationLikelihood):
                raise ValueError(
                    "obs_variance_final requires a GaussianObservationLikelihood"
                )
            if config.obs_variance_final >= observation_likelihood.variance:
                raise ValueError(
                    "obs_variance_final must be below the likelihood's claimed "
                    "variance (the anneal only tightens the claim)"
                )
        self.optimizer = make_optimizer(config)
        self.opt_state = self.optimizer.init(self.params)
        self.ema_params = ema_init(self.params)

        # x0 = first observation (ref ``training_context.py:107-117``); partial
        # observation (obs_dim != state_dim) requires an explicit x0.
        if x0 is None:
            if observations.values.shape[-1] != sde.state_dim:
                raise ValueError(
                    "obs_dim != state_dim: pass an explicit x0 (the reference's "
                    "x0 = values[0] convention only covers full observation)"
                )
            x0 = observations.values[0]
        self._x0_single = jnp.asarray(x0, dtype=jnp.float32)

        if mesh is not None:
            if config.batch_size % mesh.shape[DATA_AXIS] != 0:
                raise ValueError(
                    f"batch_size {config.batch_size} must divide over the "
                    f"{mesh.shape[DATA_AXIS]}-way data mesh"
                )
            self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            self._replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, self._replicated)
            self.opt_state = jax.device_put(self.opt_state, self._replicated)
            self.ema_params = jax.device_put(self.ema_params, self._replicated)
        else:
            self._batch_sharding = None
            self._replicated = None

        self.step = 0
        self._start_step = 0
        # Number of optimizer steps actually applied to params — the source of
        # truth for checkpoint resume (the ELBO history can lag behind when
        # metrics are pending on device).
        self._completed_steps = 0
        self.evidence_lower_bound_history: list[float] = []
        self.best_evidence_lower_bound = float("-inf")

        self._train_chunks: dict[int, Callable] = {}
        self._train_step = self._build_train_step()

    # ---------------------------------------------------- checkpoint / resume

    def save_checkpoint(self, path) -> None:
        """Mid-training checkpoint incl. optimizer state (a capability the
        reference lacked — it could only save final posteriors, SURVEY §5.4)."""
        from viforsdes_tpu.utils.pytree_io import save_checkpoint

        save_checkpoint(
            path,
            trees={
                "params": self.params,
                "opt_state": self.opt_state,
                "ema": self.ema_params,
            },
            metadata={
                "next_step": self._completed_steps,
                "evidence_lower_bound_history": [
                    float(v) for v in self.evidence_lower_bound_history
                ],
                "best_evidence_lower_bound": float(self.best_evidence_lower_bound),
            },
        )

    def restore_checkpoint(self, path) -> None:
        """Resume training exactly: per-step keys are ``fold_in(base, step)``,
        so a restored run replays the same key sequence it would have seen."""
        from viforsdes_tpu.utils.pytree_io import load_checkpoint

        trees, meta = load_checkpoint(
            path,
            templates={
                "params": self.params,
                "opt_state": self.opt_state,
                "ema": self.ema_params,
            },
            required_metadata=(
                "next_step",
                "evidence_lower_bound_history",
                "best_evidence_lower_bound",
            ),
            kind="trainer",
        )
        self.params = trees["params"]
        self.opt_state = trees["opt_state"]
        self.ema_params = trees["ema"]
        if self.mesh is not None:
            self.params = jax.device_put(self.params, self._replicated)
            self.opt_state = jax.device_put(self.opt_state, self._replicated)
            self.ema_params = jax.device_put(self.ema_params, self._replicated)
        self.evidence_lower_bound_history = list(
            meta["evidence_lower_bound_history"]
        )
        self.best_evidence_lower_bound = meta["best_evidence_lower_bound"]
        self._start_step = int(meta["next_step"])
        self._completed_steps = self._start_step
        self.step = max(self._start_step - 1, 0)

    # ------------------------------------------------------------ train step

    def _shard_batch(self, x: Array) -> Array:
        if self._batch_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self._batch_sharding)

    def _annealed_obs_variance(self, step: Array | None) -> Array:
        """Claimed observation variance at ``step`` under the deterministic
        log-linear anneal (``config.obs_variance_final`` over
        ``config.obs_variance_anneal_steps`` steps, starting after
        ``theta_warmup_steps``). ``step=None`` — post-training evaluation —
        resolves to the final (tightest) value."""
        vf = float(self.config.obs_variance_final)
        if step is None:
            return jnp.float32(vf)
        v0 = float(self.observation_likelihood.variance)
        t = jnp.clip(
            (jnp.asarray(step, jnp.float32) - self.config.theta_warmup_steps)
            / float(self.config.obs_variance_anneal_steps),
            0.0,
            1.0,
        )
        return jnp.exp(
            (1.0 - t) * float(np.log(v0)) + t * float(np.log(vf))
        ).astype(jnp.float32)

    def _elbo_from_params(
        self, params: dict, key: Array, batch_size: int, step: Array | None = None
    ) -> EvidenceLowerBoundResult:
        k_theta, k_path = jax.random.split(key)
        iw = self.config.iw_samples
        theta = self.model.theta_posterior.rsample(
            params["theta"], k_theta, batch_size // iw
        )
        if iw > 1:
            # contiguous groups of iw paths per theta (elbo.py reshapes [B]
            # -> [B/iw, iw] for the within-group logsumexp)
            theta = jnp.repeat(theta, iw, axis=0)
        theta = self._shard_batch(theta)
        x0 = jnp.broadcast_to(self._x0_single, (batch_size, self.sde.state_dim))
        x0 = self._shard_batch(x0)
        sample = sample_diffusion_paths(
            self.model.encoder,
            self.model.head,
            params,
            self.observations.values,
            theta,
            x0,
            self.config.time_step,
            self.state_space,
            k_path,
            compute_dtype=self.config.compute_dtype.value_dtype,
            sde=self.sde,
        )
        if self.config.obs_variance_final is not None:
            obs_variance = self._annealed_obs_variance(step)
        elif self.config.learn_obs_variance:
            obs_variance = OBS_VARIANCE_FLOOR + jnp.exp(
                params["obs"]["log_variance"]
            )
        else:
            obs_variance = None
        return compute_evidence_lower_bound(
            self.sde,
            self.observations,
            self.observation_likelihood,
            self.prior,
            self.model.theta_posterior,
            params["theta"],
            theta,
            sample,
            self.config.time_step,
            obs_indices=self.obs_indices,
            iw_samples=iw,
            obs_variance=obs_variance,
        )

    def _step_math(self, params, opt_state, ema, key, theta_scale, step=None):
        """One optimizer step (shared by the single-step and scan-chunked
        dispatch paths — identical math, so chunking cannot drift). ``step``
        (traced int32) only feeds schedules that depend on the step index —
        currently the observation-variance anneal; None when no such
        schedule is active."""
        if self.config.obs_variance_final is not None and step is None:
            # A training caller that forgets to thread the step while the
            # anneal is active would otherwise silently train at the FINAL
            # (tightest) claimed variance from step 0 — exactly the
            # fixed-small-variance divergence mode the anneal exists to
            # avoid (round-3 all-NaN run, BASELINE.md). step=None stays
            # legal only for post-training evaluation paths.
            raise ValueError(
                "obs_variance_final is set: training steps must thread the "
                "step index into _step_math"
            )
        batch_size = self.config.batch_size
        accum = self.config.grad_accum_steps
        micro = batch_size // accum

        def loss_fn(params: dict, key: Array):
            result = self._elbo_from_params(params, key, micro, step=step)
            return -result.evidence_lower_bound, result

        if accum == 1:
            (_, result), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key
            )
        else:
            # Exact gradient accumulation (config.grad_accum_steps): the
            # objective is a mean over theta groups and groups never span
            # microbatches, so averaging microbatch gradients reproduces the
            # full-batch gradient with 1/accum of the activation memory.
            res_shape = jax.eval_shape(
                lambda p, k: loss_fn(p, k)[1], params, key
            )
            init = (
                jax.tree.map(jnp.zeros_like, params),
                jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), res_shape
                ),
            )

            def acc_body(carry, i):
                g_acc, r_acc = carry
                k_i = jax.random.fold_in(key, i)
                (_, res), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, k_i
                )
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, r_acc, res),
                ), None

            (g_sum, r_sum), _ = jax.lax.scan(
                acc_body, init, jnp.arange(accum), length=accum
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            result = jax.tree.map(lambda r: r / accum, r_sum)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        if theta_scale is not None:
            # theta warmup: zero the APPLIED theta update (keeps AdamW's
            # weight decay from dragging the frozen mean; moments still
            # accumulate so release is smooth). The learnable observation
            # variance freezes with theta: the claimed variance anchors early
            # path learning while the bridges are still random.
            updates = {
                **updates,
                "theta": jax.tree.map(
                    lambda u: u * theta_scale, updates["theta"]
                ),
            }
            if "obs" in updates:
                updates["obs"] = jax.tree.map(
                    lambda u: u * theta_scale, updates["obs"]
                )
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params)
        metrics = StepMetrics(
            elbo=result.evidence_lower_bound,
            observation_log_prob=result.components.observation_log_prob,
            sde_log_prob=result.components.sde_log_prob,
            generative_log_prob=result.components.generative_log_prob,
            prior_log_prob=result.components.prior_log_prob,
            posterior_log_prob=result.components.posterior_log_prob,
            grad_norm=grad_norm,
            param_means=self.model.theta_posterior.expected_value(params["theta"]),
            notfinite_count=getattr(
                opt_state, "notfinite_count", jnp.zeros((), jnp.int32)
            ),
        )
        return params, opt_state, ema, metrics

    def _build_train_step(self) -> Callable:
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, ema, key, theta_scale=None, step=None):
            return self._step_math(params, opt_state, ema, key, theta_scale, step)

        return train_step

    def _get_train_chunk(self, length: int) -> Callable:
        """K steps per dispatch as one jitted ``lax.scan`` (config
        ``steps_per_call``): on a high-dispatch-latency link one call covers K
        optimizer steps, keeping the chip busy (device-op sum 9.0 ms/step vs
        ~11 ms wall per-step at the OU headline, BASELINE.md). Keys are
        ``fold_in(base, step)`` from the scanned step index — the exact
        sequence the per-step path uses, so the two dispatch modes produce
        bit-identical training (tests/test_inference.py)."""
        fn = self._train_chunks.get(length)
        if fn is not None:
            return fn

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_chunk(params, opt_state, ema, steps, theta_scales):
            def body(carry, x):
                params, opt_state, ema = carry
                step, theta_scale = x
                key = jax.random.fold_in(self._train_key, step)
                params, opt_state, ema, metrics = self._step_math(
                    params, opt_state, ema, key, theta_scale,
                    step if self.config.obs_variance_final is not None else None,
                )
                return (params, opt_state, ema), metrics

            (params, opt_state, ema), metrics = jax.lax.scan(
                body, (params, opt_state, ema), (steps, theta_scales),
                length=length,
            )
            return params, opt_state, ema, metrics

        self._train_chunks[length] = train_chunk
        return train_chunk

    def _resolve_steps_per_call(self, update_interval: int) -> int:
        spc = self.config.steps_per_call
        if spc == 0:
            # auto: chunk long runs by the flush interval; short runs stay
            # single-step so the extra compile cannot cost more than it saves
            remaining = self.config.n_iterations - self._start_step
            spc = update_interval if remaining >= 3 * update_interval else 1
        # chunks never span a flush boundary, so larger values cannot be used
        return max(1, min(spc, update_interval))

    # ----------------------------------------------------------------- train

    def train(
        self,
        callback: Callable[[int, float], None] | None = None,
        *,
        update_interval: int = 10,
        checkpoint_every: int | None = None,
        checkpoint_path=None,
    ) -> TrainingState:
        self.console.config_panel(self.config)

        # Rebuild the smoothed-loss EMA from history when resuming.
        loss_ema = 0.0
        for i, elbo in enumerate(self.evidence_lower_bound_history):
            loss_ema = (
                LOSS_EMA_DECAY * loss_ema + (1 - LOSS_EMA_DECAY) * (-elbo)
                if i > 0
                else -elbo
            )
        pending: list[tuple[int, StepMetrics]] = []

        def flush(progress, keep_last: int = 0) -> None:
            """Fetch pending device metrics to host. ``keep_last=1`` leaves the
            most recent dispatch in flight: ``device_get`` on it would block
            until the step completes, exposing one full host->device RTT per
            flush interval (measured ~60 ms on this tunnel vs an 11 ms step —
            the dominant overhead of short-step configs). Fetching only older,
            already-completed entries lets the newest chunk keep the device
            busy; the console then lags one interval, which is invisible at
            ~1 Hz update rates."""
            nonlocal loss_ema
            if len(pending) <= keep_last:
                return
            take = pending[: len(pending) - keep_last]
            del pending[: len(take)]
            fetched = jax.device_get(take)
            rows: list[tuple[int, StepMetrics]] = []
            for first_step, m in fetched:
                if np.ndim(m.elbo) == 0:
                    rows.append((first_step, m))
                else:
                    # scan-chunked dispatch: leaves carry a leading [K] axis
                    for i in range(np.shape(m.elbo)[0]):
                        rows.append(
                            (first_step + i, jax.tree.map(lambda a: a[i], m))
                        )
            for step, m in rows:
                elbo = float(m.elbo)
                loss_ema = (
                    LOSS_EMA_DECAY * loss_ema + (1 - LOSS_EMA_DECAY) * (-elbo)
                    if step > 0
                    else -elbo
                )
                smoothed_loss = loss_ema / (1 - LOSS_EMA_DECAY ** (step + 1))
                self.evidence_lower_bound_history.append(elbo)
                # Caveat under the obs-variance anneal: the objective's
                # claimed variance changes every step, so history/EMA/best
                # compare ELBOs computed against DIFFERENT variances —
                # best-ELBO systematically favors early (loose-variance)
                # steps. Diagnostic only (nothing snapshots params off it);
                # don't read anneal-mode logs as regressing.
                if elbo > self.best_evidence_lower_bound:
                    self.best_evidence_lower_bound = elbo
                if callback is not None:
                    callback(step, elbo)
            last_step, last = rows[-1]
            # Divergence abort (host side): apply_if_finite skips non-finite
            # updates, so params are still at their last finite values here —
            # raising beats letting an unattended run burn hours producing
            # nothing (or, past optax's give-up threshold, applying the NaN).
            worst = max(int(m.notfinite_count) for _, m in rows)
            if worst >= MAX_CONSECUTIVE_NONFINITE_STEPS:
                raise RuntimeError(
                    f"training diverged: {worst} consecutive non-finite update "
                    f"steps by step {last_step} (params remain at their last "
                    f"finite values; inspect the latest checkpoint)"
                )
            progress.update(
                step=last_step,
                loss=smoothed_loss,
                elbo=float(last.elbo),
                best_elbo=self.best_evidence_lower_bound,
                components={
                    "observation_log_prob": float(last.observation_log_prob),
                    "sde_log_prob": float(last.sde_log_prob),
                    "generative_log_prob": float(last.generative_log_prob),
                    "prior_log_prob": float(last.prior_log_prob),
                    "posterior_log_prob": float(last.posterior_log_prob),
                },
                grad_norm=float(last.grad_norm),
                param_means=np.asarray(last.param_means),
            )

        with self.console.training_progress(
            self.config.n_iterations,
            update_interval=update_interval,
            param_names=self.param_names,
        ) as progress:
            warmup = self.config.theta_warmup_steps
            n_iterations = self.config.n_iterations
            chunk = self._resolve_steps_per_call(update_interval)
            checkpointing = (
                checkpoint_every is not None and checkpoint_path is not None
            )

            def is_boundary(completed: int) -> bool:
                """Host-sync points, in completed-step-count space: console
                flushes and checkpoint saves (chunks must not span these)."""
                if completed % update_interval == 0:
                    return True
                return checkpointing and completed % checkpoint_every == 0

            step = self._start_step
            while step < n_iterations:
                # dispatch up to the next boundary in one or more calls
                seg_end = step + 1
                while seg_end < n_iterations and not is_boundary(seg_end):
                    seg_end += 1
                while step < seg_end:
                    if chunk > 1 and seg_end - step >= chunk:
                        steps_arr = jnp.arange(step, step + chunk, dtype=jnp.int32)
                        scales = (
                            (steps_arr >= warmup).astype(jnp.float32)
                            if warmup > 0
                            else jnp.ones(chunk, dtype=jnp.float32)
                        )
                        fn = self._get_train_chunk(chunk)
                        self.params, self.opt_state, self.ema_params, metrics = fn(
                            self.params, self.opt_state, self.ema_params,
                            steps_arr, scales,
                        )
                        pending.append((step, metrics))
                        step += chunk
                    else:
                        key = jax.random.fold_in(self._train_key, step)
                        step_arg = (
                            jnp.int32(step)
                            if self.config.obs_variance_final is not None
                            else None
                        )
                        if warmup > 0:
                            theta_scale = jnp.float32(0.0 if step < warmup else 1.0)
                            self.params, self.opt_state, self.ema_params, metrics = (
                                self._train_step(
                                    self.params, self.opt_state, self.ema_params,
                                    key, theta_scale, step=step_arg,
                                )
                            )
                        else:
                            self.params, self.opt_state, self.ema_params, metrics = (
                                self._train_step(
                                    self.params, self.opt_state, self.ema_params,
                                    key, step=step_arg,
                                )
                            )
                        pending.append((step, metrics))
                        step += 1
                    self.step = step - 1
                    self._completed_steps = step
                if step % update_interval == 0:
                    # leave the newest dispatch in flight (see flush docstring)
                    flush(progress, keep_last=1)
                if checkpointing and step % checkpoint_every == 0:
                    flush(progress)
                    self.save_checkpoint(checkpoint_path)
            flush(progress)

        return TrainingState(
            step=self.step,
            evidence_lower_bound_history=self.evidence_lower_bound_history,
            best_evidence_lower_bound=self.best_evidence_lower_bound,
            params=self.params,
            ema_params=self.ema_params,
        )

    # -------------------------------------------------------------- pretrain

    def pretrain_sde_parameters(self, config: PretrainConfig | None = None) -> Array:
        """Pre-fit of the theta-posterior mean (ref ``trainer.py:208-259``).

        Two methods (PretrainConfig.method): a global population search on a
        teacher-forced segment objective (full-state observations), or the
        reference's gradient descent on full-rollout MSE. Returns the best
        mean in the unconstrained parameterization (log for positive dims).
        """
        cfg = config or PretrainConfig()
        d = self.sde.sde_param_dim
        positive = self.sde_param_positive_dims
        pos_mask = np.zeros(d, dtype=bool)
        pos_mask[positive] = True
        pos_mask = jnp.asarray(pos_mask)

        obs_idx = np.round(
            np.asarray(self.observations.times) / self.config.time_step
        ).astype(np.int64)
        obs_values = self.observations.values
        # Partial observation: compare through the linear observation operator
        # (the reference's pretrain assumed full observation, trainer.py:258).
        obs_matrix = getattr(self.observation_likelihood, "obs_matrix", None)
        full_state_obs = (
            obs_matrix is None
            and np.asarray(obs_values).shape[-1] == self.sde.state_dim
        )

        method = cfg.method
        if method == "auto":
            method = "global" if full_state_obs else "gradient"
        if method == "global" and not full_state_obs:
            raise ValueError(
                "pretrain method='global' requires full-state observations "
                "(teacher forcing needs the whole state at every observation)"
            )
        if method == "global":
            return self._pretrain_global(cfg, pos_mask, obs_idx, obs_values)
        return self._pretrain_gradient(cfg, pos_mask, obs_idx, obs_values, obs_matrix)

    def _pretrain_global(self, cfg, pos_mask, obs_idx, obs_values) -> Array:
        """Prior-box sweep + cross-entropy refinement of a segment objective.

        Objective: one deterministic rollout over the full grid that restarts
        from the observed state at every observation slot, scoring each
        segment's endpoint. Unlike full-horizon rollouts, this stays
        informative past the Lyapunov horizon of chaotic systems — but its
        basin around the truth can be far too narrow for gradient descent
        (Lorenz-63: the true params score MSE ~5 vs ~85 at the degenerate
        point gradient pretrain reaches, yet the basin spans only ~±10% per
        parameter). Hence a population search: score ``sweep_candidates``
        prior-box samples per-candidate, then ``cem_rounds`` of cross-entropy
        elite refitting. Deterministic rollouts (no injected noise) avoid the
        variance term of stochastic-endpoint MSE, which rewards contractive
        (wrong) dynamics.

        Two segment scores (``PretrainConfig.global_objective``):

        - ``"nll"`` (default): Gaussian pseudo-likelihood of the segment
          residual under the candidate's OWN diffusion — covariance
          ``(L L^T) * t_seg`` with ``L = diffusion(restart_state, theta)``.
          Pure endpoint MSE cannot see parameters that only enter the
          diffusion: for OU-family models the sweep left sigma at the search
          -box center (the round-3 highdim run started at sigma 0.10 vs true
          0.5 and diverged to NaN in 100 steps). The NLL's quadratic-form /
          log-det trade-off is minimized at sigma^2 ~ residual variance /
          t_seg — the segment-level quadratic variation — so diffusion
          parameters are identified too. When diffusion is theta-independent
          the candidate ranking is identical to MSE's (constant weights).
        - ``"mse"``: plain endpoint MSE (rounds 2-3 behavior).

        Assumes low observation noise: observed values are used as exact
        restart states, so with large observation variance the segment
        objective partially fits noise — users in that regime should select
        ``method="gradient"`` (see PretrainConfig).
        """
        d = self.sde.sde_param_dim
        n_steps = round(self.time_horizon / self.config.time_step)
        dt = self.config.time_step
        state_dim = self.sde.state_dim
        is_obs = np.zeros(n_steps + 1, dtype=bool)
        is_obs[obs_idx] = True
        grid_obs = np.zeros((n_steps + 1, state_dim), dtype=np.float32)
        grid_obs[obs_idx] = np.asarray(obs_values, dtype=np.float32)
        # slot 0 is the start state, never scored
        n_scored = int(is_obs[1:].sum())
        if n_scored == 0:
            raise ValueError("pretrain requires at least one observation after t=0")
        is_obs_steps = jnp.asarray(is_obs[1:])
        grid_obs_steps = jnp.asarray(grid_obs[1:])
        if self.state_space.positive_dims:
            clamp_mask = np.zeros(state_dim, dtype=bool)
            clamp_mask[list(self.state_space.positive_dims)] = True
            clamp_mask = jnp.asarray(clamp_mask)
        else:
            clamp_mask = None
        x0_single = jnp.asarray(self._x0_single, jnp.float32).reshape(1, state_dim)
        use_nll = cfg.global_objective == "nll"

        @jax.jit
        def per_sample_score(z):  # [N, d] unconstrained -> [N]
            theta = jnp.where(pos_mask, jnp.exp(z), z)
            x0 = jnp.broadcast_to(x0_single, (z.shape[0], state_dim))
            diff0 = self.sde.diffusion(x0, theta) if use_nll else None

            def step(carry, inp):
                x, L_seg, t_el = carry
                obs_here, y = inp
                x_next = x + self.sde.drift(x, theta) * dt
                if clamp_mask is not None:
                    x_next = jnp.where(clamp_mask, jnp.maximum(x_next, 1e-6), x_next)
                yb = jnp.broadcast_to(y, x_next.shape)
                r = x_next - yb
                x_new = jnp.where(obs_here, yb, x_next)
                if not use_nll:
                    err = jnp.where(obs_here, jnp.sum(r * r, -1), 0.0)
                    return (x_new, L_seg, t_el), err
                t_next = t_el + dt
                # Segment residual covariance (L L^T) * t_seg with L frozen at
                # the restart state: one triangular solve gives the whitened
                # quadratic form; |log det| from the diagonal.
                w = jax.lax.linalg.triangular_solve(
                    L_seg, r[..., None], left_side=True, lower=True
                )[..., 0]
                diag = jnp.abs(jnp.diagonal(L_seg, axis1=-2, axis2=-1))
                nll = 0.5 * (
                    jnp.sum(w * w, -1) / t_next
                    + 2.0 * jnp.sum(jnp.log(diag + 1e-20), -1)
                    + state_dim * jnp.log(t_next)
                )
                err = jnp.where(obs_here, nll, 0.0)
                L_new = jnp.where(
                    obs_here, self.sde.diffusion(x_new, theta), L_seg
                )
                t_new = jnp.where(obs_here, 0.0, t_next)
                return (x_new, L_new, t_new), err

            carry0 = (x0, diff0, jnp.float32(0.0))
            _, errs = jax.lax.scan(step, carry0, (is_obs_steps, grid_obs_steps))
            score = jnp.sum(errs, 0) / (n_scored * state_dim)
            return jnp.where(jnp.isfinite(score), score, jnp.inf)

        # Prior-informed unconstrained search box (3 prior std; positive dims
        # searched in log space). Positive dims get 3 extra nats of DOWNWARD
        # range: small rate constants routinely sit in the prior's lower tail
        # (Lotka-Volterra's theta2=0.0025 is 4 sigma below its LogNormal(0,1.5)
        # prior mean — inside a 3-sigma box the sweep can never reach it, and
        # with the extension the sweep+CEM lands on the Ryder et al. values).
        m, s = self.prior.mean, self.prior.std
        if self.prior.type.name == "LOG_NORMAL":
            lo_pos, hi_pos = m - 3.0 * s - 3.0, m + 3.0 * s
        else:
            hi_pos = float(np.log(max(m + 3.0 * s, 1e-2)))
            lo_pos = hi_pos - 7.0
        lo = jnp.where(pos_mask, lo_pos, m - 3.0 * s)
        hi = jnp.where(pos_mask, hi_pos, m + 3.0 * s)

        k_sweep, k_cem = jax.random.split(self._pretrain_key)
        pop = cfg.batch_size
        n_elite = max(1, int(round(cfg.elite_fraction * pop)))

        total_rounds = cfg.cem_rounds + 1
        with self.console.pretrain_progress(total_rounds) as progress:
            # Phase A: uniform sweep of the box, evaluated in population-sized
            # chunks (one jitted scan per chunk).
            n_chunks = max(1, -(-cfg.sweep_candidates // pop))
            best_z = jnp.zeros((0, d), jnp.float32)
            best_mse = jnp.zeros((0,), jnp.float32)
            for c in range(n_chunks):
                z = jax.random.uniform(
                    jax.random.fold_in(k_sweep, c), (pop, d),
                    minval=lo, maxval=hi, dtype=jnp.float32,
                )
                mse = per_sample_score(z)
                keep = jnp.argsort(jnp.concatenate([best_mse, mse]))[:n_elite]
                all_z = jnp.concatenate([best_z, z])
                best_z, best_mse = all_z[keep], jnp.concatenate([best_mse, mse])[keep]
            mu = jnp.mean(best_z, 0)
            sigma = jnp.std(best_z, 0) + 0.05
            progress.update(0, float(best_mse[0]), float(best_mse[0]),
                            float(jnp.median(sigma)))

            # Phase B: cross-entropy refinement around the sweep elites.
            overall_best_mse = float(best_mse[0])
            overall_best_z = best_z[0]
            for r in range(cfg.cem_rounds):
                z = mu + sigma * jax.random.normal(
                    jax.random.fold_in(k_cem, r), (pop, d), dtype=jnp.float32
                )
                mse = per_sample_score(z)
                elite = jnp.argsort(mse)[:n_elite]
                mu = jnp.mean(z[elite], 0)
                sigma = jnp.std(z[elite], 0) + 1e-4
                round_best = float(mse[elite[0]])
                if round_best < overall_best_mse:
                    overall_best_mse = round_best
                    overall_best_z = z[elite[0]]
                progress.update(r + 1, round_best, overall_best_mse,
                                float(jnp.median(sigma)))

        # The CEM mean is the denoised estimate; fall back to the single best
        # candidate if the final mean somehow regressed.
        # NLL scores can be negative: tolerance must be absolute+relative, not
        # multiplicative
        tol = 0.05 * max(1.0, abs(overall_best_mse))
        if float(per_sample_score(mu[None])[0]) <= overall_best_mse + tol:
            return mu
        return overall_best_z

    def _pretrain_gradient(self, cfg, pos_mask, obs_idx, obs_values, obs_matrix) -> Array:
        """Reference-style Adam on full-rollout MSE (ref ``trainer.py:208-259``)."""
        d = self.sde.sde_param_dim
        k_init, k_loop = jax.random.split(self._pretrain_key)
        mu0 = jnp.where(
            pos_mask,
            0.0,
            cfg.init_scale * jax.random.normal(k_init, (d,), dtype=jnp.float32),
        )
        log_sigma0 = jnp.zeros((d,), jnp.float32)

        opt = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(cfg.learning_rate)
        )
        opt_state0 = opt.init((mu0, log_sigma0))

        x0 = jnp.broadcast_to(
            self._x0_single, (cfg.batch_size, self.sde.state_dim)
        ).astype(jnp.float32)

        def mse_fn(mu_log_sigma, key):
            mu, log_sigma = mu_log_sigma
            eps = jax.random.normal(key, (cfg.batch_size, d), dtype=jnp.float32)
            log_theta = mu + jnp.exp(log_sigma) * eps
            theta = jnp.where(pos_mask, jnp.exp(log_theta), log_theta)
            k_noise = jax.random.fold_in(key, 1)
            paths = euler_maruyama(
                self.sde,
                x0,
                theta,
                self.time_horizon,
                self.config.time_step,
                self.state_space.positive_dims,
                key=k_noise,
            )
            predicted = paths[:, obs_idx]
            if obs_matrix is not None:
                predicted = jnp.einsum("od,btd->bto", obs_matrix, predicted)
            return jnp.mean((predicted - obs_values[None]) ** 2)

        @jax.jit
        def pretrain_step(state, opt_state, key):
            mse, grads = jax.value_and_grad(mse_fn)(state, key)
            updates, new_opt_state = opt.update(grads, opt_state, state)
            new_state = optax.apply_updates(state, updates)
            # Skip non-finite steps (ref ``trainer.py:234-241``).
            ok = jnp.isfinite(mse)
            state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_state, state
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
            )
            return state, opt_state, mse

        state = (mu0, log_sigma0)
        opt_state = opt_state0
        best_mu = np.asarray(mu0)
        best_mse = float("inf")

        with self.console.pretrain_progress(cfg.n_iterations) as progress:
            for step in range(cfg.n_iterations):
                key = jax.random.fold_in(k_loop, step)
                mu_before = state[0]
                state, opt_state, mse = pretrain_step(state, opt_state, key)
                mse_f = float(mse)
                # The mse was evaluated at mu_before (ref tracks best pre-step,
                # ``trainer.py:232-236``).
                if np.isfinite(mse_f) and mse_f < best_mse:
                    best_mu = np.asarray(mu_before)
                    best_mse = mse_f
                progress.update(
                    step, mse_f, best_mse, float(jnp.median(jnp.exp(state[1])))
                )

        return jnp.asarray(best_mu)

    def set_theta_mean(self, mean: Array) -> None:
        """Copy a pretrained mean into the theta posterior (ref ``infer.py:129-132``)."""
        self.params["theta"]["mean"] = jnp.asarray(mean, dtype=jnp.float32)
        # Optimizer state for theta restarts from zero moments, matching the
        # reference (pretraining happens before any AdamW step).
        self.opt_state = self.optimizer.init(self.params)
