"""Final posterior artifact: sampling, summaries, diagnostics, plotting,
checkpoint save/load.

Parity target: reference ``posterior/variational_posterior.py:68-192``:
- ``.sample(n)``: eval mode with EMA weights, theta ~ q, paths via the shared
  sampler, returned in constrained x-space;
- ``.summary(n)``: theta mean/std + quantiles (0.05, 0.25, 0.5, 0.75, 0.95),
  path mean/std;
- ``.diagnostics()``: ELBO history;
- ``.plot()``: matplotlib figure;
- ``.save()/.load()``: checkpoint of model params, EMA params, time grid
  settings, positive dims, ELBO history (schema mirrored in the npz metadata).

Eval uses the EMA params directly (functionally — no weight swapping needed,
ref swaps via ``ema.apply()`` at ``variational_posterior.py:96``). The
sampling path is jitted once per (n,) shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from viforsdes_tpu.core.observations import Observations
from viforsdes_tpu.core.priors import Prior
from viforsdes_tpu.core.state_space import StateSpace
from viforsdes_tpu.inference.path_sampler import sample_diffusion_paths
from viforsdes_tpu.models.model import VariationalSDEPosterior
from viforsdes_tpu.utils.pytree_io import load_checkpoint, save_checkpoint
from viforsdes_tpu.utils.visualization import plot_posterior

Array = jax.Array

QUANTILE_LEVELS = (0.05, 0.25, 0.5, 0.75, 0.95)


@dataclass(frozen=True)
class VariationalPosteriorSamples:
    sde_parameters: Array
    diffusion_paths: Array


@dataclass(frozen=True)
class Quantiles:
    q05: Array
    q25: Array
    q50: Array
    q75: Array
    q95: Array


@dataclass
class VariationalPosteriorSummary:
    sde_parameter_mean: Array
    sde_parameter_std: Array
    sde_parameter_quantiles: Quantiles
    diffusion_path_mean: Array
    diffusion_path_std: Array


@dataclass
class InferenceDiagnostics:
    evidence_lower_bound_history: list[float]
    final_evidence_lower_bound: float
    n_iterations: int


class VariationalPosterior:
    def __init__(
        self,
        model: VariationalSDEPosterior,
        params: dict,
        ema_params: dict,
        prior: Prior,
        observations: Observations,
        time_horizon: float,
        time_step: float,
        state_space: StateSpace,
        evidence_lower_bound_history: list[float],
        *,
        x0: Array | None = None,
        seed: int = 0,
        sde=None,
    ) -> None:
        # the SDE is only needed when the head uses the diffusion-matched
        # bridge (cholesky="matched"): eval-time path sampling then evaluates
        # the user's diffusion inside the recurrence
        if sde is None and model.head.cholesky == "matched":
            raise ValueError(
                "head cholesky='matched' needs the sde passed to the posterior"
            )
        self.sde = sde
        self.model = model
        self.params = params
        self.ema_params = ema_params
        self.prior = prior
        self.observations = observations
        self.time_horizon = float(time_horizon)
        self.time_step = float(time_step)
        self.state_space = state_space
        self.evidence_lower_bound_history = evidence_lower_bound_history
        if x0 is None:
            # x0 = first observation only covers full observation (the trainer
            # applies the same guard, trainer.py x0 resolution).
            if observations.values.shape[-1] != model.head.state_dim:
                raise ValueError(
                    "obs_dim != state_dim: pass an explicit x0 (the reference's "
                    "x0 = values[0] convention only covers full observation)"
                )
            x0 = observations.values[0]
        self._x0_single = jnp.asarray(x0, dtype=jnp.float32)
        self._key = jax.random.key(seed ^ 0x5DE5)
        self._n_sampled = 0

    # ---------------------------------------------------------------- sample

    @partial(jax.jit, static_argnums=(0, 2))
    def _sample_jit(self, ema_params: dict, n: int, key: Array):
        k_theta, k_path = jax.random.split(key)
        theta = self.model.theta_posterior.rsample(ema_params["theta"], k_theta, n)
        x0 = jnp.broadcast_to(self._x0_single, (n, self.model.head.state_dim))
        sample = sample_diffusion_paths(
            self.model.encoder,
            self.model.head,
            ema_params,
            self.observations.values,
            theta,
            x0,
            self.time_step,
            self.state_space,
            k_path,
            compute_dtype=jnp.float32,  # eval runs full precision (no autocast in ref eval)
            sde=self.sde,
        )
        return theta, sample.x

    # Posterior draws are evaluated in chunks: one giant batch materializes
    # encoder activations of [n, n_grid, mlp_hidden] (10+ GB for n=1000 on a
    # 2000-step grid) and OOMs the chip. Chunking costs at most two compiles.
    SAMPLE_CHUNK = 256

    def sample(self, n: int) -> VariationalPosteriorSamples:
        thetas, xs = [], []
        done = 0
        while done < n:
            c = min(self.SAMPLE_CHUNK, n - done)
            self._n_sampled += 1
            key = jax.random.fold_in(self._key, self._n_sampled)
            theta, x = self._sample_jit(self.ema_params, c, key)
            thetas.append(theta)
            xs.append(x)
            done += c
        return VariationalPosteriorSamples(
            sde_parameters=jnp.concatenate(thetas, axis=0),
            diffusion_paths=jnp.concatenate(xs, axis=0),
        )

    # --------------------------------------------------------------- summary

    def summary(self, n_samples: int = 1000) -> VariationalPosteriorSummary:
        samples = self.sample(n_samples)
        theta = samples.sde_parameters
        paths = samples.diffusion_paths

        q = jnp.quantile(
            theta, jnp.asarray(QUANTILE_LEVELS, dtype=theta.dtype), axis=0
        )
        quantiles = Quantiles(q05=q[0], q25=q[1], q50=q[2], q75=q[3], q95=q[4])
        return VariationalPosteriorSummary(
            sde_parameter_mean=theta.mean(axis=0),
            sde_parameter_std=theta.std(axis=0, ddof=1),
            sde_parameter_quantiles=quantiles,
            diffusion_path_mean=paths.mean(axis=0),
            diffusion_path_std=paths.std(axis=0, ddof=1),
        )

    def observation_variance(self) -> float | None:
        """Learned observation variance (TrainingConfig.learn_obs_variance),
        from the EMA weights; None when the likelihood variance was fixed."""
        obs = self.ema_params.get("obs")
        if obs is None:
            return None
        from viforsdes_tpu.inference.constants import OBS_VARIANCE_FLOOR

        return float(OBS_VARIANCE_FLOOR + np.exp(obs["log_variance"]))

    def diagnostics(self) -> InferenceDiagnostics:
        history = self.evidence_lower_bound_history
        return InferenceDiagnostics(
            evidence_lower_bound_history=history,
            final_evidence_lower_bound=history[-1] if history else float("nan"),
            n_iterations=len(history),
        )

    def plot(self, n_trajectories: int = 50, show: bool = True):
        samples = self.sample(n_trajectories)
        return plot_posterior(samples, self.observations, self.time_horizon, show)

    # ------------------------------------------------------------ checkpoint

    def save(self, path: str | Path) -> None:
        save_checkpoint(
            path,
            trees={"model_state": self.params, "ema_state": self.ema_params},
            metadata={
                "time_horizon": self.time_horizon,
                "time_step": self.time_step,
                "state_positive_dims": list(self.state_space.positive_dims),
                "evidence_lower_bound_history": [
                    float(v) for v in self.evidence_lower_bound_history
                ],
                # persisted so a reloaded partial-observation posterior does not
                # silently fall back to x0 = observations.values[0]
                "x0": np.asarray(self._x0_single).tolist(),
            },
        )

    @classmethod
    def load(
        cls,
        path: str | Path,
        model: VariationalSDEPosterior,
        prior: Prior,
        observations: Observations,
        *,
        init_key: Array | None = None,
        sde=None,
    ) -> "VariationalPosterior":
        template = model.init(
            init_key if init_key is not None else jax.random.key(0)
        )
        trees, meta = load_checkpoint(
            path,
            templates={"model_state": template, "ema_state": template},
            required_metadata=(
                "time_horizon",
                "time_step",
                "state_positive_dims",
                "evidence_lower_bound_history",
            ),
            kind="VariationalPosterior",
        )
        state_dim = model.head.state_dim
        state_space = StateSpace(state_dim, meta["state_positive_dims"])
        x0 = meta.get("x0")
        return cls(
            model=model,
            params=trees["model_state"],
            ema_params=trees["ema_state"],
            prior=prior,
            observations=observations,
            time_horizon=meta["time_horizon"],
            time_step=meta["time_step"],
            state_space=state_space,
            evidence_lower_bound_history=meta["evidence_lower_bound_history"],
            x0=None if x0 is None else jnp.asarray(x0, dtype=jnp.float32),
            sde=sde,
        )
