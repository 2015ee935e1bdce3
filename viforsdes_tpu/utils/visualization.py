"""Posterior plotting (ref ``visualization.py:19-67``): one subplot per state
dim (trajectory fan + observation scatter) and per theta dim (histogram)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt
import numpy as np

if TYPE_CHECKING:
    from viforsdes_tpu.core.observations import Observations
    from viforsdes_tpu.posterior.posterior import VariationalPosteriorSamples


def plot_posterior(
    samples: "VariationalPosteriorSamples",
    observations: "Observations",
    time_horizon: float,
    show: bool = True,
):
    diffusion_paths = np.asarray(samples.diffusion_paths)
    sde_parameters = np.asarray(samples.sde_parameters)
    times = np.linspace(0, time_horizon, diffusion_paths.shape[1])

    n_trajectories = diffusion_paths.shape[0]
    state_dim = diffusion_paths.shape[2]
    param_dim = sde_parameters.shape[1]

    fig, axes = plt.subplots(
        1,
        state_dim + param_dim,
        figsize=(4 * (state_dim + param_dim), 4),
        squeeze=False,
    )
    ax_list = list(axes[0])

    for d in range(state_dim):
        for i in range(n_trajectories):
            ax_list[d].plot(times, diffusion_paths[i, :, d], alpha=0.3, color="C0")
        ax_list[d].scatter(
            np.asarray(observations.times),
            np.asarray(observations.values[:, d])
            if observations.values.shape[-1] > d
            else np.full(len(observations.times), np.nan),
            color="red",
            s=50,
            zorder=5,
        )
        ax_list[d].set_xlabel("Time")
        ax_list[d].set_ylabel(f"State {d}")

    for p in range(param_dim):
        ax_list[state_dim + p].hist(
            sde_parameters[:, p], bins=30, density=True, alpha=0.7, color="C1"
        )
        ax_list[state_dim + p].set_xlabel(f"param_{p}")
        ax_list[state_dim + p].set_ylabel("Density")

    plt.tight_layout()
    if show:
        plt.show()

    return fig
