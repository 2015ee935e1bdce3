"""Smoke coverage for the ENABLED console paths (ref ``console.py:45-373``).

Every other test runs ``Console(enabled=False)``; these render the live
training panel, the pretrain panel, the config panel, and the summary table
into a recording rich console and assert the expected content actually
reached the output — no subsystem at zero coverage (round-4 verdict item).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
from rich.console import Console as RichConsole

from viforsdes_tpu.utils.console import Console


def _recording_console() -> Console:
    c = Console(enabled=True)
    # substitute a recording backend: same rendering code, captured output
    c._rich = RichConsole(record=True, width=120, force_terminal=False)
    return c


def test_training_progress_live_panel_renders_updates():
    c = _recording_console()
    with c.training_progress(
        n_iterations=20, update_interval=5, param_names=["kappa", "mu", "sigma"]
    ) as progress:
        for step in range(0, 20, 5):
            progress.update(
                step=step,
                loss=100.0 - step,
                elbo=-100.0 + step,
                best_elbo=-80.0,
                components={
                    "observation_log_prob": -50.0,
                    "sde_log_prob": -30.0,
                    "generative_log_prob": -20.0,
                    "prior_log_prob": -3.0,
                    "posterior_log_prob": -2.0,
                },
                grad_norm=1.23,
                param_means=np.array([1.2, 0.8, 0.5]),
            )
    out = c._rich.export_text()
    # the completion panel prints after Live exits
    assert "training complete" in out
    assert "it/s avg" in out


def test_training_progress_stats_table_contents():
    c = _recording_console()
    with c.training_progress(n_iterations=4, param_names=["kappa"]) as progress:
        progress.update(
            step=2,
            loss=12.5,
            elbo=-12.5,
            best_elbo=-10.0,
            components={"observation_log_prob": -5.0},
            grad_norm=0.5,
            param_means=np.array([1.5]),
        )
        # the live panel renders from _stats; check the formatted fields
        assert progress._stats["loss (smoothed)"] == "12.5000"
        assert progress._stats["best ELBO"] == "-10.00"
        assert "kappa=1.5" in progress._stats["posterior means"]
        assert "observation=-5.0" in progress._stats["components"]
        rendered = progress._render()
        assert rendered is not None


def test_pretrain_progress_panel():
    c = _recording_console()
    with c.pretrain_progress(n_iterations=10) as progress:
        for step in range(10):
            progress.update(step, mse=1.0 / (step + 1), best_mse=0.05, sigma_median=0.4)
    # Progress renders directly to the console; just assert no crash and the
    # task advanced to completion
    assert progress.progress.tasks[0].completed == 10


def test_config_panel_and_summary_table_render():
    c = _recording_console()
    c.config_panel({"batch_size": 128, "time_step": 0.05})
    summary = SimpleNamespace(
        sde_parameter_mean=np.array([1.2, 0.8]),
        sde_parameter_std=np.array([0.1, 0.05]),
        sde_parameter_quantiles=SimpleNamespace(
            q05=np.array([1.0, 0.7]),
            q50=np.array([1.2, 0.8]),
            q95=np.array([1.4, 0.9]),
        ),
    )
    diagnostics = SimpleNamespace(final_evidence_lower_bound=-42.0, n_iterations=1000)
    c.summary_table(summary, diagnostics, param_names=["kappa", "mu"])
    out = c._rich.export_text()
    assert "training config" in out
    assert "batch_size" in out
    assert "posterior summary" in out
    assert "kappa" in out
    assert "final ELBO: -42.00" in out


def test_disabled_console_emits_nothing():
    c = Console(enabled=False)
    c._rich = RichConsole(record=True, width=120)
    c.print("should not appear")
    c.config_panel({"a": 1})
    with c.training_progress(5) as p:
        p.update(step=1, loss=1.0, elbo=-1.0, best_elbo=-1.0, components={},
                 grad_norm=0.0, param_means=np.zeros(1))
    with c.pretrain_progress(5) as p:
        p.update(0, 1.0, 1.0, 1.0)
    assert c._rich.export_text() == ""
