"""Mid-training checkpoint/resume (beyond-parity capability, SURVEY §5.4)."""

import numpy as np

import viforsdes_tpu as vt
from tests.test_inference import _make_trainer


def test_resume_is_exact(tmp_path):
    """train(3) + checkpoint + resume(3 more) == train(6) bit-for-bit-ish."""
    ckpt = tmp_path / "mid.npz"

    # continuous run
    t_full = _make_trainer(n_iterations=6, seed=11)
    full = t_full.train()

    # split run
    t_a = _make_trainer(n_iterations=3, seed=11)
    t_a.train()
    t_a.save_checkpoint(ckpt)

    t_b = _make_trainer(n_iterations=6, seed=11)
    t_b.restore_checkpoint(ckpt)
    assert t_b._start_step == 3
    resumed = t_b.train()

    assert len(resumed.evidence_lower_bound_history) == 6
    np.testing.assert_allclose(
        resumed.evidence_lower_bound_history,
        full.evidence_lower_bound_history,
        rtol=1e-5,
    )
    for a, b in zip(
        np.asarray(resumed.params["theta"]["mean"]).ravel(),
        np.asarray(full.params["theta"]["mean"]).ravel(),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_checkpoint_every_during_train(tmp_path):
    ckpt = tmp_path / "auto.npz"
    trainer = _make_trainer(n_iterations=5, seed=3)
    trainer.train(checkpoint_every=2, checkpoint_path=ckpt)
    assert ckpt.exists()

    fresh = _make_trainer(n_iterations=5, seed=3)
    fresh.restore_checkpoint(ckpt)
    # last checkpoint was written at step 4 (after step index 3)
    assert fresh._start_step == 4
    assert len(fresh.evidence_lower_bound_history) == 4


def test_infer_resume_from_matches_continuous(tmp_path):
    """infer(resume_from=...) continues an interrupted run to the same result
    as one uninterrupted infer() call (per-step keys are fold_in(base, step),
    so the replayed tail sees identical randomness)."""

    class OU:
        state_dim = 1
        sde_param_dim = 3

        def drift(self, x, p):
            return p[..., 0:1] * (p[..., 1:2] - x)

        def diffusion(self, x, p):
            return p[..., 2:3][..., None]

    obs = vt.Observations(times=[0.0, 1.0, 2.0], values=[[2.0], [1.5], [0.8]])
    lik = vt.GaussianObservationLikelihood(variance=0.1)
    prior = vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3)
    ckpt = tmp_path / "mid.npz"

    def config(n_iterations, **kw):
        return vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.5, batch_size=8, n_iterations=n_iterations
            ),
            encoder=vt.EncoderConfig(hidden_dim=16, cond_dim=16, num_heads=2, depth=1),
            head=vt.HeadConfig(hidden_dim=8, num_layers=1),
            sde_param_positive_dims=[0, 2],
            console=vt.Console(enabled=False),
            **kw,
        )

    continuous = vt.infer(OU(), obs, lik, prior, 2.0, config(6))

    # interrupted: 6 planned iterations, checkpoint at step 3, then resume
    vt.infer(
        OU(), obs, lik, prior, 2.0,
        config(3, checkpoint_every=3, checkpoint_path=ckpt),
    )
    resumed = vt.infer(
        OU(), obs, lik, prior, 2.0,
        config(6, checkpoint_every=3, checkpoint_path=ckpt, resume_from=ckpt),
    )

    assert len(resumed.evidence_lower_bound_history) == 6
    np.testing.assert_allclose(
        resumed.evidence_lower_bound_history,
        continuous.evidence_lower_bound_history,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.params["theta"]["mean"]),
        np.asarray(continuous.params["theta"]["mean"]),
        rtol=1e-5,
    )
