"""Mid-training checkpoint/resume (beyond-parity capability, SURVEY §5.4)."""

import numpy as np

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
