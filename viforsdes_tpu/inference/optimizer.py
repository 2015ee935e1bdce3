"""Optimizer: non-finite-skip + global-norm clip + two-LR-group AdamW.

Parity target: reference ``training_context.py:93-102`` (torch AdamW, default
betas (0.9, 0.999), eps 1e-8, weight_decay 0.01; theta-posterior params at
``sde_param_lr``, everything else at ``learning_rate``) composed with the
trainer's ``clip_grad_norm_(grad_clip_norm)`` (``trainer.py:199-204``) — in
optax the clip is simply the first link of the chain.

Beyond parity (round 3): the whole chain is wrapped in
``optax.apply_if_finite``. ``clip_by_global_norm`` propagates a single NaN
gradient into EVERY parameter (the global norm goes NaN), so one bad step —
e.g. an aggressive likelihood variance early in training — used to poison
the run irrecoverably (the round-3 first highdim ladder run ended all-NaN
this way). Skipping non-finite updates is a strict safety net: it changes
nothing on healthy steps and turns divergence into a recoverable stall.

Abort semantics (round 4, advisor finding): optax's ``max_consecutive_errors``
does NOT abort — past the threshold it gives up and APPLIES the non-finite
update, silently poisoning every parameter (that is how the round-3
obs_var=1e-4 highdim run ended all-NaN after 8,600 unattended seconds). It is
therefore set far above reach here, ``notfinite_count`` is surfaced in the
step metrics, and the TRAINER's host loop raises after
``MAX_CONSECUTIVE_NONFINITE_STEPS`` consecutive bad steps — while params are
still at their last finite values (``inference/trainer.py`` flush).
"""

from __future__ import annotations

import jax
import optax

from viforsdes_tpu.config import TrainingConfig


def param_group_labels(params: dict) -> dict:
    labels = jax.tree.map(lambda _: "rest", params)
    labels["theta"] = jax.tree.map(lambda _: "theta", params["theta"])
    if "obs" in params:
        # learnable observation-variance scalar: a likelihood hyperparameter,
        # trained at the theta learning rate (config.learn_obs_variance)
        labels["obs"] = jax.tree.map(lambda _: "theta", params["obs"])
    return labels


def make_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    def adamw(lr: float) -> optax.GradientTransformation:
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    return optax.apply_if_finite(
        optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm),
            optax.multi_transform(
                {"rest": adamw(config.learning_rate), "theta": adamw(config.sde_param_lr)},
                param_group_labels,
            ),
        ),
        # Never reached by design: the trainer aborts from the host loop at
        # MAX_CONSECUTIVE_NONFINITE_STEPS (100) consecutive bad steps, long
        # before optax would "give up and accept" the non-finite update.
        max_consecutive_errors=1_000_000_000,
    )
