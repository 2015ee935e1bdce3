"""Optimizer: global-norm clip + two-LR-group AdamW.

Parity target: reference ``training_context.py:93-102`` (torch AdamW, default
betas (0.9, 0.999), eps 1e-8, weight_decay 0.01; theta-posterior params at
``sde_param_lr``, everything else at ``learning_rate``) composed with the
trainer's ``clip_grad_norm_(grad_clip_norm)`` (``trainer.py:199-204``) — in
optax the clip is simply the first link of the chain.
"""

from __future__ import annotations

import jax
import optax

from viforsdes_tpu.config import TrainingConfig


def param_group_labels(params: dict) -> dict:
    labels = jax.tree.map(lambda _: "rest", params)
    labels["theta"] = jax.tree.map(lambda _: "theta", params["theta"])
    return labels


def make_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    def adamw(lr: float) -> optax.GradientTransformation:
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.multi_transform(
            {"rest": adamw(config.learning_rate), "theta": adamw(config.sde_param_lr)},
            param_group_labels,
        ),
    )
