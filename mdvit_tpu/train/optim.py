"""Optimizer/schedule factory (reference parity).

AdamW lr 1e-4, betas (0.9, 0.999), eps 1e-8, weight-decay 0.05 applied to ALL
parameters (the reference passes ``model.parameters()`` wholesale,
``multi_train_MDViT.py:92-94``), stepped by StepLR(step_size=50 epochs,
gamma=0.5) (``:95``). optax.adamw uses the same decoupled weight-decay
formulation as torch.optim.AdamW.
"""
from __future__ import annotations

import optax


def steplr_schedule(
    base_lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int
):
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size_epochs * steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )


def build_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    opt = config.train.optimizer
    sched_cfg = config.train.get("scheduler", {})
    if opt.mode == "adamw":
        lr = steplr_schedule(
            float(opt.adamw.lr),
            int(sched_cfg.get("step_size", 50)),
            float(sched_cfg.get("gamma", 0.5)),
            steps_per_epoch,
        )
        return optax.adamw(
            learning_rate=lr,
            b1=float(opt.adamw.betas[0]),
            b2=float(opt.adamw.betas[1]),
            eps=float(opt.adamw.eps),
            weight_decay=float(opt.adamw.weight_decay),
        )
    if opt.mode == "adam":
        lr = steplr_schedule(
            float(opt.adam.lr),
            int(sched_cfg.get("step_size", 50)),
            float(sched_cfg.get("gamma", 0.5)),
            steps_per_epoch,
        )
        return optax.adam(learning_rate=lr)
    raise ValueError(f"unknown optimizer mode {opt.mode!r}")
