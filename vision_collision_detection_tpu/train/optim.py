"""Optimizer + LR schedule construction (optax).

Mirrors the reference's training setup (/root/reference/nexar_train.py:
902-915): AdamW and torch's ``CosineAnnealingLR(T_max=30, eta_min=lr/100)``,
which holds LR constant within an epoch and follows the cosine formula per
epoch (continuing periodically past T_max). bf16 on TPU needs no GradScaler
(the reference's AMP machinery at nexar_train.py:957-962 has no equivalent
here by design).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from vision_collision_detection_tpu.config import OptimConfig


def cosine_annealing_schedule(base_lr: float, t_max_epochs: int,
                              steps_per_epoch: int, eta_min_ratio: float,
                              warmup_steps: int = 0):
    """Per-epoch cosine annealing (torch semantics), optional linear warmup."""
    eta_min = base_lr * eta_min_ratio
    spe = max(1, steps_per_epoch)

    def schedule(step):
        epoch = jnp.floor_divide(step, spe).astype(jnp.float32)
        lr = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max_epochs)
        )
        if warmup_steps > 0:
            warm = base_lr * (step + 1) / warmup_steps
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return schedule


def build_optimizer(cfg: OptimConfig, steps_per_epoch: int):
    """→ (optax.GradientTransformation, schedule_fn)."""
    if cfg.schedule == "cosine":
        schedule = cosine_annealing_schedule(
            cfg.learning_rate, cfg.cosine_t_max_epochs, steps_per_epoch,
            cfg.eta_min_ratio, cfg.warmup_steps,
        )
    elif cfg.schedule == "constant":
        schedule = lambda step: cfg.learning_rate  # noqa: E731
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")

    if cfg.optimizer == "adamw":
        # torch AdamW decays every parameter by default; the reference uses
        # that default, so no mask here.
        tx = optax.adamw(
            learning_rate=schedule, b1=cfg.beta1, b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
        )
    elif cfg.optimizer == "adam":
        tx = optax.adam(learning_rate=schedule, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(learning_rate=schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx, schedule
