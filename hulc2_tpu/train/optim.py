"""Optimizer + LR schedule factories (optax).

(reference: conf/model/optimizer/*.yaml -> torch.optim.Adam,
 conf/model/lr_scheduler/*.yaml -> transformers schedules;
 warmup inference logic reference: hulc2/models/hulc2.py:164-198)
"""
from __future__ import annotations

from typing import Optional, Tuple

import optax


def compute_warmup(num_training_steps: int, num_warmup_steps, estimated_total: int) -> Tuple[int, int]:
    """Resolve -1 training steps / fractional warmup like the reference
    (hulc2.py:164-183)."""
    if num_training_steps < 0:
        num_training_steps = estimated_total
    if isinstance(num_warmup_steps, float) and num_warmup_steps <= 1.0:
        num_warmup_steps = num_warmup_steps * num_training_steps
    return int(num_training_steps), int(num_warmup_steps)


def make_schedule(sched_cfg: Optional[dict], base_lr: float, estimated_total: int = 100_000):
    kind = (sched_cfg or {}).get("kind", "constant")
    if kind == "constant":
        return optax.constant_schedule(base_lr)
    if kind == "linear_warmup":
        total, warm = compute_warmup(
            sched_cfg.get("num_training_steps", -1),
            sched_cfg.get("num_warmup_steps", 0.1),
            estimated_total,
        )
        return optax.linear_schedule(0.0, base_lr, warm)
    if kind == "cosine":
        total, warm = compute_warmup(
            sched_cfg.get("num_training_steps", -1),
            sched_cfg.get("num_warmup_steps", 0.0),
            estimated_total,
        )
        return optax.warmup_cosine_decay_schedule(0.0, base_lr, warm, total)
    raise ValueError(kind)


def schedule_value(opt_cfg: dict, sched_cfg: Optional[dict], step: int, estimated_total: int = 100_000) -> float:
    """Current learning rate (the reference's LearningRateMonitor role)."""
    sched = make_schedule(sched_cfg, opt_cfg.get("lr", 2e-4), estimated_total)
    return float(sched(step)) if callable(sched) else float(sched)


def make_optimizer(opt_cfg: dict, sched_cfg: Optional[dict] = None, estimated_total: int = 100_000):
    """Build the optax transform. Adam hyperparams match torch defaults
    (betas (0.9, 0.999), eps 1e-8) so training dynamics line up."""
    lr = make_schedule(sched_cfg, opt_cfg.get("lr", 2e-4), estimated_total)
    kind = opt_cfg.get("kind", "adam")
    if kind == "adam":
        tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif kind == "adamw":
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=opt_cfg.get("weight_decay", 1e-6))
    elif kind == "sgd":
        tx = optax.sgd(lr, momentum=opt_cfg.get("momentum", 0.9))
    else:
        raise ValueError(kind)
    clip = opt_cfg.get("gradient_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
