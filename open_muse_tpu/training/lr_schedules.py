"""Learning-rate schedules (optax) with the reference registry surface.

Reference parity: muse/lr_schedulers.py:29-292 (six LambdaLR schedules +
``get_scheduler`` registry).  Each returns an optax schedule: step -> lr.
"""

from __future__ import annotations

import math
from enum import Enum
from typing import Optional

import jax.numpy as jnp

__all__ = ["SchedulerType", "get_scheduler"]


class SchedulerType(Enum):
    LINEAR = "linear"
    COSINE = "cosine"
    COSINE_WITH_RESTARTS = "cosine_with_restarts"
    POLYNOMIAL = "polynomial"
    CONSTANT = "constant"
    CONSTANT_WITH_WARMUP = "constant_with_warmup"


def get_constant_schedule(base_lr: float):
    return lambda step: jnp.asarray(base_lr, dtype=jnp.float32)


def get_constant_schedule_with_warmup(base_lr: float, num_warmup_steps: int):
    def fn(step):
        warm = jnp.minimum(step / max(1.0, num_warmup_steps), 1.0)
        return base_lr * warm

    return fn


def get_linear_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps):
    def fn(step):
        warm = step / max(1, num_warmup_steps)
        decay = (num_training_steps - step) / max(1, num_training_steps - num_warmup_steps)
        return base_lr * jnp.clip(jnp.where(step < num_warmup_steps, warm, decay), 0.0, 1.0)

    return fn


def get_cosine_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps,
                                    num_cycles: float = 0.5):
    def fn(step):
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        return base_lr * jnp.where(step < num_warmup_steps, jnp.clip(warm, 0.0, 1.0),
                                   jnp.clip(cos, min=0.0))

    return fn


def get_cosine_with_hard_restarts_schedule_with_warmup(base_lr, num_warmup_steps,
                                                       num_training_steps,
                                                       num_cycles: int = 1):
    def fn(step):
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cyc = 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * progress) % 1.0)))
        val = jnp.where(progress >= 1.0, 0.0, jnp.clip(cyc, min=0.0))
        return base_lr * jnp.where(step < num_warmup_steps, jnp.clip(warm, 0.0, 1.0), val)

    return fn


def get_polynomial_decay_schedule_with_warmup(base_lr, num_warmup_steps,
                                              num_training_steps, lr_end=1e-7,
                                              power=1.0):
    if not (base_lr > lr_end):
        raise ValueError(f"lr_end ({lr_end}) must be smaller than initial lr ({base_lr})")

    def fn(step):
        warm = base_lr * jnp.clip(step / max(1, num_warmup_steps), 0.0, 1.0)
        lr_range = base_lr - lr_end
        decay_steps = num_training_steps - num_warmup_steps
        pct = 1 - (step - num_warmup_steps) / decay_steps
        decay = lr_range * pct ** power + lr_end
        out = jnp.where(step < num_warmup_steps, warm,
                        jnp.where(step > num_training_steps, lr_end, decay))
        return out

    return fn


TYPE_TO_SCHEDULER_FUNCTION = {
    SchedulerType.LINEAR: get_linear_schedule_with_warmup,
    SchedulerType.COSINE: get_cosine_schedule_with_warmup,
    SchedulerType.COSINE_WITH_RESTARTS: get_cosine_with_hard_restarts_schedule_with_warmup,
    SchedulerType.POLYNOMIAL: get_polynomial_decay_schedule_with_warmup,
    SchedulerType.CONSTANT: get_constant_schedule,
    SchedulerType.CONSTANT_WITH_WARMUP: get_constant_schedule_with_warmup,
}


def get_scheduler(name, base_lr: float, num_warmup_steps: Optional[int] = None,
                  num_training_steps: Optional[int] = None, **kwargs):
    """Registry mirroring muse/lr_schedulers.py:237-292."""
    name = SchedulerType(name)
    if name == SchedulerType.CONSTANT:
        return get_constant_schedule(base_lr)
    if num_warmup_steps is None:
        raise ValueError(f"{name} requires `num_warmup_steps`")
    if name == SchedulerType.CONSTANT_WITH_WARMUP:
        return get_constant_schedule_with_warmup(base_lr, num_warmup_steps)
    if num_training_steps is None:
        raise ValueError(f"{name} requires `num_training_steps`")
    fn = TYPE_TO_SCHEDULER_FUNCTION[name]
    return fn(base_lr, num_warmup_steps, num_training_steps, **kwargs)
