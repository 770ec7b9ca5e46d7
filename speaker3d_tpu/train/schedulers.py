"""LR and margin schedules as pure functions of the step counter.

Behavioral contract (reference: speakerlab/process/scheduler.py):
WarmupCosineScheduler (linear warmup -> cosine -> min_lr floor),
StepScheduler (x0.1 staircase), MarginScheduler (exp or linear ramp between
epochs). Being pure jnp functions, they trace into the compiled train step —
no per-step host work, no recompilation across the ramp.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(step, *, min_lr, max_lr, warmup_epoch, fix_epoch,
                     step_per_epoch):
    """(reference: process/scheduler.py:7-53)"""
    step = jnp.asarray(step, jnp.float32)
    warmup_step = warmup_epoch * step_per_epoch
    fix_step = fix_epoch * step_per_epoch
    warm = min_lr + (max_lr - min_lr) * (step / jnp.maximum(warmup_step, 1))
    cos = min_lr + 0.5 * (max_lr - min_lr) * (
        1 + jnp.cos(jnp.pi * (step - warmup_step)
                    / jnp.maximum(fix_step - warmup_step, 1)))
    return jnp.where(step < warmup_step, warm,
                     jnp.where(step < fix_step, cos, min_lr))


def step_lr(step, *, lr, step_per_epoch, step_epoch_size):
    """x0.1 staircase. (reference: process/scheduler.py:56-84)"""
    step = jnp.asarray(step, jnp.float32)
    step_size = step_epoch_size * step_per_epoch
    return lr * jnp.power(0.1, jnp.floor(step / step_size))


def margin_at_step(step, *, increase_start_epoch, fix_epoch, step_per_epoch,
                   initial_margin, final_margin, increase_type="exp"):
    """(reference: process/scheduler.py:87-146 MarginScheduler)"""
    step = jnp.asarray(step, jnp.float32)
    start = increase_start_epoch * step_per_epoch
    fix = fix_epoch * step_per_epoch
    increase_step = jnp.maximum(fix - start, 1)
    cur = step - start
    a, b = 1.0, 1e-3
    if increase_type == "exp":
        ratio = 1.0 - jnp.exp((cur / increase_step) * jnp.log(b / (a + 1e-6))) * a
    else:
        ratio = cur / increase_step
    margin = initial_margin + (final_margin - initial_margin) * ratio
    return jnp.where(step < start, initial_margin,
                     jnp.where(step >= fix, final_margin, margin))
