"""LR schedules — jit-traceable step -> lr functions.

Mirrors the reference's lr_scheduler set (python/oneflow/nn/optimizer/
*_lr.py: StepLR, MultiStepLR, ExponentialLR, CosineAnnealingLR,
PolynomialLR, WarmupLR composition). Schedules are pure functions of the
(traced) step counter, composable with any optimizer from optimizers.py.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant(lr: float) -> Schedule:
    return lambda step: jnp.asarray(lr, jnp.float32)


def step_lr(lr: float, step_size: int, gamma: float = 0.1) -> Schedule:
    """Decay lr by ``gamma`` every ``step_size`` optimizer steps.

    >>> s = step_lr(0.1, step_size=2, gamma=0.5)
    >>> [round(float(s(t)), 4) for t in (1, 2, 3, 4, 5)]
    [0.1, 0.1, 0.05, 0.05, 0.025]
    """

    def f(step):
        k = jnp.floor_divide(step - 1, step_size).astype(jnp.float32)
        return jnp.asarray(lr, jnp.float32) * gamma ** k

    return f


def multistep_lr(lr: float, milestones: Sequence[int], gamma: float = 0.1) -> Schedule:
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def f(step):
        k = jnp.sum(step > ms).astype(jnp.float32)
        return jnp.asarray(lr, jnp.float32) * gamma ** k

    return f


def exponential_lr(lr: float, gamma: float) -> Schedule:
    def f(step):
        return jnp.asarray(lr, jnp.float32) * gamma ** (step.astype(jnp.float32) - 1)

    return f


def cosine_annealing(lr: float, t_max: int, eta_min: float = 0.0) -> Schedule:
    def f(step):
        t = jnp.clip(step.astype(jnp.float32) - 1, 0, t_max)
        return eta_min + 0.5 * (lr - eta_min) * (1 + jnp.cos(jnp.pi * t / t_max))

    return f


def polynomial_lr(
    lr: float, decay_steps: int, end_lr: float = 0.0, power: float = 1.0
) -> Schedule:
    def f(step):
        t = jnp.clip(step.astype(jnp.float32) - 1, 0, decay_steps)
        frac = (1 - t / decay_steps) ** power
        return (lr - end_lr) * frac + end_lr

    return f


def warmup(schedule: Schedule, warmup_steps: int, start_factor: float = 0.0) -> Schedule:
    """Linear warmup wrapper (the reference's WarmupLR composition)."""

    def f(step):
        base = schedule(step)
        t = jnp.clip(step.astype(jnp.float32), 0, warmup_steps)
        factor = start_factor + (1 - start_factor) * t / max(warmup_steps, 1)
        return jnp.where(step <= warmup_steps, base * factor, base)

    return f
