"""LR schedules as pure optax-compatible functions.

Parity with reference src/lr_schedulers.py: StepLR and the
cosine-annealing-warmup-restarts schedule (linear warmup, cosine cycles with
``cycle_mult`` growth and per-cycle max-lr decay ``gamma``). Schedules here
are step-indexed pure functions (optax convention); the trainer maps the
reference's per-epoch stepping onto step counts via ``steps_per_epoch``.
"""

from __future__ import annotations

import math
import typing

import jax.numpy as jnp
import optax


def step_decay(base_lr: float, step_size: int, gamma: float) -> optax.Schedule:
    """lr = base_lr * gamma^(count // step_size)  (torch StepLR)."""

    def schedule(count):
        return base_lr * gamma ** (count // step_size)

    return schedule


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    max_lr: float = 0.1,
    min_lr: float = 0.001,
    warmup_steps: int = 0,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
) -> optax.Schedule:
    """Warmup + cosine restarts with growing cycles and decaying peaks.

    Cycle c has length ``(first_cycle_steps - warmup) * cycle_mult^c + warmup``
    and peak LR ``max_lr * gamma^c``; within a cycle: linear warmup from
    min_lr to the peak, then cosine decay back to min_lr.
    """
    assert warmup_steps < first_cycle_steps

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(count / first_cycle_steps)
            step_in_cycle = count - cycle * first_cycle_steps
            cycle_steps = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # Invert the geometric cycle-length series to find the cycle index.
            n = jnp.floor(
                jnp.log(count / first_cycle_steps * (cycle_mult - 1.0) + 1.0) / math.log(cycle_mult)
            )
            start = first_cycle_steps * (cycle_mult**n - 1.0) / (cycle_mult - 1.0)
            cycle = n
            step_in_cycle = count - start
            cycle_steps = first_cycle_steps * cycle_mult**n
        peak = max_lr * gamma**cycle
        warm = min_lr + (peak - min_lr) * step_in_cycle / max(warmup_steps, 1)
        cos = min_lr + (peak - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (step_in_cycle - warmup_steps) / (cycle_steps - warmup_steps))
        )
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return schedule


def build_schedule(
    base_lr: float,
    scheduler_type: str | None,
    steps_per_epoch: int = 1,
    *,
    step_size_epochs: int | None = None,
    step_gamma: float | None = None,
    first_cycle_epochs: int | None = None,
    cycle_mult: float | None = None,
    max_lr: float | None = None,
    min_lr: float | None = None,
    warmup_epochs: int | None = None,
    gamma: float | None = None,
) -> optax.Schedule | float:
    """Factory mirroring reference get_lr_scheduler: None -> constant lr."""
    if scheduler_type is None:
        return base_lr
    if scheduler_type == "step":
        return step_decay(base_lr, (step_size_epochs or 1) * steps_per_epoch, step_gamma or 0.1)
    if scheduler_type == "cosine":
        kwargs: dict[str, typing.Any] = {}
        if max_lr is not None:
            kwargs["max_lr"] = max_lr
        if min_lr is not None:
            kwargs["min_lr"] = min_lr
        if cycle_mult is not None:
            kwargs["cycle_mult"] = cycle_mult
        if gamma is not None:
            kwargs["gamma"] = gamma
        if warmup_epochs is not None:
            kwargs["warmup_steps"] = warmup_epochs * steps_per_epoch
        return cosine_annealing_warmup_restarts(
            first_cycle_steps=(first_cycle_epochs or 10) * steps_per_epoch, **kwargs
        )
    raise ValueError(f"Unknown scheduler type {scheduler_type!r}")
