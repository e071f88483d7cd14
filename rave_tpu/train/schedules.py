"""Training schedules as pure functions of the step counter.

The reference implements these as Lightning callbacks mutating module state
(rave/model.py:45-113); here they are jit-safe functions so the whole
training step stays one XLA program per phase.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def beta_factor(
    step,
    initial: float,
    target: float,
    warmup_len: int,
    log_warmup: bool = True,
):
    """KL-weight ramp (reference BetaWarmupCallback, rave/model.py:78-113)."""
    t = jnp.clip((step + 1) / max(warmup_len, 1), 0.0, 1.0)
    if log_warmup and initial > 0:
        beta = jnp.exp(
            (1 - t) * math.log(initial) + t * math.log(target)
        )
    else:
        beta = t * (target - initial) + initial
    return jnp.where(step + 1 >= warmup_len, target, beta)


def warmed_up(step: int, phase_1_duration: int) -> bool:
    """Host-side phase flag (reference WarmupCallback, rave/model.py:45-61).
    Static: selects which compiled step function runs."""
    return step >= phase_1_duration


def quantize_enabled(step: int, warmup_quantize) -> bool:
    """RVQ gate (reference QuantizeCallback, rave/model.py:64-75):
    None -> never enabled; -1 (discrete.gin) -> enabled from the start."""
    if warmup_quantize is None:
        return False
    return step >= warmup_quantize


def gen_lr_schedule(base_lr: float, end_factor: float, warmup: int):
    """LinearLR 1.0 -> end_factor over phase 1 (reference rave/model.py:235)."""

    def sched(step):
        t = jnp.clip(step / max(warmup, 1), 0.0, 1.0)
        return base_lr * (1.0 + t * (end_factor - 1.0))

    return sched
