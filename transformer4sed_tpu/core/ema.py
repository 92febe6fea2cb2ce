"""Mean-teacher EMA update as a jitted tree-map.

Matches the reference update (``src/utils/scheduler.py:125-130``):
``teacher <- alpha * teacher + (1 - alpha) * student`` with
``alpha = min(1 - 1/step, ema_factor)``, applied once per optimizer
step *after* the step. Because student and teacher trees carry
identical shardings under pjit, this adds zero communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(student_params, teacher_params, step, ema_factor: float = 0.999):
    """One EMA step. ``step`` is the 1-based optimizer step count."""
    step = jnp.asarray(step, dtype=jnp.float32)
    alpha = jnp.minimum(1.0 - 1.0 / jnp.maximum(step, 1.0), ema_factor)
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s, teacher_params, student_params
    )
