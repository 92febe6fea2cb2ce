"""Learning-rate schedules as optax-style ``step -> scale`` functions.

Each returns the multiplicative *scale* relative to the group's base
learning rate, matching the reference scheduler semantics
(``src/utils/scheduler.py:7-122``). Use with
``optax.scale_by_schedule`` or via ``train.optim.build_optimizer``.

Note: the reference steps its scheduler starting from ``step_num = 1``
and increments before computing, so the scale at optimizer step ``i``
(0-based) corresponds to ``step_num = i + 2`` there. We expose the
mathematical schedule directly — a function of the 0-based step —
which reproduces the same curves up to this one-step offset.
"""

from __future__ import annotations

import jax.numpy as jnp

from transformer4sed_tpu.core import ramps


def exponential_warmup(rampup_length: int, exponent: float = -5.0):
    """exp(exponent * (1 - t)^2) warm-up to 1.0 (reference ExponentialWarmup)."""

    def schedule(step):
        if rampup_length == 0:
            return jnp.asarray(1.0)
        current = jnp.clip(step, 0.0, rampup_length)
        phase = 1.0 - current / rampup_length
        return jnp.exp(exponent * phase * phase)

    return schedule


def exponential_down(
    start_iter: int,
    total_iter: int,
    exponent: float = -0.5,
    warmup_iter: int = 0,
    warmup_rate: float = 0.1,
):
    """Linear warm-up -> plateau at 1.0 -> exp(exponent * phase^2) decay.

    The workhorse schedule of the reference recipes
    (``src/utils/scheduler.py:41-76``).
    """

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = (1.0 - warmup_rate) * (step / max(warmup_iter, 1)) + warmup_rate
        phase = (step - start_iter) / max(total_iter - start_iter, 1)
        down = jnp.exp(exponent * phase * phase)
        scale = jnp.where(step < warmup_iter, warm, jnp.where(step > start_iter, down, 1.0))
        return scale

    return schedule


def cosine_down(rampup_iter: int, total_iter: int):
    """Sigmoid ramp-up then cosine ramp-down (reference CosineDown)."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        up = ramps.sigmoid_rampup(step, rampup_iter)
        down = ramps.cosine_rampdown(jnp.clip(step - rampup_iter, 0.0, total_iter), total_iter)
        return jnp.where(step < rampup_iter, up, down)

    return schedule
