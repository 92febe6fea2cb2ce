"""Hyper-parameter ramp functions (mean-teacher heritage).

Pure functions of the step count, matching the reference semantics
(``src/functional/ramps.py:21-53``). They work on Python floats and on
traced jnp scalars alike, so they can be used both for host-side epoch
bookkeeping and inside the jitted train step (consistency-weight
warm-up).
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 * (1 - t)^2) ramp-up from arXiv:1610.02242."""
    if rampup_length == 0:
        return 1.0
    current = jnp.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    if rampup_length == 0:
        return 1.0
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    """Cosine ramp-down from arXiv:1608.03983."""
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)


def sigmoid_rampdown(current, rampup_length):
    """exp(-12.5 * (1 - t)^2) variant used for ramp-downs."""
    if rampup_length == 0:
        return 1.0
    current = jnp.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-12.5 * phase * phase)
