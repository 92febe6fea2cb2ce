"""Pure pooling math shared across models."""

from __future__ import annotations

import jax.numpy as jnp


def linear_softmax_pool(sed_probs: jnp.ndarray, axis: int = 1, eps_min: float = 1e-7) -> jnp.ndarray:
    """Linear-softmax pooling of frame probabilities into clip probabilities.

    ``(p * p).sum(T) / p.sum(T)``, clamped to [eps_min, 1] — the shared
    weak-output contract of every reference model (e.g.
    ``src/models/passt/passt_sed.py:293-294``).

    Args:
      sed_probs: probabilities with a time axis at ``axis`` (e.g. [B, T, C]).
    """
    num = jnp.sum(sed_probs * sed_probs, axis=axis)
    den = jnp.sum(sed_probs, axis=axis)
    return jnp.clip(num / jnp.maximum(den, 1e-12), eps_min, 1.0)
