"""Loss library — pure jnp functions plus a name -> factory registry.

Functional equivalents of the reference's loss zoo
(``src/functional/loss/__init__.py``, ``info_nce.py``,
``sup_con_loss.py``): BCE/MSE, asymmetric losses (ASL with margin and
per-sign focusing exponents, reweighted ASL, asymmetric focal), InfoNCE
and supervised contrastive. All are pure functions of arrays so they
fuse into the jitted train step; log terms are clamped at -100 to match
reference numerics.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
from jax import nn as jnn

_LOG_CLAMP = -100.0


_LOG_TINY = 1e-37  # safely above FLT_MIN (denormals flush to 0 on TPU/oneDNN)


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    """log with torch-BCELoss numerics AND finite gradients.

    Value: exact log for x >= 1e-37, torch's -100 clamp below. On TPU
    (FTZ) the only sub-1e-37 sigmoid output is exactly 0, where torch
    clamps log(0) to -100 too, so values match torch everywhere. On
    non-FTZ hosts (CPU tests) float32 subnormals down to ~1.4e-45 are
    producible and for x in (~3.7e-44, 1e-37) torch returns
    max(log x, -100) in (-100, -85] while this clamps flat to -100 — a
    deliberate deviation in the deeply saturated band: lowering the
    cutoff toward exp(-100) would make 1/x overflow float32 and
    reintroduce the inf gradients this function exists to avoid.
    Gradient: the old
    ``max(log(max(x, 0)), -100)`` form had gradient inf * 0 = NaN at
    saturated predictions (log'(0) = inf times the unselected-branch
    zero) — an untrained CLAP head saturates sigmoid to exactly 1.0 and
    NaN'd its params in one optimizer step; ``where`` + an inner floor
    keeps both branches' gradients finite."""
    return jnp.where(
        x < _LOG_TINY, _LOG_CLAMP, jnp.log(jnp.maximum(x, jnp.float32(_LOG_TINY)))
    )


def bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (reference nn.BCELoss semantics)."""
    losses = -(target * _safe_log(pred) + (1.0 - target) * _safe_log(1.0 - pred))
    return jnp.mean(losses)


def bce_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE on logits (preferred inside jitted steps)."""
    losses = jnn.softplus(logits) - target * logits
    return jnp.mean(losses)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def asl(pred: jnp.ndarray, target: jnp.ndarray, rp: float, rn: float, margin: float) -> jnp.ndarray:
    """Asymmetric loss with probability margin (reference AslLoss)."""
    pred_m = jnp.maximum(pred - margin, 0.0)
    losses = -(
        ((1.0 - pred) ** rp) * target * _safe_log(pred)
        + (pred_m ** rn) * (1.0 - target) * _safe_log(1.0 - pred_m)
    )
    return jnp.mean(losses)


def reweighted_asl(
    pred: jnp.ndarray, target: jnp.ndarray, rp: float, rn: float, margin: float, weight
) -> jnp.ndarray:
    """ASL with per-class weights on the trailing (class) dimension."""
    weight = jnp.asarray(weight, dtype=pred.dtype)
    pred_m = jnp.maximum(pred - margin, 0.0)
    losses = -weight * (
        ((1.0 - pred) ** rp) * target * _safe_log(pred)
        + (pred_m ** rn) * (1.0 - target) * _safe_log(1.0 - pred_m)
    )
    return jnp.mean(losses)


def asymmetric_focal(pred: jnp.ndarray, target: jnp.ndarray, gamma: float = 0.0, zeta: float = 0.0) -> jnp.ndarray:
    """Asymmetric focal loss (reference AsymmetricalFocalLoss)."""
    losses = -(
        ((1.0 - pred) ** gamma) * target * _safe_log(pred)
        + (pred ** zeta) * (1.0 - target) * _safe_log(1.0 - pred)
    )
    return jnp.mean(losses)


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _cross_entropy_int(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jnn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def info_nce(
    query: jnp.ndarray,
    positive_key: jnp.ndarray,
    negative_keys: Optional[jnp.ndarray] = None,
    temperature: float = 0.1,
    negative_mode: str = "unpaired",
) -> jnp.ndarray:
    """InfoNCE contrastive loss (reference ``info_nce.py`` semantics).

    query/positive_key: [N, D]. negative_keys: [M, D] ('unpaired') or
    [N, M, D] ('paired'); None -> in-batch negatives (off-diagonal).
    """
    query = _l2_normalize(query)
    positive_key = _l2_normalize(positive_key)
    if negative_keys is not None:
        negative_keys = _l2_normalize(negative_keys)
        positive_logit = jnp.sum(query * positive_key, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            negative_logits = query @ negative_keys.T
        elif negative_mode == "paired":
            negative_logits = jnp.einsum("nd,nmd->nm", query, negative_keys)
        else:
            raise ValueError(f"unknown negative_mode {negative_mode!r}")
        logits = jnp.concatenate([positive_logit, negative_logits], axis=1)
        labels = jnp.zeros((logits.shape[0],), dtype=jnp.int32)
    else:
        logits = query @ positive_key.T
        labels = jnp.arange(query.shape[0], dtype=jnp.int32)
    return _cross_entropy_int(logits / temperature, labels)


def sup_con(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    contrast_mode: str = "all",
    base_temperature: float = 0.07,
) -> jnp.ndarray:
    """Supervised contrastive loss (Khosla et al.; reference SupConLoss).

    features: [B, n_views, D] (assumed normalised by caller, as in the
    reference); labels: [B] ints; mask: [B, B].
    """
    if features.ndim < 3:
        raise ValueError("features must be [bsz, n_views, ...]")
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)
    batch = features.shape[0]
    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(batch, dtype=features.dtype)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(features.dtype)
    else:
        mask = mask.astype(features.dtype)

    contrast_count = features.shape[1]
    contrast_feature = features.transpose(1, 0, 2).reshape(-1, features.shape[-1])
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, contrast_count
    else:
        raise ValueError(f"unknown contrast_mode {contrast_mode!r}")

    logits = (anchor_feature @ contrast_feature.T) / temperature
    logits = logits - jax_stop_gradient_max(logits)

    mask = jnp.tile(mask, (anchor_count, contrast_count))
    n_anchor = batch * anchor_count
    logits_mask = 1.0 - jnp.eye(n_anchor, mask.shape[1], dtype=mask.dtype)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-12)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, batch))


def jax_stop_gradient_max(logits: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))


# -- factory ----------------------------------------------------------------
# YAML configs name losses by class name (reference `class_loss` section,
# `loss_function_factory` at src/functional/loss/__init__.py:18); a plain
# registry replaces the reflection-based import.

def _with_kwargs(fn: Callable, **fixed) -> Callable:
    def wrapped(pred, target):
        return fn(pred, target, **fixed)

    return wrapped


_REGISTRY: Dict[str, Callable[..., Callable]] = {
    "BCELoss": lambda **kw: bce,
    "MSELoss": lambda **kw: mse,
    "AslLoss": lambda **kw: _with_kwargs(asl, **kw),
    "ReweightedASL": lambda **kw: _with_kwargs(reweighted_asl, **kw),
    "AsymmetricalFocalLoss": lambda **kw: _with_kwargs(asymmetric_focal, **kw),
}


def loss_function_factory(name: str, kwargs: Optional[dict] = None) -> Callable:
    """Build a ``loss(pred, target) -> scalar`` from a config name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown loss {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**(kwargs or {}))
