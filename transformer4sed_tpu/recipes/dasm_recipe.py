"""DASM recipes: supervised AudioSet-strong training (closed set) and
open-vocabulary (AS-partial) training/eval utilities.

Parity map:
  * closed-set trainer
    (``recipes/audioset_strong/detect_any_sound/passt/train.py:36-282``):
    BCE strong loss + AT loss (CE over (C+1)-way logits via the
    multi-label -> multi-class transform, or BCE for sigmoid heads);
  * open-vocab trainer (``.../open_vocabulary.py:16-305``): train only
    on common classes/queries; evaluate with common-FIRST query
    ordering plus an attention mask so rare/novel queries attend only
    base queries + themselves, then reorder predictions back;
  * per-type (common/rare) PSDS reporting
    (``recipes/audioset_strong/base/passt_cnn/train.py:207-237``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer4sed_tpu.core import losses as L
from transformer4sed_tpu.frontend import augment
from transformer4sed_tpu.models.dasm import multi_label_to_multi_class
from transformer4sed_tpu.train.mean_teacher import pool_strong_labels


# -- open-vocab query utilities -----------------------------------------------------

def common_first_order(common_mask: np.ndarray) -> np.ndarray:
    """Permutation putting common-class indices before rare ones."""
    common_mask = np.asarray(common_mask, dtype=bool)
    return np.concatenate([np.flatnonzero(common_mask), np.flatnonzero(~common_mask)])


def reorder_pred(pred: jnp.ndarray, common_mask: np.ndarray) -> jnp.ndarray:
    """Undo common-first ordering on axis 1 (reference ``reorder_pred``)."""
    order = common_first_order(common_mask)
    inverse = np.argsort(order)
    return jnp.take(pred, jnp.asarray(inverse), axis=1)


def open_vocab_att_mask(common_mask: np.ndarray) -> np.ndarray:
    """[Q, Q] bool self-attention mask for common-first query ordering:
    every query may attend common (base) queries and itself; rare/novel
    queries are hidden from each other (reference ``get_att_mask``)."""
    common_mask = np.asarray(common_mask, dtype=bool)
    n = len(common_mask)
    n_common = int(common_mask.sum())
    mask = np.ones((n, n), dtype=bool)
    mask[:, :n_common] = False
    np.fill_diagonal(mask, False)
    return mask


# -- supervised DASM train step -------------------------------------------------------

@dataclass(frozen=True)
class DASMTrainConfig:
    out_type: str = "sigmoid"  # 'sigmoid' | 'logit'
    w_at: float = 1.0
    net_pooling: int = 1
    max_shift_frame: int = 90
    mixup_prob: float = 0.5
    mixup_alpha: float = 10.0
    mixup_beta: float = 0.5
    transform_choice: Tuple[int, int, int, int] = (1, 0, 0, 0)
    filter_db_range: Tuple[float, float] = (-0.5, 0.5)
    filter_bands: Tuple[int, int] = (3, 6)
    filter_minimum_bandwidth: int = 6
    filter_type: str = "step"
    model_kwargs: Dict[str, Any] = field(default_factory=dict)
    # open-vocab: static common-class mask (None -> closed set)
    common_mask: Optional[Tuple[bool, ...]] = None


def _ce_multiclass(at_logits: jnp.ndarray, weak_targets: jnp.ndarray) -> jnp.ndarray:
    """CE over the (C+1)-way per-query logits against multi-class targets
    built from multi-label weak targets (reference train.py:92-96)."""
    targets = multi_label_to_multi_class(weak_targets)  # [B, Q, C+1]
    logp = jax.nn.log_softmax(at_logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def make_dasm_step(model_apply: Callable, frontend, optimizer, cfg: DASMTrainConfig):
    """Supervised AudioSet-strong step. ``batch`` = dict(wav, labels[B,C,T]).

    In open-vocab mode (cfg.common_mask set) labels are restricted to the
    common classes and the model must be called with the common query
    subset via cfg.model_kwargs (handled by the recipe driver).
    """
    common_idx = (
        None
        if cfg.common_mask is None
        else jnp.asarray(np.flatnonzero(np.asarray(cfg.common_mask, dtype=bool)))
    )

    def loss_fn(params, batch, key, extra_kwargs):
        kmel, kshift, kmix, kmixp, ktrans, kfwd = jax.random.split(key, 6)
        mel = frontend(batch["wav"], key=kmel, training=True)
        mel = frontend.normalize(mel)
        labels = batch["labels"]
        if common_idx is not None:
            labels = jnp.take(labels, common_idx, axis=1)

        mel, labels = augment.frame_shift(
            kshift, mel, labels, net_pooling=cfg.net_pooling, max_shift_frame=cfg.max_shift_frame
        )
        # whole-batch mixup with prob (reference base trainer preprocess)
        c = jax.random.beta(jax.random.fold_in(kmix, 0), cfg.mixup_alpha, cfg.mixup_beta)
        do_mix = jax.random.uniform(kmixp) < cfg.mixup_prob
        perm = jax.random.permutation(jax.random.fold_in(kmix, 1), mel.shape[0])
        mixed_mel = c * mel + (1 - c) * mel[perm]
        mixed_lab = jnp.clip(c * labels + (1 - c) * labels[perm], 0.0, 1.0)
        mel = jnp.where(do_mix, mixed_mel, mel)
        labels = jnp.where(do_mix, mixed_lab, labels)

        mel = augment.feature_transformation(
            ktrans,
            mel,
            n_transform=1,
            choice=cfg.transform_choice,
            filter_db_range=cfg.filter_db_range,
            filter_bands=cfg.filter_bands,
            filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
            filter_type=cfg.filter_type,
            norm_std=5.0,
        )

        labels_weak = pool_strong_labels(labels)
        rngs = {
            k: jax.random.fold_in(kfwd, i)
            for i, k in enumerate(("patchout", "dropout", "mlm", "query"))
        }
        out = model_apply(
            params, mel, train=True, rngs=rngs, **cfg.model_kwargs, **extra_kwargs
        )

        if cfg.out_type == "logit":
            loss_at = _ce_multiclass(out.at_out, labels_weak)
        else:
            loss_at = L.bce(out.at_out, labels_weak)
        loss_strong = L.bce(out.strong, labels)
        total = loss_strong + cfg.w_at * loss_at
        return total, {
            "loss_total": total,
            "loss_class_strong": loss_strong,
            "loss_class_at_specific": loss_at,
        }

    def step(state, batch, key, extra_kwargs: Optional[dict] = None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key, extra_kwargs or {}
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=new_opt, step=state.step + 1), metrics

    return step


# -- per-type PSDS reporting ----------------------------------------------------------

def split_psds_by_type(
    single_class_psds: Dict[str, float], type_map: Dict[str, str]
) -> Dict[str, float]:
    """Aggregate per-class PSDS into common/rare means
    (reference ``base/passt_cnn/train.py:207-237`` with state.json)."""
    groups: Dict[str, list] = {}
    for cls, value in single_class_psds.items():
        groups.setdefault(type_map.get(cls, "unknown"), []).append(value)
    return {f"psds_{k}": float(np.mean(v)) for k, v in groups.items()}
