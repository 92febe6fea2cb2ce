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

from transformer4sed_tpu.train.optim import step_increment

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
    # open-vocab with learnable queries: slice the model's own ``at_query``
    # param to the common subset inside the loss so gradients flow into the
    # query bank (reference open_vocabulary.py:21-32 slices the nn.Parameter,
    # which torch autograd scatters back through)
    query_from_params: bool = False


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

    def loss_fn(params, model_state, batch, key, extra_kwargs):
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
        if common_idx is not None and cfg.query_from_params:
            extra_kwargs = dict(extra_kwargs)
            extra_kwargs["query"] = jnp.take(params["at_query"], common_idx, axis=0)
        out, new_ms = model_apply(
            params, mel, train=True, rngs=rngs, model_state=model_state,
            **cfg.model_kwargs, **extra_kwargs
        )

        if cfg.out_type == "logit":
            loss_at = _ce_multiclass(out.at_out, labels_weak)
        else:
            loss_at = L.bce(out.at_out, labels_weak)
        loss_strong = L.bce(out.strong, labels)
        total = loss_strong + cfg.w_at * loss_at
        metrics = {
            "loss_total": total,
            "loss_class_strong": loss_strong,
            "loss_class_at_specific": loss_at,
        }
        return total, (metrics, new_ms)

    def step(state, batch, key, extra_kwargs: Optional[dict] = None):
        (_, (metrics, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, batch, key, extra_kwargs or {}
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt, step=state.step + step_increment(new_opt), model_state=new_ms
        ), metrics

    return step


# -- epoch drivers --------------------------------------------------------------------

def macro_average_precision(preds: np.ndarray, targets: np.ndarray) -> float:
    """Macro mAP over classes with >=1 positive (torchmetrics
    MultilabelAveragePrecision(average='macro') in open_vocabulary.py:147).

    preds/targets: [N, C] scores and {0,1} labels.
    """
    preds = np.asarray(preds, dtype=np.float64)
    targets = np.asarray(targets) > 0.5
    aps = []
    for c in range(preds.shape[1]):
        pos = targets[:, c]
        n_pos = int(pos.sum())
        if n_pos == 0:
            continue
        order = np.argsort(-preds[:, c], kind="stable")
        hits = pos[order]
        precision = np.cumsum(hits) / (np.arange(hits.shape[0]) + 1)
        aps.append(float((precision * hits).sum() / n_pos))
    return float(np.mean(aps)) if aps else 0.0


from transformer4sed_tpu.recipes.audioset_strong import SupervisedTrainer  # noqa: E402


class DASMTrainer(SupervisedTrainer):
    """Closed-set DASM epoch driver (reference
    ``recipes/audioset_strong/detect_any_sound/passt/train.py:36-282``):
    the supervised AudioSet-strong loop with the query-based AT-branch
    loss (CE over (C+1)-way logits or BCE) added to the strong BCE.

    Built on ``SupervisedTrainer``; only the train step differs.

    ``query_bank``: for ``query_projector`` models, the external query
    tensors the reference loads as buffers at init
    (``detect_any_sound.py:124-165``) — one ``[C, d]`` array per
    modality (list => random modality per query during training via the
    'query' rng, text/first modality at eval). None => learnable
    ``at_query`` models.
    """

    def __init__(self, *args, query_bank=None, **kwargs):
        self.query_bank = (
            [jnp.asarray(b) for b in query_bank]
            if isinstance(query_bank, (list, tuple))
            else (jnp.asarray(query_bank) if query_bank is not None else None)
        )
        super().__init__(*args, **kwargs)
        if getattr(self.model, "query_projector", False) and self.query_bank is None:
            raise ValueError(
                "query_projector DASM needs dataset.text_query/audio_query "
                "banks for closed-set training"
            )
        if self.query_bank is not None:
            # eval with the full bank (first/text modality when multi-modal)
            val_kwargs = self.config.get(self.model_name, {}).get("val_kwargs", {})
            model_apply = self.model_apply
            bank = self.query_bank

            @jax.jit
            def eval_fn(p, ms, m, pm):
                out, _ = model_apply(
                    p, m, train=False, pad_mask=pm, model_state=ms,
                    query=bank, **val_kwargs,
                )
                return out

            self._eval_fn = eval_fn

    def _dasm_config(self, common_mask=None) -> DASMTrainConfig:
        tr = self.config["training"]
        model_cfg = self.config.get(self.model_name, {})
        return DASMTrainConfig(
            out_type=model_cfg.get("at_param", {}).get("out_type", "sigmoid"),
            w_at=tr.get("w_AT", 1.0),
            transform_choice=tuple(tr.get("transform", {}).get("choice", (1, 0, 0, 0))),
            model_kwargs=model_cfg.get("train_kwargs", {}),
            common_mask=common_mask,
            query_from_params=common_mask is not None
            and not model_cfg.get("at_param", {}).get("query_projector", False),
        )

    def _build_train_step(self):
        step = make_dasm_step(
            self.model_apply, self.frontend, self.optimizer, self._dasm_config()
        )
        if self.query_bank is None:
            return step
        bank = self.query_bank
        return lambda state, batch, key: step(
            state, batch, key, extra_kwargs={"query": bank}
        )


class OVDASMTrainer(DASMTrainer):
    """Open-vocabulary DASM driver (reference ``open_vocabulary.py:16-305``).

    Training sees only common classes: labels are restricted to the common
    subset and the model runs with the common query slice (gradients flow
    into the query bank via the in-loss slice). Validation/test run ALL
    queries in common-first order with an attention mask hiding rare
    queries from each other, then predictions are reordered back and PSDS
    is reported per type (common/rare) alongside the AT-branch macro mAP.

    ``common_mask``: length-C bool array, True for common (base) classes,
    in codec label order.
    """

    def __init__(self, *args, common_mask=None, query_bank=None, **kwargs):
        if common_mask is None:
            raise ValueError("OVDASMTrainer requires common_mask")
        self.common_mask = np.asarray(common_mask, dtype=bool)
        # external query bank [C, query_dim] (query_projector models);
        # None -> learnable queries sliced from params. Forwarded through
        # DASMTrainer.__init__ (which owns the attribute + sanity check).
        super().__init__(*args, query_bank=query_bank, **kwargs)

    def _build_train_step(self):
        cfg = self._dasm_config(common_mask=tuple(bool(b) for b in self.common_mask))
        step = make_dasm_step(self.model_apply, self.frontend, self.optimizer, cfg)
        if self.query_bank is not None:
            common_query = jnp.asarray(self.query_bank)[jnp.asarray(self.common_mask)]
            return lambda state, batch, key: step(
                state, batch, key, extra_kwargs={"query": common_query}
            )
        return step

    def _eval_queries(self):
        """Common-first query ordering + self-attention mask for eval
        (open_vocabulary.py:98-132)."""
        order = common_first_order(self.common_mask)
        bank = (
            jnp.asarray(self.query_bank)
            if self.query_bank is not None
            else self.state.params["at_query"]
        )
        query = jnp.take(bank, jnp.asarray(order), axis=0)
        att_mask = jnp.asarray(open_vocab_att_mask(self.common_mask))
        return query, att_mask

    def validation(self, epoch: int, ground_truth, durations, median_filter=7):
        from transformer4sed_tpu.eval.decode import batched_decode_preds
        from transformer4sed_tpu.eval.psds import compute_psds_from_scores
        from transformer4sed_tpu.recipes.audioset_strong import drop_absent_classes

        query, att_mask = self._eval_queries()

        if not hasattr(self, "_ov_eval_fn"):
            # jitted ONCE: query changes every epoch (learnable bank), so
            # it is an argument, not a closure constant — a fresh closure
            # per validation would recompile the eval forward each epoch
            val_kwargs = self.config.get(self.model_name, {}).get("val_kwargs", {})

            @jax.jit
            def eval_fn(params, model_state, mel, pad_mask, query, att_mask):
                out, _ = self.model_apply(
                    params, mel, train=False, pad_mask=pad_mask, model_state=model_state,
                    query=query, tgt_mask=att_mask, **val_kwargs,
                )
                at_out = out.at_out
                if at_out.ndim == 3:  # 'logit' head: clip score = softmax diagonal
                    probs = jax.nn.softmax(at_out, axis=-1)
                    qi = jnp.arange(probs.shape[1])
                    at_out = probs[:, qi, qi]
                return (
                    reorder_pred(out.strong, self.common_mask),
                    reorder_pred(at_out, self.common_mask),
                )

            self._ov_eval_fn = eval_fn

        from transformer4sed_tpu.recipes import common as _common

        scores = {}
        at_preds, at_targets = [], []
        # multi-host: params must join the batch on the local eval mesh
        ev_params, ev_state = _common.localize_eval_params(
            self.mesh, self.state.params, self.state.model_state
        )
        for batch in self.val_loader:
            mel = self.frontend.normalize(self.frontend(jnp.asarray(batch["wav"])))
            # multi-chip: evaluation rides the same data mesh as training
            mel, pm = _common.shard_eval_put(
                self.mesh, mel, jnp.asarray(batch["pad_mask"])
            )
            strong, at_out = self._ov_eval_fn(
                ev_params, ev_state, mel, pm, query, att_mask
            )
            labels = np.asarray(batch["label"])
            at_preds.append(np.asarray(at_out))
            at_targets.append((labels.sum(-1) >= 1).astype(np.float32))
            _, post = batched_decode_preds(
                strong, batch["filename"], self.codec, filter=median_filter
            )
            scores.update(post)

        if jax.process_count() > 1:
            # each process scored its strided val subset (local eval mesh)
            from transformer4sed_tpu.parallel.multihost import gather_clip_scores, gather_objects

            scores = gather_clip_scores(scores)
            at_preds = [a for part in gather_objects(at_preds) for a in part]
            at_targets = [a for part in gather_objects(at_targets) for a in part]

        psds, single = compute_psds_from_scores(
            scores, ground_truth, durations,
            dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0.0, alpha_st=0.0,
        )
        single = drop_absent_classes(single, ground_truth, self.codec.labels)
        results = {
            "psds": psds,
            "at_mAP": macro_average_precision(
                np.concatenate(at_preds), np.concatenate(at_targets)
            ),
        }
        if self.type_map:
            results.update(split_psds_by_type(single, self.type_map))
        self.logger.scalars("validation", results, epoch + 1)
        return results


def openset_evaluate(
    model,
    frontend,
    params,
    codec,
    loader,
    extra_query,
    ground_truth,
    durations,
    *,
    query_bank=None,
    median_filter=7,
    filter_type: str = "median",
    model_kwargs: Optional[dict] = None,
    query_type: Optional[str] = None,
    model_state: Optional[dict] = None,
):
    """Open-set evaluation (reference ``openset_evaluation.py:66-215``):
    append novel-class query embeddings to the trained bank and detect the
    extended vocabulary zero-shot.

    ``codec`` must carry the extended label list (base + novel, in query
    order). ``extra_query``: [C_novel, D] embeddings matching the bank's
    space — decoder_dim for learnable-query models (sliced from a donor
    bank) or query_dim for projector models (e.g. CLAP text embeddings,
    projected in-model). Returns (psds, single_class_psds, top10).
    """
    bank = jnp.asarray(query_bank) if query_bank is not None else params["at_query"]
    query = jnp.concatenate([bank, jnp.asarray(extra_query)], axis=0)
    if query.shape[0] != codec.n_classes:
        raise ValueError(
            f"extended query count {query.shape[0]} != codec classes {codec.n_classes}"
        )
    kwargs = dict(model_kwargs or {})
    if query_type is not None:
        kwargs["query_type"] = query_type  # CLAP_SED has no query_type arg

    from transformer4sed_tpu.eval.decode import batched_decode_preds
    from transformer4sed_tpu.eval.psds import compute_psds_from_scores

    @jax.jit
    def eval_fn(p, mel, pad_mask):
        out = model.apply(
            {"params": p, **(model_state or {})}, mel, train=False, pad_mask=pad_mask,
            query=query, **kwargs,
        )
        return out.strong

    scores = {}
    for batch in loader:
        mel = frontend.normalize(frontend(jnp.asarray(batch["wav"])))
        strong = eval_fn(params, mel, jnp.asarray(batch["pad_mask"]))
        _, post = batched_decode_preds(
            strong, batch["filename"], codec, filter=median_filter, filter_type=filter_type
        )
        scores.update(post)

    psds, single = compute_psds_from_scores(
        scores, ground_truth, durations,
        dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0.0, alpha_st=0.0,
    )
    top10 = dict(sorted(single.items(), key=lambda kv: kv[1], reverse=True)[:10])
    return psds, single, top10


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
