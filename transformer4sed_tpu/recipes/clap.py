"""CLAP-SED recipe: common-only supervised training of the CLAP query
head + zero-shot open-set evaluation.

Parity map (reference ``recipes/audioset_strong/clap/``):
  * ``train.py:10-59`` CommonOnlyClapTrainer — strong-BCE-only training
    restricted to common classes, with the frozen CLAP text-query bank
    sliced to the common subset (text_query is a registered buffer in
    ``src/models/htsat/clap_sed.py:22``, never trained — here the bank is
    passed per call, so it is a jit constant);
  * ``openset_evaluation.py`` — append novel-class text embeddings and
    detect the extended vocabulary zero-shot (shared
    ``dasm_recipe.openset_evaluate``);
  * validation runs the FULL bank (base trainer behavior): the projector
    trained on common classes generalises to rare/novel text queries.

TPU orientation: the text bank is a compile-time constant folded into the
jitted step; the HTSAT backbone runs in the same whole-step jit as the
augmentation pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer4sed_tpu.train.optim import step_increment

from transformer4sed_tpu.core import losses as L
from transformer4sed_tpu.frontend import augment
from transformer4sed_tpu.recipes.audioset_strong import SupervisedConfig, SupervisedTrainer


def make_clap_step(
    model_apply,
    frontend,
    optimizer,
    cfg: SupervisedConfig,
    common_idx: Optional[np.ndarray],
    common_query: jnp.ndarray,
):
    """Strong-only supervised step for CLAP_SED (clap/train.py:14-59).

    The HTSAT frontend emits [B, 1, T, F]; augmentations run in the
    [B, F, T] layout shared with the rest of the framework, then the
    tensor is restored before the backbone.
    """
    loss_fn_cls = L.loss_function_factory(cfg.loss_name, cfg.loss_kwargs)
    idx = None if common_idx is None else jnp.asarray(common_idx)

    def loss_fn(params, model_state, batch, key):
        kmel, kshift, kmix, kmixp, ktrans, kfwd = jax.random.split(key, 6)
        mel = frontend(batch["wav"], key=kmel, training=True)  # [B, 1, T, F]
        x = mel[:, 0].transpose(0, 2, 1)  # [B, F, T]
        labels = batch["labels"]
        if idx is not None:
            labels = jnp.take(labels, idx, axis=1)
        net_pooling = max(int(round(x.shape[-1] / labels.shape[-1])), 1)
        x, labels = augment.frame_shift(
            kshift, x, labels, net_pooling=net_pooling,
            max_shift_frame=min(cfg.max_shift_frame, x.shape[-1] // 2),
        )
        c = jax.random.beta(jax.random.fold_in(kmix, 0), cfg.mixup_alpha, cfg.mixup_beta)
        do_mix = jax.random.uniform(kmixp) < cfg.mixup_prob
        perm = jax.random.permutation(jax.random.fold_in(kmix, 1), x.shape[0])
        x = jnp.where(do_mix, c * x + (1 - c) * x[perm], x)
        labels = jnp.where(do_mix, jnp.clip(c * labels + (1 - c) * labels[perm], 0, 1), labels)
        x = augment.feature_transformation(
            ktrans, x, 1, cfg.transform_choice,
            filter_db_range=cfg.filter_db_range, filter_bands=cfg.filter_bands,
            filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
            filter_type=cfg.filter_type, norm_std=5.0,
        )
        mel = x.transpose(0, 2, 1)[:, None]  # back to [B, 1, T, F]
        out, new_ms = model_apply(
            params, mel, train=True, rngs={"dropout": kfwd}, model_state=model_state,
            query=common_query, **cfg.model_kwargs,
        )
        loss_strong = loss_fn_cls(out.strong, labels)
        return loss_strong, ({"loss_class_strong": loss_strong}, new_ms)

    def step(state, batch, key):
        (_, (metrics, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, batch, key
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt, step=state.step + step_increment(new_opt), model_state=new_ms
        ), metrics

    return step


class CommonOnlyClapTrainer(SupervisedTrainer):
    """Epoch driver for CLAP-SED (clap/train.py:10-59 on the HTSAT_CNN
    trainer chassis): train only common classes with the common text-query
    slice; validate with the full bank.

    ``query_bank``: [C, query_dim] frozen CLAP text embeddings in codec
    label order; ``common_mask``: length-C bool, True = common.
    """

    def __init__(self, *args, common_mask=None, query_bank=None, **kwargs):
        if common_mask is None or query_bank is None:
            raise ValueError("CommonOnlyClapTrainer requires common_mask and query_bank")
        self.common_mask = np.asarray(common_mask, dtype=bool)
        self.query_bank = jnp.asarray(query_bank)
        # full-bank queries for validation (base _eval_fn forwards val_kwargs)
        config = args[2] if len(args) > 2 else kwargs["config"]
        model_name = config.get("model_name", "CLAP_SED")
        config.setdefault(model_name, {}).setdefault("val_kwargs", {})
        config[model_name]["val_kwargs"]["query"] = self.query_bank
        super().__init__(*args, **kwargs)

    def _build_train_step(self):
        tr = self.config["training"]
        cls_loss = self.config.get("class_loss", {})
        cfg = SupervisedConfig(
            loss_name=cls_loss.get("loss_name", "BCELoss"),
            loss_kwargs=cls_loss.get("kwargs"),
            transform_choice=tuple(tr.get("transform", {}).get("choice", (1, 0, 0, 0))),
            model_kwargs=self.config.get(self.model_name, {}).get("train_kwargs", {}),
        )
        return make_clap_step(
            self.model_apply, self.frontend, self.optimizer, cfg,
            common_idx=np.flatnonzero(self.common_mask),
            common_query=self.query_bank[jnp.asarray(self.common_mask)],
        )
