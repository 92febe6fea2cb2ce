"""MAT-SED recipe: mean-teacher fine-tune + MLM pretrain trainers.

Orchestration equivalent of ``recipes/desed/finetune/train.py`` and
``recipes/desed/mlm``: the host loop feeds batches to ONE jitted train
step per stage, runs validation (device score production -> host
PSDS1/PSDS2 + event F1), tracks best student/teacher by PSDS1 and
checkpoints full train state.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.eval.decode import batched_decode_preds, decode_pred_batch
from transformer4sed_tpu.eval.psds import compute_psds_from_scores
from transformer4sed_tpu.eval.sed_f1 import event_based_f1
from transformer4sed_tpu.recipes import common
from transformer4sed_tpu.train.mean_teacher import (
    MeanTeacherConfig,
    create_mean_teacher_state,
    make_mean_teacher_step,
)
from transformer4sed_tpu.train.mlm import MLMConfig, MLMState, make_mlm_step, mlm_loss
from transformer4sed_tpu.utils.logging import BestModels, Logger


def weak_macro_f1(preds: np.ndarray, targets: np.ndarray, threshold: float = 0.5) -> float:
    """Macro multilabel F1 at a fixed threshold (torchmetrics parity)."""
    p = preds >= threshold
    t = targets >= 0.5
    f1s = []
    for c in range(p.shape[1]):
        tp = int((p[:, c] & t[:, c]).sum())
        fp = int((p[:, c] & ~t[:, c]).sum())
        fn = int((~p[:, c] & t[:, c]).sum())
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    return float(np.mean(f1s))


class MATSEDTrainer:
    """Mean-teacher fine-tuning driver."""

    def __init__(
        self,
        model,
        frontend,
        config: Dict,
        codec: LabelCodec,
        train_loader,
        val_loader,
        test_loader,
        logger: Logger,
        init_params=None,
        init_model_state=None,
    ):
        self.model = model
        self.frontend = frontend
        self.config = config
        self.codec = codec
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.logger = logger
        self.model_name = config.get("model_name", "PaSST_SED")

        tr = config["training"]
        bs = tr["batch_size"]  # [strong, synth, weak, unlabeled]
        steps_per_epoch = len(train_loader)
        self.mt_cfg = MeanTeacherConfig(
            strong_num=bs[0] + bs[1],
            weak_num=bs[2],
            unlabel_num=bs[3],
            net_pooling=codec.net_pooling,
            w_weak=tr.get("w_weak", 0.5),
            w_weak_cons=tr.get("w_weak_cons", 1.0),
            w_at=tr.get("w_AT", 0.2),
            w_cons_max=tr.get("w_cons_max", 40.0),
            w_cons_min=tr.get("w_cons_min", 0.0),
            self_loss_warmup_steps=tr.get("self_loss_warmup", 10) * steps_per_epoch,
            cons_scheduler=tr.get("cons_scheduler_name", "Sigmoid"),
            ema_factor=tr.get("ema_factor", 0.999),
            n_transform=tr.get("transform", {}).get("n_transform", 2),
            transform_choice=tuple(tr.get("transform", {}).get("choice", (1, 0, 0, 0))),
            filter_db_range=tuple(tr.get("transform", {}).get("filter_db_range", (-0.5, 0.5))),
            filter_bands=tuple(tr.get("transform", {}).get("filter_bands", (3, 6))),
            filter_minimum_bandwidth=tr.get("transform", {}).get("filter_minimum_bandwidth", 6),
            filter_type=tr.get("transform", {}).get("filter_type", "step"),
            freq_mask_ratio=tr.get("transform", {}).get("freq_mask_ratio"),
            noise_snrs=tr.get("transform", {}).get("noise_snrs"),
            stu_kwargs=config.get(self.model_name, {}).get("train_stu_kwargs", {}),
            tch_kwargs=config.get(self.model_name, {}).get("train_tch_kwargs", {}),
        )

        if init_params is None or init_model_state is None:
            sample = next(iter(train_loader))
            mel = frontend.normalize(frontend(jnp.asarray(sample["wav"][:1])))
            init_rngs = {"params": jax.random.PRNGKey(config["generals"].get("seed", 0))}
            if getattr(model, "mlm", False):
                init_rngs["mlm"] = jax.random.PRNGKey(1)
            variables = model.init(init_rngs, mel)
            if init_params is None:
                init_params = variables["params"]
            if init_model_state is None:
                # BatchNorm collections (PaSST_CNN 'batch'-norm CNN branch)
                init_model_state = {k: v for k, v in variables.items() if k != "params"}
        model_state = init_model_state or None
        self._aware = model_state is not None
        self.optimizer, self.labels = common.optimizer_from_config(
            init_params, config, steps_per_epoch
        )
        self.state = create_mean_teacher_state(init_params, self.optimizer, model_state)

        self.model_apply = model_apply = common.make_model_apply(model, self._aware)
        raw_step = make_mean_teacher_step(
            model_apply, frontend, self.optimizer, self.mt_cfg, model_state_aware=self._aware
        )
        # SPMD scale-out: shard the batch over all local devices when >1
        if jax.device_count() > 1 and self.mt_cfg.batch_size % jax.device_count() == 0:
            from transformer4sed_tpu.parallel import make_mesh, shard_train_step

            self.mesh = make_mesh()
            # donate the state: the previous step's buffers are dead after
            # `self.state = step(...)` (best/ckpt trackers device_get copies),
            # so XLA reuses them in place — ~1.4 GB less peak HBM on the
            # full-size model and no input copy per step
            self._train_step = shard_train_step(raw_step, self.mesh, donate_state=True)
            self.logger.info(f"sharding batches over {jax.device_count()} devices")
        else:
            self.mesh = None
            self._train_step = jax.jit(raw_step, donate_argnums=0)
        self._eval_fns: Dict[str, Any] = {}
        self.median_filter = common.median_filter_from_config(config, codec)
        self.ground_truth = common.load_ground_truth(config["dataset"]["val_tsv"])
        self.durations = common.load_durations(config["dataset"]["val_dur"])

    # -- jitted eval forward (one compiled fn per kwargs set) ---------------------
    def _eval_apply(self, params, mel, pad_mask, kwargs_key: str, model_state=None):
        if kwargs_key not in self._eval_fns:
            kwargs = self.config.get(self.model_name, {}).get(kwargs_key, {})
            if self._aware:
                self._eval_fns[kwargs_key] = jax.jit(
                    lambda p, ms, m, pm: self.model_apply(
                        p, m, train=False, pad_mask=pm, model_state=ms, **kwargs
                    )[0]
                )
            else:
                self._eval_fns[kwargs_key] = jax.jit(
                    lambda p, ms, m, pm: self.model_apply(p, m, train=False, pad_mask=pm, **kwargs)
                )
        return self._eval_fns[kwargs_key](params, model_state, mel, pad_mask)

    # -- stages ---------------------------------------------------------------------
    def train_epoch(self, epoch: int, key) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        metrics_acc: Dict[str, float] = {}
        n = len(self.train_loader)
        for i, batch in enumerate(self.train_loader):
            step_key = jax.random.fold_in(key, epoch * n + i)
            dev_batch = common.put_train_batch(
                {"wav": batch["wav"], "labels": batch["label"]}, self.mesh
            )
            self.state, metrics = self._train_step(self.state, dev_batch, step_key)
            loss = float(metrics["loss_total"])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} step {i}: {loss}"
                )  # reference NaN guard (finetune/train.py:190-191)
            for k, v in metrics.items():
                metrics_acc[k] = metrics_acc.get(k, 0.0) + float(v) / n
        self.logger.scalars("Train", metrics_acc, epoch + 1)
        self.logger.info(
            f"epoch {epoch + 1}: "
            + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics_acc.items()))
        )
        return metrics_acc

    def _collect_scores(self, params, kwargs_key: str, model_state=None, raw: bool = False):
        """Score the validation loader; ``raw=True`` returns unfiltered
        score curves (for cSEBB tuning) instead of median-filtered ones —
        and skips the event decode / weak-pred accumulation its callers
        would discard (the host-side decode sweep costs more than the
        forward at DESED validation size)."""
        scores_post = {}
        event_rows = []
        weak_preds_all, weak_labels_all = [], []
        # multi-host: batch inputs ride a process-LOCAL eval mesh
        # (shard_eval_put) — params/model_state must leave the global
        # training mesh too or jit rejects the device mix; once per round
        params, model_state = common.localize_eval_params(self.mesh, params, model_state)
        for batch in self.val_loader:
            mel = self.frontend.normalize(self.frontend(jnp.asarray(batch["wav"])))
            # multi-chip: evaluation rides the same data mesh as training
            mel, pad_mask = common.shard_eval_put(
                self.mesh, mel, jnp.asarray(batch["pad_mask"])
            )
            out = self._eval_apply(params, mel, pad_mask, kwargs_key, model_state=model_state)
            raw_scores, post = batched_decode_preds(
                out.strong,
                batch["filename"],
                self.codec,
                filter=None if raw else self.median_filter,
                weak_preds=out.weak,
                need_weak_mask=self.config["training"].get("weak_mask", False),
            )
            scores_post.update(raw_scores if raw else post)
            if raw:
                continue
            preds = decode_pred_batch(
                out.strong, out.weak, batch["filename"], self.codec, [0.5], self.median_filter
            )
            event_rows.extend(preds[0.5])
            if out.at_out is not None:
                weak_preds_all.append(np.asarray(out.at_out))
                weak_labels_all.append((np.asarray(batch["label"]).sum(-1) >= 1).astype(np.float32))
        # multi-host: each process evaluated its own strided item subset
        # on its local devices (process_shard_items loader + local eval
        # mesh in shard_eval_put); merge so PSDS sees the full validation
        # set (no-op at process_count == 1)
        from transformer4sed_tpu.parallel.multihost import gather_clip_scores, gather_objects

        if jax.process_count() > 1:
            scores_post = gather_clip_scores(scores_post)
            event_rows = [r for part in gather_objects(event_rows) for r in part]
            weak_preds_all = [a for part in gather_objects(weak_preds_all) for a in part]
            weak_labels_all = [a for part in gather_objects(weak_labels_all) for a in part]
        return scores_post, event_rows, weak_preds_all, weak_labels_all

    def validation(self, epoch: int) -> Dict[str, float]:
        results = OrderedDict()
        for tag, params, ms in (
            ("s", self.state.params, self.state.model_state),
            ("t", self.state.teacher_params, self.state.teacher_model_state),
        ):
            scores, rows, weak_p, weak_l = self._collect_scores(params, "val_kwargs", model_state=ms)
            psds1, _ = compute_psds_from_scores(
                scores, self.ground_truth, self.durations,
                dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0.0, alpha_st=1.0,
            )
            psds2, _ = compute_psds_from_scores(
                scores, self.ground_truth, self.durations,
                dtc_threshold=0.1, gtc_threshold=0.1, cttc_threshold=0.3,
                alpha_ct=0.5, alpha_st=1.0,
            )
            pred_events = {}
            for fname, label, onset, offset in rows:
                pred_events.setdefault(fname.rsplit(".", 1)[0], []).append((onset, offset, label))
            ef1 = event_based_f1(pred_events, self.ground_truth, self.codec.labels)
            results[f"psds1/{tag}"] = psds1
            results[f"psds2/{tag}"] = psds2
            results[f"event_f1/{tag}"] = ef1["macro_f1"]
            if weak_p:
                results[f"weak_f1/{tag}"] = weak_macro_f1(
                    np.concatenate(weak_p), np.concatenate(weak_l)
                )
        self.logger.scalars("validation", results, epoch + 1)
        self.logger.info(
            f"val epoch {epoch + 1}: " + " ".join(f"{k}={v:.4f}" for k, v in results.items())
        )
        return results

    def save_state(self, path: str):
        from transformer4sed_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, self.state)

    def restore_state(self, path: str):
        from transformer4sed_tpu.utils.checkpoint import restore_checkpoint

        self.state = restore_checkpoint(path, self.state)
        return int(self.state.step)

    def run(self, n_epochs: int, save_dir: str, seed: int = 0, start_epoch: int = 0) -> Dict[str, float]:
        best = BestModels(save_dir)
        key = jax.random.PRNGKey(seed)
        last_val: Dict[str, float] = {}
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            self.train_epoch(epoch, key)
            if (epoch + 1) % self.config["generals"].get("val_interval", 1) == 0:
                last_val = self.validation(epoch)
                best.update(
                    epoch,
                    last_val.get("psds1/s", 0.0),
                    self.state.params,
                    self.state.teacher_params,
                    student_model_state=self.state.model_state,
                    teacher_model_state=self.state.teacher_model_state,
                )
            self.logger.info(f"epoch {epoch + 1} took {(time.time() - t0) / 60:.2f} min")
            self.save_state(f"{save_dir}/last_state")
        best.flush()
        from transformer4sed_tpu.utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # land the final async last_state before returning
        return last_val

    def test(self, filter_type: str = "median", save_dir: Optional[str] = None) -> Dict[str, float]:
        """Test with median/max filtering or cSEBB post-processing.

        ``filter_type``: "median" / "max" (reference test stage) or
        "sebb" — change-point Sound Event Bounding Boxes on the *raw*
        scores (the post-processing behind the reference's best
        published PSDS1, ``docs/mat-sed/readme.md:44``); parameters from
        ``training.sebb`` in the config (step_filter_length /
        merge_threshold_abs / merge_threshold_rel).
        ``save_dir``: when set, dumps per-class PSDS as single_psds.json
        sorted ascending (reference base/passt_cnn/train.py:311-312) and
        the PSD-ROC plot.
        """
        use_sebb = filter_type == "sebb"
        ds = self.config["dataset"]
        # score the test split against ITS ground truth (falls back to the
        # val tables when no separate test split is configured — the
        # reference's usual DESED setup)
        test_tsv = ds.get("test_tsv") or ds["val_tsv"]
        # path identity, not string equality: an absolute or ./-spelled
        # test_tsv naming the same file as val_tsv is still the val split
        same_as_val = os.path.realpath(test_tsv) == os.path.realpath(ds["val_tsv"])
        test_gt = (
            self.ground_truth if same_as_val else common.load_ground_truth(test_tsv)
        )
        if same_as_val:
            test_dur = self.durations
        elif ds.get("test_dur"):
            test_dur = common.load_durations(ds["test_dur"])
        else:
            # a distinct test split MUST bring its own duration table —
            # silently pairing test scores with val durations would KeyError
            # deep inside the PSDS ROC on the first unknown clip id
            raise ValueError(
                "dataset.test_tsv names a split different from val_tsv but "
                "dataset.test_dur is not set; provide the duration table for "
                "the test split"
            )
        scores_post = {}
        tch_params, tch_state = common.localize_eval_params(
            self.mesh, self.state.teacher_params, self.state.teacher_model_state
        )
        for batch in self.test_loader:
            mel = self.frontend.normalize(self.frontend(jnp.asarray(batch["wav"])))
            mel, pm = common.shard_eval_put(self.mesh, mel, jnp.asarray(batch["pad_mask"]))
            out = self._eval_apply(
                tch_params, mel, pm, "test_kwargs", model_state=tch_state,
            )
            raw, post = batched_decode_preds(
                out.strong,
                batch["filename"],
                self.codec,
                # sebb runs on raw scores: filter=None skips the on-device
                # median filtering entirely
                filter=None if use_sebb else self.median_filter,
                filter_type="median" if use_sebb else filter_type,
                weak_preds=out.weak,
                need_weak_mask=self.config["training"].get("weak_mask", False),
            )
            scores_post.update(raw if use_sebb else post)
        if jax.process_count() > 1:
            # each process scored its strided test subset (local eval mesh);
            # merge before any tuning / PSDS so every process computes the
            # same result and makes the same file-write decisions
            from transformer4sed_tpu.parallel.multihost import gather_clip_scores

            scores_post = gather_clip_scores(scores_post)
        if use_sebb:
            from transformer4sed_tpu.eval.sebbs import CSEBBParams, apply_csebbs, tune_csebbs

            sebb_cfg = self.config["training"].get("sebb", {})
            if isinstance(sebb_cfg, str) and sebb_cfg != "auto":
                raise ValueError(
                    f"training.sebb must be 'auto' or a parameter mapping, got {sebb_cfg!r}"
                )
            if sebb_cfg == "auto":
                # per-class grid search against PSDS1 tuned on the
                # VALIDATION split (the set the reference tunes its median
                # windows and thresholds on), then applied to the test
                # scores — no tuning on the reported set. When test IS the
                # val split (the reference's usual DESED setup) the test
                # scores are reused directly instead of a second val pass.
                if same_as_val:
                    tune_scores = scores_post
                else:
                    tune_scores, *_ = self._collect_scores(
                        self.state.teacher_params, "test_kwargs",
                        model_state=self.state.teacher_model_state, raw=True,
                    )
                params, best = tune_csebbs(tune_scores, self.ground_truth, self.durations)
                self.logger.info(
                    f"sebb auto-tune on val (best val psds1 {best:.4f}): {params}"
                )
                scores_post = apply_csebbs(scores_post, params)
            else:
                scores_post = apply_csebbs(scores_post, CSEBBParams(**sebb_cfg))
        psds1, single1 = compute_psds_from_scores(
            scores_post, test_gt, test_dur,
            dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0.0, alpha_st=1.0,
        )
        psds2, _ = compute_psds_from_scores(
            scores_post, test_gt, test_dur,
            dtc_threshold=0.1, gtc_threshold=0.1, cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1.0,
        )
        results = {"psds1": psds1, "psds2": psds2}
        if save_dir and jax.process_index() == 0:  # single writer on pods
            import json

            os.makedirs(save_dir, exist_ok=True)
            ordered = dict(sorted(single1.items(), key=lambda kv: kv[1]))
            with open(os.path.join(save_dir, "single_psds.json"), "w") as f:
                json.dump(ordered, f, indent=2)
            try:
                from transformer4sed_tpu.eval.psds import compute_psd_roc
                from transformer4sed_tpu.utils.visualization import plot_psd_roc

                roc = compute_psd_roc(
                    scores_post, test_gt, test_dur,
                    0.7, 0.7, 0.3, 0.0, 1.0, 100.0,
                )
                plot_psd_roc(
                    roc.efpr_grid, roc.etpr, roc.value,
                    os.path.join(save_dir, "psd_roc_psds1.png"),
                )
            except Exception:  # plotting is best-effort
                pass
        self.logger.info(f"test ({filter_type}): {results}")
        return results


class MLMTrainer:
    """Masked-reconstruction pretraining driver (MAT-SED stage 1)."""

    def __init__(
        self, model, frontend, config, train_loader, val_loader, logger,
        init_params=None, init_model_state=None,
    ):
        self.model = model
        self.frontend = frontend
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.model_name = config.get("model_name", "PaSST_SED")
        if not getattr(model, "mlm", False):
            # fail here, not as an opaque NoneType error inside the jitted
            # loss when out.mlm_pred is missing
            raise ValueError(
                f"masked-reconstruction pretraining needs the model's MLM head: "
                f"set {self.model_name}.init_kwargs.mlm: true (+ mlm_dict) in the config"
            )

        if init_params is None or init_model_state is None:
            sample = next(iter(train_loader))
            mel = frontend.normalize(frontend(jnp.asarray(sample["wav"][:1])))
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)}, mel
            )
            if init_params is None:
                init_params = variables["params"]
            if init_model_state is None:
                init_model_state = {k: v for k, v in variables.items() if k != "params"}
        model_state = init_model_state or None
        self._aware = model_state is not None
        steps = len(train_loader)
        self.optimizer, _ = common.optimizer_from_config(init_params, config, steps)
        self.state = MLMState(
            params=init_params, opt_state=self.optimizer.init(init_params),
            step=jnp.zeros((), jnp.int32), model_state=model_state,
        )

        self.model_apply = model_apply = common.make_model_apply(model, self._aware)
        mlm_cfg = MLMConfig(
            transform_choice=tuple(
                config["training"].get("transform", {}).get("choice", (1, 0, 0, 0))
            ),
            model_kwargs=config.get(self.model_name, {}).get("train_kwargs", {}),
        )
        raw_step = make_mlm_step(
            model_apply, frontend, self.optimizer, mlm_cfg, model_state_aware=self._aware
        )
        # the ACTUAL global batch size: the MLM loader may use only a
        # prefix of training.batch_size (one entry per present source
        # folder), so size from the sampler, not the config sum
        local_batch = len(next(iter(train_loader.batch_sampler)))
        batch_size = local_batch * jax.process_count()
        if jax.device_count() > 1 and batch_size % jax.device_count() == 0:
            from transformer4sed_tpu.parallel import make_mesh, shard_train_step

            self.mesh = make_mesh()
            self._train_step = shard_train_step(raw_step, self.mesh, donate_state=True)
            self.logger.info(f"sharding batches over {jax.device_count()} devices")
        else:
            self.mesh = None
            self._train_step = jax.jit(raw_step, donate_argnums=0)

    def train_epoch(self, epoch: int, key) -> float:
        self.train_loader.set_epoch(epoch)
        total = 0.0
        n = len(self.train_loader)
        for i, batch in enumerate(self.train_loader):
            step_key = jax.random.fold_in(key, epoch * n + i)
            self.state, metrics = self._train_step(
                self.state, common.put_train_batch({"wav": batch["wav"]}, self.mesh), step_key
            )
            total += float(metrics["loss_mlm"]) / n
        self.logger.scalar("Train/loss_mlm", total, epoch + 1)
        return total

    def validation(self, key=None) -> float:
        """Mean reconstruction loss over the val loader (best-model metric)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        total, n = 0.0, 0
        # multi-host: each process scores its strided subset on LOCAL
        # devices — params must leave the global training mesh first
        ev_params, ev_state = common.localize_eval_params(
            self.mesh, self.state.params, self.state.model_state
        )
        for i, batch in enumerate(self.val_loader):
            mel = self.frontend.normalize(self.frontend(jnp.asarray(batch["wav"])))
            rngs = {"mlm": jax.random.fold_in(key, i)}
            if self._aware:
                out, _ = self.model_apply(
                    ev_params, mel, train=False, rngs=rngs, model_state=ev_state,
                )
            else:
                out = self.model_apply(ev_params, mel, train=False, rngs=rngs)
            total += float(
                mlm_loss(
                    out.mlm_pred,
                    out.frame_before_mask,
                    out.mask_id_seq.astype(jnp.float32),
                )
            )
            n += 1
        if jax.process_count() > 1:
            # each process scored its strided val subset; the best-model
            # decision must be identical everywhere
            from transformer4sed_tpu.parallel.multihost import gather_objects

            parts = gather_objects((total, n))
            total = sum(t for t, _ in parts)
            n = sum(c for _, c in parts)
        return total / max(n, 1)
