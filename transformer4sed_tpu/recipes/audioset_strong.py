"""AudioSet-strong recipe: supervised SED training at scale.

Parity targets: ``recipes/audioset_strong/setting.py`` (weighted
sampler with 100k draws/epoch, 447-class label dictionary, configurable
class loss) and ``recipes/audioset_strong/base/passt_cnn/train.py``
(supervised strong-BCE/ASL trainer, drop-val-absent-classes PSDS with
alpha=0, common/rare reporting via a type map).

TPU orientation: this is the scale-out recipe — the train step built
here is the one meant to be wrapped by
``parallel.shard_train_step`` over a pod-slice data mesh.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer4sed_tpu.train.optim import step_increment

from transformer4sed_tpu.core import losses as L
from transformer4sed_tpu.frontend import augment
from transformer4sed_tpu.recipes import common
from transformer4sed_tpu.train.mean_teacher import pool_strong_labels


def get_weighted_sampler(weight_tsv: str, num_samples: int = 100_000, seed: int = 0):
    """Per-clip sampling weights from weight.tsv (column 'weight')."""
    import pandas as pd

    from transformer4sed_tpu.data.sampler import WeightedSampler

    df = pd.read_csv(weight_tsv, sep="\t")
    return WeightedSampler(df["weight"].to_numpy(), num_samples=num_samples, seed=seed)


def load_label_dict(path: str) -> Tuple[str, ...]:
    """Ordered class list from a {label: index} json (labeldict_audioset_strong)."""
    with open(path) as f:
        mapping = json.load(f)
    return tuple(sorted(mapping, key=mapping.get))


def load_type_map(state_json: str) -> Dict[str, str]:
    """class -> 'common'/'rare' map from the recipe's state.json."""
    with open(state_json) as f:
        return json.load(f)


def audioset_dataset_setting(config: Dict, codec, seed: int = 0):
    """Train/val loaders for AudioSet-strong (reference
    ``recipes/audioset_strong/setting.py:55-269``): strongly-labeled train
    set drawn via the weighted sampler (100k clips/epoch) when
    ``dataset.weight_tsv`` is configured, plus a named val set."""
    import pandas as pd

    from transformer4sed_tpu.data import DataLoader, StronglyLabeledDataset
    from transformer4sed_tpu.data.sampler import RandomSampler

    ds = config["dataset"]
    tr = config["training"]
    workers = config.get("generals", {}).get("num_workers", 4)
    batch = tr["batch_size"]
    batch = sum(batch) if isinstance(batch, (list, tuple)) else batch

    train = StronglyLabeledDataset(
        pd.read_csv(ds["train_tsv"], sep="\t"), ds["train_folder"], False, codec
    )
    if ds.get("weight_tsv"):
        from transformer4sed_tpu.recipes.common import resolve_meta_path

        sampler = get_weighted_sampler(
            resolve_meta_path(ds["weight_tsv"]),
            num_samples=tr.get("num_samples", tr.get("samples_per_epoch", 100_000)),
            seed=seed,
        )
    else:
        sampler = RandomSampler(len(train), seed)
    train_loader = DataLoader(train, sampler=sampler, batch_size=batch,
                              num_workers=workers, process_shard=True)

    val = StronglyLabeledDataset(
        pd.read_csv(ds["val_tsv"], sep="\t"), ds["val_folder"], True, codec
    )
    val_loader = DataLoader(
        val, batch_size=tr.get("batch_size_val", batch),
        drop_last=False, num_workers=workers, process_shard_items=True,
    )
    return train_loader, val_loader


@dataclass(frozen=True)
class SupervisedConfig:
    loss_name: str = "BCELoss"
    loss_kwargs: Optional[dict] = None
    net_pooling: float = 1.0
    max_shift_frame: int = 64000  # 2 * sr (reference uses wav-scale shifts on mel)
    mixup_prob: float = 0.5
    mixup_alpha: float = 10.0
    mixup_beta: float = 0.5
    transform_choice: Tuple[int, int, int, int] = (1, 0, 0, 0)
    filter_db_range: Tuple[float, float] = (-0.5, 0.5)
    filter_bands: Tuple[int, int] = (3, 6)
    filter_minimum_bandwidth: int = 6
    filter_type: str = "step"
    model_kwargs: Dict[str, Any] = field(default_factory=dict)


def make_supervised_preprocess(frontend, cfg: SupervisedConfig):
    """Frontend + aug chain of the supervised step, exposed for the
    segment profilers (`exps/profile_audioset_segments.py`) so they time
    the exact production ops. Returns ``(mel, labels)`` with mel in the
    model's native layout."""

    def preprocess(batch, key):
        kmel, kshift, kmix, kmixp, ktrans = jax.random.split(key, 5)
        mel = frontend(batch["wav"], key=kmel, training=True)
        mel = frontend.normalize(mel)
        # HTSAT-style frontends emit [B, 1, T, F]; the augmentation
        # library works in the [B, F, T] layout (same adaptor as the
        # CLAP step, recipes/clap.py:52-75)
        is_4d = mel.ndim == 4
        if is_4d:
            mel = mel[:, 0].transpose(0, 2, 1)
        labels = batch["labels"]
        # may be fractional: HTSAT label grids are finer than the mel grid
        net_pooling = mel.shape[-1] / labels.shape[-1]
        mel, labels = augment.frame_shift(
            kshift, mel, labels,
            net_pooling=net_pooling,
            max_shift_frame=min(cfg.max_shift_frame, mel.shape[-1] // 2),
        )
        c = jax.random.beta(jax.random.fold_in(kmix, 0), cfg.mixup_alpha, cfg.mixup_beta)
        do_mix = jax.random.uniform(kmixp) < cfg.mixup_prob
        perm = jax.random.permutation(jax.random.fold_in(kmix, 1), mel.shape[0])
        mel = jnp.where(do_mix, c * mel + (1 - c) * mel[perm], mel)
        labels = jnp.where(do_mix, jnp.clip(c * labels + (1 - c) * labels[perm], 0, 1), labels)
        mel = augment.feature_transformation(
            ktrans, mel, 1, cfg.transform_choice,
            filter_db_range=cfg.filter_db_range, filter_bands=cfg.filter_bands,
            filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
            filter_type=cfg.filter_type, norm_std=5.0,
        )
        if is_4d:
            mel = mel.transpose(0, 2, 1)[:, None]
        return mel, labels

    return preprocess


def make_supervised_loss_fn(model_apply: Callable, frontend, cfg: SupervisedConfig):
    """Loss of the supervised step (preprocess + forward), module-level
    for the segment profilers."""
    loss_fn_cls = L.loss_function_factory(cfg.loss_name, cfg.loss_kwargs)
    preprocess = make_supervised_preprocess(frontend, cfg)

    def loss_fn(params, model_state, batch, key):
        kpre, kfwd = jax.random.split(key)
        mel, labels = preprocess(batch, kpre)
        rngs = {k: jax.random.fold_in(kfwd, i) for i, k in enumerate(("patchout", "dropout", "mlm"))}
        out, new_ms = model_apply(
            params, mel, train=True, rngs=rngs, model_state=model_state, **cfg.model_kwargs
        )
        loss_strong = loss_fn_cls(out.strong, labels)
        return loss_strong, ({"loss_class_strong": loss_strong}, new_ms)

    return loss_fn


def make_supervised_step(model_apply: Callable, frontend, optimizer, cfg: SupervisedConfig):
    """Supervised strong-label step (PaSST_CNN / HTSAT_CNN on AudioSet-strong).

    ``model_apply(params, mel, train, rngs, model_state, **kw)`` must
    return ``(SEDOutput, updated_model_state-or-None)`` — model_state
    carries BatchNorm running stats for HTSAT-style backbones.
    """
    loss_fn = make_supervised_loss_fn(model_apply, frontend, cfg)

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


def drop_absent_classes(
    single_class_psds: Dict[str, float], ground_truth, classes: Sequence[str]
) -> Dict[str, float]:
    """Remove classes with no validation ground truth before aggregation
    (reference ``base/passt_cnn/train.py:169-175``)."""
    present = set()
    for events in ground_truth.values():
        for _, _, label in events:
            present.add(label)
    return {c: v for c, v in single_class_psds.items() if c in present}


class SupervisedTrainer:
    """Epoch driver for supervised AudioSet-strong training
    (PaSST_CNN / HTSAT_CNN / DASM closed-set).

    Validation computes PSDS with alpha_st=0 over val-present classes and
    reports common/rare means when a type map is provided
    (reference ``base/passt_cnn/train.py:140-320``).
    """

    def __init__(
        self,
        model,
        frontend,
        config: Dict,
        codec,
        train_loader,
        val_loader,
        logger,
        init_params=None,
        init_model_state=None,
        type_map: Optional[Dict[str, str]] = None,
    ):
        import flax.struct

        from transformer4sed_tpu.train.mlm import MLMState

        self.model = model
        self.frontend = frontend
        self.config = config
        self.codec = codec
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.type_map = type_map
        self.model_name = config.get("model_name", "PaSST_CNN")

        # BatchNorm backbones (HTSAT bn0) carry running stats that must
        # ride along in the train state. The CLI passes both trees from
        # its single model.init (init_model_state may be {} = "inited,
        # no extra collections"); only derive by a sample init when the
        # caller supplied neither.
        if init_params is None or init_model_state is None:
            sample = next(iter(train_loader))
            mel = frontend.normalize(frontend(jnp.asarray(sample["wav"][:1])))
            variables = model.init({"params": jax.random.PRNGKey(0)}, mel)
            if init_params is None:
                init_params = variables["params"]
            if init_model_state is None:
                init_model_state = {k: v for k, v in variables.items() if k != "params"}
        model_state = init_model_state or None
        steps = len(train_loader)
        self.optimizer, _ = common.optimizer_from_config(init_params, config, steps)
        self.state = MLMState(
            params=init_params,
            opt_state=self.optimizer.init(init_params),
            step=jnp.zeros((), jnp.int32),
            model_state=model_state,
        )

        # the supervised step always uses the (out, new_model_state) contract
        self.model_apply = model_apply = common.make_model_apply(model, True)
        # state donated: old buffers are dead after `self.state = step(...)`.
        # On multi-chip hosts, shard the batch over a 1-D data mesh like
        # the MAT-SED trainer (XLA emits the gradient all-reduce over ICI)
        raw_step = self._build_train_step()
        batch_size = config["training"].get("batch_size", 0)
        if not isinstance(batch_size, int):
            batch_size = sum(batch_size)
        if jax.device_count() > 1 and batch_size and batch_size % jax.device_count() == 0:
            from transformer4sed_tpu.parallel import make_mesh, shard_train_step

            self.mesh = make_mesh()
            self._train_step = shard_train_step(raw_step, self.mesh, donate_state=True)
            logger.info(f"sharding batches over {jax.device_count()} devices")
        else:
            self.mesh = None
            self._train_step = jax.jit(raw_step, donate_argnums=0)
        self._eval_fn = jax.jit(
            lambda p, ms, m, pm: model_apply(
                p, m, train=False, pad_mask=pm, model_state=ms,
                **config.get(self.model_name, {}).get("val_kwargs", {}),
            )[0]
        )

    def _build_train_step(self):
        """Construct the jittable (state, batch, key) -> (state, metrics) step.
        Subclasses (DASM closed-set / open-vocab) override this."""
        tr = self.config["training"]
        cls_loss = self.config.get("class_loss", {})
        cfg = SupervisedConfig(
            loss_name=cls_loss.get("loss_name", "BCELoss"),
            loss_kwargs=cls_loss.get("kwargs"),
            transform_choice=tuple(tr.get("transform", {}).get("choice", (1, 0, 0, 0))),
            model_kwargs=self.config.get(self.model_name, {}).get("train_kwargs", {}),
        )
        return make_supervised_step(self.model_apply, self.frontend, self.optimizer, cfg)

    def save_state(self, path: str):
        """Full train state (params + opt + step + BatchNorm stats) for
        elastic recovery; async disk write."""
        from transformer4sed_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, self.state)

    def restore_state(self, path: str) -> int:
        from transformer4sed_tpu.utils.checkpoint import restore_checkpoint

        self.state = restore_checkpoint(path, self.state)
        return int(self.state.step)

    def train_epoch(self, epoch: int, key) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        acc: Dict[str, float] = {}
        n = len(self.train_loader)
        for i, batch in enumerate(self.train_loader):
            k = jax.random.fold_in(key, epoch * n + i)
            self.state, metrics = self._train_step(
                self.state,
                common.put_train_batch({"wav": batch["wav"], "labels": batch["label"]}, self.mesh),
                k,
            )
            for kk, v in metrics.items():
                acc[kk] = acc.get(kk, 0.0) + float(v) / n
        self.logger.scalars("Train", acc, epoch + 1)
        return acc

    def validation(self, epoch: int, ground_truth, durations, median_filter=7) -> Dict[str, float]:
        from transformer4sed_tpu.eval.decode import batched_decode_preds
        from transformer4sed_tpu.eval.psds import compute_psds_from_scores
        from transformer4sed_tpu.recipes.dasm_recipe import split_psds_by_type

        scores = {}
        # multi-host: params must join the batch on the local eval mesh
        ev_params, ev_state = common.localize_eval_params(
            self.mesh, self.state.params, self.state.model_state
        )
        for batch in self.val_loader:
            mel = self.frontend.normalize(self.frontend(jnp.asarray(batch["wav"])))
            # multi-chip: evaluation rides the same data mesh as training
            mel, pm = common.shard_eval_put(
                self.mesh, mel, jnp.asarray(batch["pad_mask"])
            )
            out = self._eval_fn(ev_params, ev_state, mel, pm)
            _, post = batched_decode_preds(
                out.strong, batch["filename"], self.codec, filter=median_filter
            )
            scores.update(post)
        if jax.process_count() > 1:
            # each process scored its strided val subset (local eval mesh)
            from transformer4sed_tpu.parallel.multihost import gather_clip_scores

            scores = gather_clip_scores(scores)
        psds, single = compute_psds_from_scores(
            scores, ground_truth, durations,
            dtc_threshold=0.7, gtc_threshold=0.7, alpha_ct=0.0, alpha_st=0.0,
        )
        single = drop_absent_classes(single, ground_truth, self.codec.labels)
        results = {"psds": psds}
        if self.type_map:
            results.update(split_psds_by_type(single, self.type_map))
        self.logger.scalars("validation", results, epoch + 1)
        return results
