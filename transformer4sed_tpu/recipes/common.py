"""Recipe plumbing: CLI/config/dirs/seed, codec + dataset/loader setup,
ground-truth loading, optimizer construction from YAML.

Keeps the reference's public conventions (``recipes/desed/setting.py``):
CLI flags ``--config_dir --save_folder --random_seed``; YAML sections
``generals / training / feature / <ModelName> / dataset /
synth_dataset / opt``; model kwargs under ``<ModelName>.init_kwargs``
splatted into the constructor and ``train_stu_kwargs / val_kwargs /
test_kwargs`` splatted into forward.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.core import schedules
from transformer4sed_tpu.data import (
    ConcatBatchSampler,
    DataLoader,
    RandomSampler,
    SequentialSampler,
    StronglyLabeledDataset,
    UnlabeledDataset,
    WeaklyLabeledDataset,
)
from transformer4sed_tpu.train.optim import GroupSpec, ParamGroupConfig, build_optimizer
from transformer4sed_tpu.utils.config import (
    get_save_directories,
    load_yaml_with_include,
    resolve_meta_path,
)
from transformer4sed_tpu.utils.logging import Logger


_FORWARD_KWARG_KEYS = (
    "init_kwargs",
    "train_stu_kwargs",
    "train_tch_kwargs",
    "train_kwargs",
    "val_kwargs",
    "test_kwargs",
)


def sibling_model_state(ckpt_path: str) -> Optional[Dict]:
    """BatchNorm running stats saved next to an orbax params checkpoint.

    Training stages write ``best_model_state`` (and, for mean-teacher,
    ``best_model_state_teacher``) beside ``best_student``/``best_teacher``
    — required for HTSAT-family checkpoints. Teacher params pair with
    the teacher's OWN stats: the trees diverge by design (the reference
    ``update_ema`` iterates parameters only, so buffers evolve from the
    teacher's train-mode forwards). Returns None when no sibling exists
    (stat-less models).
    """
    from transformer4sed_tpu.utils.checkpoint import restore_params

    base = os.path.dirname(os.path.abspath(ckpt_path))
    names = ["best_model_state"]
    if "teacher" in os.path.basename(ckpt_path):
        names.insert(0, "best_model_state_teacher")
    for name in names:
        ms_dir = os.path.join(base, name)
        if os.path.isdir(ms_dir):
            return restore_params(ms_dir)
    return None


def model_init_kwargs(config: Dict, name: Optional[str] = None) -> Dict:
    """FLAT constructor kwargs from the ``<ModelName>`` config section.

    Accepts every reference layout and normalises to the flax
    constructors' flat fields, so ALL consumers (build_model, the torch
    checkpoint converters, serving) see the same keys:

    * nested ``{init_kwargs: {...}, val_kwargs: {...}}`` (finetune/DASM
      configs, splatted at e.g. reference ``main.py:95``) and the flat
      style where kwargs sit directly under the model name
      (``config/mat-sed/base/pretrain.yaml:41``);
    * PaSST_CNN's ``{passt_sed_param, cnn_param}`` nesting (reference
      ``passt_cnn.py:11`` — ``cnn_name`` rides inside ``cnn_param``);
    * ``lora_config {r, lora_alpha, requires_grad_pretrain}``
      (``passt_lora.py:106-181``) -> ``lora_rank``/``lora_alpha``; the
      requires_grad flag is an optimizer concern, read by
      :func:`optimizer_from_config`.
    """
    kwargs = _normalized_model_section(config, name)
    lora_config = kwargs.pop("lora_config", None)
    if lora_config:
        kwargs.setdefault("lora_rank", lora_config.get("r", 0))
        kwargs.setdefault("lora_alpha", lora_config.get("lora_alpha", 1.0))
    return kwargs


def _normalized_model_section(config: Dict, name: Optional[str] = None) -> Dict:
    """The ``<ModelName>`` section flattened across every reference
    layout (init_kwargs nesting, passt_sed_param/cnn_param nesting) —
    the single place that knows the nesting conventions, shared by
    :func:`model_init_kwargs` and :func:`lora_ckpt_merged` so a new
    layout added here is seen by every consumer. ``lora_config`` is
    left in place for the caller to interpret."""
    section = dict(config.get(name or config.get("model_name", "PaSST_SED"), {}))
    if "init_kwargs" in section:
        kwargs = dict(section["init_kwargs"])
    else:
        kwargs = {k: v for k, v in section.items() if k not in _FORWARD_KWARG_KEYS}
    if "passt_sed_param" in kwargs:
        sed_param = dict(kwargs.pop("passt_sed_param"))
        cnn_param = kwargs.pop("cnn_param", None)
        kwargs = {**sed_param, **kwargs}
        if cnn_param is not None:
            cnn_param = dict(cnn_param)
            kwargs["cnn_name"] = cnn_param.pop("cnn_name", "base")
            kwargs["cnn_param"] = cnn_param
    return kwargs


def lora_ckpt_merged(config: Dict, cli_choice: Optional[str] = None) -> bool:
    """Explicit LoRA checkpoint merged-ness policy for ``.pt`` imports.

    loralib state dicts do not record whether the kernel carries the
    merged (alpha/r)·A@B delta, so the importer needs a stated policy
    (``torch_import._dense``). Resolution order:

    1. CLI ``--lora_ckpt merged|unmerged`` (wins if given);
    2. config ``<model>.lora_config.merged_checkpoint`` (bool);
    3. default ``True`` — the reference's published-artifact convention
       (``pmam/main.py:202-205`` evals, i.e. merges, before saving).

    Use ``unmerged`` for the reference's mid-training BestModels saves
    (``src/utils/log.py:47-89`` deep-copies a train()-mode state_dict).
    """
    if cli_choice:
        if cli_choice not in ("merged", "unmerged"):
            raise ValueError(f"--lora_ckpt must be merged|unmerged, got {cli_choice!r}")
        return cli_choice == "merged"
    lora_config = _normalized_model_section(config).get("lora_config") or {}
    return bool(lora_config.get("merged_checkpoint", True))


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="transformer4sed_tpu recipe runner")
    parser.add_argument("--config_dir", type=str, required=True, help="YAML config path")
    parser.add_argument("--save_folder", type=str, required=True)
    parser.add_argument("--random_seed", type=int, default=42)
    parser.add_argument("--test_only", action="store_true")
    parser.add_argument("--resume_ckpt", type=str, default=None)
    parser.add_argument("--pretrained_ckpt", type=str, default=None)
    parser.add_argument(
        "--lora_ckpt", choices=("merged", "unmerged"), default=None,
        help="merged-ness of a LoRA .pt checkpoint (loralib dicts can't "
        "self-describe): 'merged' = published artifacts (default), "
        "'unmerged' = mid-training BestModels saves",
    )
    # PMAM stage plumbing (reference pmam/main.py:49 --gmm_means_path):
    # point pmam_train at a tokenizer run in a different save_folder
    parser.add_argument("--gmm_means_path", type=str, default=None)
    parser.add_argument("--pseudo_label_dir", type=str, default=None)
    return parser


def prepare_run(args) -> Tuple[Dict, Dict, Logger]:
    """Load config, create save dirs + logger, seed python/numpy.

    Multi-host: initialises ``jax.distributed`` when requested (env /
    coordinator address — no-op otherwise) and gives non-primary
    processes a stream-only WARNING logger so log.txt / TensorBoard
    have exactly one writer."""
    from transformer4sed_tpu.parallel.multihost import is_primary, maybe_initialize

    maybe_initialize()
    config = load_yaml_with_include(args.config_dir)
    config.setdefault("generals", {})["save_folder"] = args.save_folder
    paths = get_save_directories(config, args.save_folder)
    if is_primary():
        logger = Logger(
            log_path=paths["log"],
            tensorboard_dir=paths["tensorboard"],
        )
    else:
        import logging as _logging

        logger = Logger(log_path=None, tensorboard_dir=None, level=_logging.WARNING)
    random.seed(args.random_seed)
    np.random.seed(args.random_seed)
    cache_dir = config["generals"].get("compilation_cache")
    if cache_dir:
        # persistent XLA compilation cache: restarted stages (elastic
        # recovery, train.sh chaining) skip the multi-minute compiles
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info(f"XLA compilation cache at {cache_dir}")
    return config, paths, logger


def codec_from_config(config: Dict, labels: Optional[List[str]] = None) -> LabelCodec:
    feat = config["feature"]
    labels = labels if labels is not None else config["dataset"]["labels"]
    return LabelCodec(
        labels=tuple(labels),
        audio_len=feat.get("audio_max_len", 10.0),
        frame_len=feat.get("n_window", feat.get("n_fft", 1024)),
        frame_hop=feat.get("hop_length", feat.get("hopsize")),
        net_pooling=feat.get("net_pooling", feat.get("net_subsample", 1)),
        sr=feat.get("sample_rate", feat.get("sr")),
    )


def desed_dataset_setting(config: Dict, codec: LabelCodec, seed: int = 42):
    """Build the 4-source DESED training loader ([strong, synth, weak,
    unlabeled] composition) + val/test loaders, mirroring
    ``recipes/desed/setting.py:150-251``."""
    import pandas as pd

    ds_cfg = config["dataset"]
    synth_cfg = config.get("synth_dataset", {})
    batch_sizes = config["training"]["batch_size"]  # [strong, synth, weak, unlabeled]

    strong = StronglyLabeledDataset(
        pd.read_csv(ds_cfg["strong_tsv"], sep="\t"), ds_cfg["strong_folder"], False, codec
    )
    synth = StronglyLabeledDataset(
        pd.read_csv(synth_cfg["synth_train_tsv"], sep="\t"), synth_cfg["synth_train_folder"], False, codec
    )
    weak = WeaklyLabeledDataset(
        pd.read_csv(ds_cfg["weak_tsv"], sep="\t"), ds_cfg["weak_folder"], False, codec
    )
    unlabeled = UnlabeledDataset(ds_cfg["unlabeled_folder"], False, codec)

    sampler = ConcatBatchSampler(
        [
            RandomSampler(len(strong), seed),
            RandomSampler(len(synth), seed + 1),
            RandomSampler(len(weak), seed + 2),
            RandomSampler(len(unlabeled), seed + 3),
        ],
        batch_sizes=batch_sizes,
    )
    num_workers = config["generals"].get("num_workers", 4)
    train_loader = DataLoader(
        [strong, synth, weak, unlabeled], batch_sampler=sampler,
        num_workers=num_workers, process_shard=True,
    )

    val = StronglyLabeledDataset(
        pd.read_csv(ds_cfg["val_tsv"], sep="\t"), ds_cfg["val_folder"], True, codec
    )
    val_loader = DataLoader(
        val, batch_size=config["training"].get("batch_size_val", 24), num_workers=num_workers,
        drop_last=False, process_shard_items=True,
    )
    test_loader = val_loader
    if ds_cfg.get("test_tsv"):
        test = StronglyLabeledDataset(
            pd.read_csv(ds_cfg["test_tsv"], sep="\t"), ds_cfg["test_folder"], True, codec
        )
        test_loader = DataLoader(
            test, batch_size=config["training"].get("batch_size_val", 24),
            num_workers=num_workers, drop_last=False, process_shard_items=True,
        )
    return train_loader, val_loader, test_loader


def load_ground_truth(tsv_path: str) -> Dict[str, List[Tuple[float, float, str]]]:
    """Events TSV -> {clip_id: [(onset, offset, label)]}."""
    import pandas as pd

    df = pd.read_csv(tsv_path, sep="\t")
    out: Dict[str, List] = {}
    for _, row in df.iterrows():
        clip = os.path.splitext(str(row["filename"]))[0]
        out.setdefault(clip, [])
        if not pd.isna(row.get("event_label")):
            out[clip].append((float(row["onset"]), float(row["offset"]), str(row["event_label"])))
    return out


def load_durations(tsv_path: str) -> Dict[str, float]:
    import pandas as pd

    df = pd.read_csv(tsv_path, sep="\t")
    return {
        os.path.splitext(str(row["filename"]))[0]: float(row["duration"]) for _, row in df.iterrows()
    }


def make_model_apply(model, model_state_aware: bool):
    """The shared model_apply contract.

    ``model_state_aware=True``: ``(params, mel, train, rngs, model_state,
    **kw) -> (out, new_model_state-or-None)`` with BatchNorm collections
    mutable in train mode. ``False``: plain ``(params, mel, train, rngs,
    **kw) -> out``."""
    if model_state_aware:

        def model_apply(params, mel, train=False, rngs=None, model_state=None, **kw):
            variables = {"params": params, **(model_state or {})}
            if train and model_state:
                return model.apply(
                    variables, mel, train=True, rngs=rngs, mutable=list(model_state), **kw
                )
            return model.apply(variables, mel, train=train, rngs=rngs, **kw), None

    else:

        def model_apply(params, mel, train=False, rngs=None, **kw):
            return model.apply({"params": params}, mel, train=train, rngs=rngs, **kw)

    return model_apply


def put_train_batch(batch, mesh):
    """Host train batch -> device tree for the (possibly sharded) step.

    With a mesh: ``parallel.put_batch`` — sharded ``P('data')`` device
    put single-process, ``jax.make_array_from_process_local_data``
    global-batch assembly from each process's local loader chunk on
    pods (the train step's static strong/weak/unlabeled masks index the
    GLOBAL batch, so the step itself never changes). Without a mesh:
    plain device arrays."""
    if mesh is not None:
        from transformer4sed_tpu.parallel import put_batch

        return put_batch(batch, mesh)
    import jax as _jax
    import jax.numpy as _jnp

    return _jax.tree_util.tree_map(_jnp.asarray, batch)


def shard_eval_put(mesh, *arrays):
    """Device-put eval arrays with the data sharding when the batch
    divides the mesh (multi-chip hosts evaluate SPMD like training);
    ragged tail batches stay unsharded — jit compiles one variant per
    input sharding, so both shapes coexist.

    Multi-host: eval rides a process-LOCAL data mesh instead of the
    global training mesh — each process scores its own strided item
    subset (``process_shard_items=True`` loaders) and outputs stay
    fully addressable for the host-side decode; a global-mesh eval
    would make ``np.asarray(out.strong)`` raise on non-addressable
    shards."""
    if mesh is None:
        return arrays
    import jax as _jax

    if _jax.process_count() > 1:
        from transformer4sed_tpu.parallel.multihost import local_eval_mesh

        mesh = local_eval_mesh(mesh)

    # batch_sharding partitions over the 'data' axis only — gate on that
    # axis size, not the total device count (a ('data', 'model') mesh
    # with model > 1 would otherwise never shard eval)
    n = int(mesh.shape.get("data", np.prod(mesh.devices.shape)))
    if any(a.shape[0] % n for a in arrays):
        return arrays
    from transformer4sed_tpu.parallel import batch_sharding

    sh = batch_sharding(mesh)
    return tuple(_jax.device_put(a, sh) for a in arrays)


def localize_eval_params(mesh, *trees):
    """Re-place replicated params/model_state onto the process-LOCAL
    eval mesh for multi-host localized evaluation.

    ``shard_eval_put`` moves eval batch inputs onto a process-local data
    mesh at ``process_count() > 1`` — but the jitted eval fn also
    receives params / model_state still committed to the GLOBAL training
    mesh, which jit rejects ("Received incompatible devices for jitted
    computation"). Params are fully replicated under the data-parallel
    training sharding, so every shard is process-addressable and a host
    round-trip onto the local mesh is exact. Call ONCE per eval round
    (before the batch loop): the transfer is one host copy of the
    (replicated) trees, not one per batch. No-op single-process,
    without a mesh, or for ``None`` trees.
    """
    import jax as _jax

    if mesh is None or _jax.process_count() == 1:
        return trees[0] if len(trees) == 1 else trees
    from jax.sharding import NamedSharding, PartitionSpec as P

    from transformer4sed_tpu.parallel.multihost import local_eval_mesh

    sh = NamedSharding(local_eval_mesh(mesh), P())

    def _place(tree):
        if not tree:
            return tree
        return _jax.tree_util.tree_map(
            lambda x: _jax.device_put(np.asarray(_jax.device_get(x)), sh), tree
        )

    out = tuple(_place(t) for t in trees)
    return out[0] if len(out) == 1 else out


def resolve_resume(args, paths, logger) -> Optional[str]:
    """Elastic recovery: map ``--resume_ckpt auto`` to the newest intact
    per-epoch checkpoint (``last_state``, else the pre-overwrite backup
    ``last_state.prev``); pass explicit paths through."""
    resume = getattr(args, "resume_ckpt", None)
    if resume != "auto":
        return resume
    for name in ("last_state", "last_state.prev"):
        candidate = f"{paths['best_paths']}/{name}"
        if os.path.isdir(candidate):
            return candidate
    logger.info("auto-resume: no last_state found, starting fresh")
    return None


def optimizer_from_config(params, config: Dict, steps_per_epoch: int):
    """AdamW param groups + ExponentialDown schedule from the YAML ``opt`` +
    ``training.scheduler`` sections (``recipes/desed/setting.py:254-278``).

    Accepts both the DESED naming (encoder/decoder/head) and the
    AudioSet recipes' naming (backbone/cnn/sed_decoder/at_decoder/head,
    ``set_lr.py`` / ``lr_set.py``); cnn/at_decoder become their own
    groups when present."""
    lr_dict = config["opt"]["param_groups"]
    enc = lr_dict.get("encoder") or lr_dict.get("backbone")
    dec = lr_dict.get("decoder") or lr_dict.get("sed_decoder")
    if enc is None or dec is None or "head" not in lr_dict:
        raise KeyError(
            "opt.param_groups needs encoder|backbone, decoder|sed_decoder and head"
        )

    def spec(d):
        return GroupSpec(lr=d["lr"], weight_decay=d.get("weight_decay", 1e-8))

    pg = ParamGroupConfig(
        encoder=GroupSpec(
            lr=enc["lr"],
            weight_decay=enc.get("weight_decay", 1e-8),
            step_lr=enc.get("step_lr", 0) or 0,
            freeze_layer=enc.get("freeze_layer", 0) or 0,
        ),
        decoder=spec(dec),
        head=spec(lr_dict["head"]),
        cnn=spec(lr_dict["cnn"]) if lr_dict.get("cnn") else None,
        at_decoder=spec(lr_dict["at_decoder"]) if lr_dict.get("at_decoder") else None,
        query=spec(lr_dict["query"]) if lr_dict.get("query") else None,
        backbone_depth=config.get("backbone_depth", 12),
        clip_grad=20.0 if config["training"].get("clip_grad") else 0.0,
        lora_trainable=bool(config["opt"].get("lora_trainable", False)),
    )
    sch = config["training"]["scheduler"]
    # gradient accumulation: training.accum_steps > 1 averages gradients
    # over k loader batches per optimizer step (optax.MultiSteps). The
    # LR schedule and the train-step ramps/EMA count APPLIED optimizer
    # steps (train.optim.update_applied gates them), so the schedule
    # horizon shrinks by k. A pod lever (simulate larger global batches,
    # hide the DCN all-reduce under k local steps) — docs/SCALING.md.
    accum = int(config["training"].get("accum_steps", 1) or 1)
    opt_steps_per_epoch = max(1, steps_per_epoch // accum)
    schedule = schedules.exponential_down(
        start_iter=sch["n_epochs_cut"] * opt_steps_per_epoch,
        total_iter=sch["n_epochs"] * opt_steps_per_epoch,
        exponent=sch.get("exponent", -0.5),
        warmup_iter=sch.get("lr_warmup_epochs", 0) * opt_steps_per_epoch,
        warmup_rate=sch.get("lr_warmup_rate", 0.1),
    )
    tx, labels = build_optimizer(params, pg, schedule=schedule)
    if accum > 1:
        import optax as _optax

        tx = _optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, labels


def median_filter_from_config(config: Dict, codec: LabelCodec) -> List[int]:
    """Per-class median widths scaled to the prediction length
    (``finetune/train.py:221-227``)."""
    pred_len = config["feature"].get("pred_len", codec.n_frames)
    windows = config["training"]["median_window"]
    if isinstance(windows, int):
        windows = [windows] * codec.n_classes
    return [int(w / 156 * pred_len) for w in windows]
