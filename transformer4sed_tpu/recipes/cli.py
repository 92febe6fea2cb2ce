"""Recipe CLI: ``python -m transformer4sed_tpu.recipes.cli <stage> ...``.

Stage layout mirrors the reference's per-recipe mains + train.sh
chaining (``exps/mat-sed/base/train.sh``):

  matsed_pretrain  — masked-reconstruction MLM (stage 1)
  matsed_finetune  — mean-teacher semi-supervised fine-tune (stages 2-3;
                     finetune2 differs only by config: encoder_win)
  matsed_test      — test with median/max filter
  pmam_extract / pmam_gmm / pmam_pseudo_labels — PMAM loop stages
  audioset_supervised — supervised AudioSet-strong (PaSST_CNN/HTSAT_CNN)
  dasm_train       — closed-set DASM (strong BCE + AT-branch loss)
  dasm_ov          — open-vocabulary DASM (common-only training,
                     common-first eval; needs dataset.state_json)
  clap_train       — common-only CLAP-SED (needs dataset.query_bank)
  openset_eval     — zero-shot extended-vocabulary evaluation
                     (dataset.openset_{label,embedding,tsv,dur,folder})

Stage hand-off uses ``--pretrained_ckpt`` (orbax param tree) with the
reference's strict=False key-drop conventions.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def build_model(config):
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.dasm import DASM
    from transformer4sed_tpu.models.htsat import HTSATFrontend
    from transformer4sed_tpu.models.htsat_heads import CLAP_SED, DASM_HTSAT, HTSAT_CNN
    from transformer4sed_tpu.models.passt_cnn import PaSST_CNN, PasstComplexCNN
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    from transformer4sed_tpu.recipes.common import model_init_kwargs

    name = config.get("model_name", "PaSST_SED")
    kwargs = model_init_kwargs(config, name)
    model_cls = {
        "PaSST_SED": PaSST_SED,
        "PaSST_CNN": PaSST_CNN,
        "PasstComplexCNN": PasstComplexCNN,
        "DASM": DASM,
        "HTSAT_CNN": HTSAT_CNN,
        "CLAP_SED": CLAP_SED,
        "DASM_HTSAT": DASM_HTSAT,
    }[name]
    # model_init_kwargs already normalised the reference layouts
    # (passt_sed_param/cnn_param nesting, lora_config) to flat fields.
    # tuple-ify yaml lists that flax attributes expect hashable
    for key in ("mlm_dict",):
        if isinstance(kwargs.get(key), dict):
            kwargs[key] = dict(kwargs[key])
    model = model_cls(**kwargs)
    frontend = HTSATFrontend() if name in ("HTSAT_CNN", "CLAP_SED", "DASM_HTSAT") else PasstFrontend()
    return model, frontend


def load_pretrained(model, frontend, config, args, logger):
    """Init (params, model_state), optionally warm-started from an orbax
    or torch ckpt. ``model_state`` carries the non-params collections
    (HTSAT bn0 BatchNorm running stats); {} means the model has none.
    When an orbax warm-start has a sibling ``best_model_state`` dir
    (written by the audioset stages), the trained stats are restored
    instead of fresh init values."""
    import os

    from transformer4sed_tpu.utils.checkpoint import load_partial, restore_params

    audio_len = config.get("feature", {}).get("audio_max_len", 10.0)
    mel = frontend.normalize(frontend(jnp.zeros((1, int(audio_len * frontend.sr)))))
    rngs = {"params": jax.random.PRNGKey(args.random_seed)}
    from transformer4sed_tpu.recipes.common import model_init_kwargs

    if model_init_kwargs(config).get("mlm"):
        rngs["mlm"] = jax.random.PRNGKey(1)
    init_kwargs = {}
    if getattr(model, "query_projector", False):
        # external-query DASM (open_vocab/closed_set configs): the query
        # projectors only materialise when a query tensor flows through
        # init — shape-only zeros stand in for the real banks here
        qd = model.query_dim
        init_kwargs["query"] = (
            jnp.zeros((model.class_num, qd))
            if isinstance(qd, int)
            else [jnp.zeros((model.class_num, d)) for d in qd]
        )
    variables = model.init(rngs, mel, **init_kwargs)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    if args.pretrained_ckpt:
        if args.pretrained_ckpt.endswith(".pt"):
            # the reference's own torch checkpoints load directly, by
            # model family (PaSST_SED/PaSST_CNN/DASM/HTSAT_CNN/CLAP_SED)
            from transformer4sed_tpu.utils.torch_import import (
                convert_torch_checkpoint,
                load_torch_state_dict,
            )

            from transformer4sed_tpu.recipes.common import lora_ckpt_merged

            _mname = config.get("model_name", "PaSST_SED")
            restored, torch_state = convert_torch_checkpoint(
                load_torch_state_dict(args.pretrained_ckpt), _mname,
                init_kwargs=model_init_kwargs(config, _mname),
                lora_merged=lora_ckpt_merged(config, getattr(args, "lora_ckpt", None)),
            )
            if torch_state and model_state:
                model_state = load_partial(model_state, torch_state)
                logger.info("restored model_state (BatchNorm stats) from the .pt")
        else:
            restored = restore_params(args.pretrained_ckpt)
            base = os.path.dirname(os.path.abspath(args.pretrained_ckpt))
            # teacher checkpoints pair with the teacher's own BN stats
            names = ["best_model_state"]
            if "teacher" in os.path.basename(args.pretrained_ckpt):
                names.insert(0, "best_model_state_teacher")
            for n in names:
                sibling = os.path.join(base, n)
                if model_state and os.path.isdir(sibling):
                    model_state = restore_params(sibling)
                    logger.info(f"restored model_state (BatchNorm stats) from {sibling}")
                    break
        drop = config["generals"].get("warm_start_drop", [])
        params = load_partial(params, restored, drop_patterns=drop)
        logger.info(f"warm-started from {args.pretrained_ckpt} (dropped: {drop})")
    return params, model_state


def main(argv=None):
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.matsed import MATSEDTrainer, MLMTrainer

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    stage, rest = argv[0], argv[1:]
    parser = common.build_argparser()
    args = parser.parse_args(rest)
    config, paths, logger = common.prepare_run(args)
    _label_dict = common.resolve_meta_path(
        config.get("dataset", {}).get("label_dict_path")
        or config.get("dataset", {}).get("label_dict")
    )
    if _label_dict:
        # AudioSet-strong: 447-class list from labeldict json (setting.py:55-64)
        from transformer4sed_tpu.recipes.audioset_strong import load_label_dict

        config["dataset"]["labels"] = list(load_label_dict(_label_dict))
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    params, model_state = load_pretrained(model, frontend, config, args, logger)

    if stage == "matsed_pretrain":
        from transformer4sed_tpu.data import DataLoader, RandomSampler, UnlabeledDataset, ConcatBatchSampler
        import itertools

        ds_cfg = config["dataset"]
        sources = [
            UnlabeledDataset(ds_cfg[k], False, codec)
            for k in ("strong_folder", "weak_folder", "unlabeled_folder")
            if ds_cfg.get(k)
        ]
        batch_sizes = config["training"]["batch_size"][: len(sources)]
        sampler = ConcatBatchSampler(
            [RandomSampler(len(s), i) for i, s in enumerate(sources)], batch_sizes
        )
        train_loader = DataLoader(sources, batch_sampler=sampler,
                                  num_workers=config["generals"].get("num_workers", 4),
                                  process_shard=True)
        val = UnlabeledDataset(ds_cfg["val_folder"], False, codec)
        val_loader = DataLoader(val, batch_size=sum(batch_sizes),
                                num_workers=config["generals"].get("num_workers", 4),
                                drop_last=False, process_shard_items=True)
        trainer = MLMTrainer(
            model, frontend, config, train_loader, val_loader, logger, params,
            init_model_state=model_state,
        )
        best_loss, key = float("inf"), jax.random.PRNGKey(args.random_seed)
        from transformer4sed_tpu.utils.checkpoint import save_params

        for epoch in range(config["training"]["scheduler"]["n_epochs"]):
            loss = trainer.train_epoch(epoch, key)
            val_loss = trainer.validation()
            logger.info(f"epoch {epoch + 1}: train {loss:.5f} val {val_loss:.5f}")
            if val_loss < best_loss:
                best_loss = val_loss
                save_params(f"{paths['best_paths']}/best_student", trainer.state.params)
                if trainer.state.model_state:
                    save_params(
                        f"{paths['best_paths']}/best_model_state", trainer.state.model_state
                    )
        return 0

    if stage == "pmam_extract":
        # PMAM stage 1: tap frame features from the frozen MLM net -> .npy
        from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
        from transformer4sed_tpu.pmam import extract_frame_features
        import numpy as np

        ds = UnlabeledDataset(config["dataset"]["unlabeled_folder"], False, codec)
        loader = DataLoader(ds, batch_size=config["training"].get("batch_size_val", 16),
                            num_workers=config["generals"].get("num_workers", 4), drop_last=False)

        def mel_batches():
            for batch in loader:
                yield frontend.normalize(frontend(jnp.asarray(batch["wav"])))

        feats = extract_frame_features(
            model, {"params": params, **(model_state or {})}, mel_batches(),
            feature_layer=config.get("pmam", {}).get("feature_layer", "transformer_0"),
            downsample_rate=config.get("pmam", {}).get("downsample_rate", 4),
        )
        out = f"{paths['save_folder']}/features.npy"
        np.save(out, feats)
        logger.info(f"extracted {feats.shape} features -> {out}")
        return 0

    if stage == "pmam_gmm":
        # PMAM stage 2: fit GMM (optionally after PCA) on extracted features
        import numpy as np
        from transformer4sed_tpu.pmam import GaussianMixture, PCA

        pm = config.get("pmam", {})
        feats = np.load(f"{paths['save_folder']}/features.npy")
        if pm.get("pca_dim"):
            feats = PCA(pm["pca_dim"]).fit_transform(feats)
        gmm = GaussianMixture(
            num_components=pm.get("n_components", 64),
            covariance_type=pm.get("covariance_type", "full"),
            n_iter=pm.get("n_iter", 50),
        ).fit(feats)
        np.save(f"{paths['save_folder']}/gmm_means.npy", gmm.means)
        np.save(f"{paths['save_folder']}/gmm_covariances.npy", gmm.covariances)
        np.save(f"{paths['save_folder']}/gmm_weights.npy", gmm.weights)
        logger.info(f"fitted GMM: means {gmm.means.shape}")
        return 0

    if stage == "pmam_pseudo_labels":
        # PMAM stage 3: per-clip pseudo-label TSVs from GMM posteriors
        import numpy as np
        from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
        from transformer4sed_tpu.pmam import GaussianMixture, generate_pseudo_labels

        pm = config.get("pmam", {})
        covs = np.load(f"{paths['save_folder']}/gmm_covariances.npy")
        # covariance layout identifies the type: [K, D] diag vs [K, D, D] full
        gmm = GaussianMixture(
            num_components=covs.shape[0],
            covariance_type="diag" if covs.ndim == 2 else "full",
        )
        gmm.means = np.load(f"{paths['save_folder']}/gmm_means.npy")
        gmm.covariances = covs
        gmm.weights = np.load(f"{paths['save_folder']}/gmm_weights.npy")
        ds = UnlabeledDataset(config["dataset"]["unlabeled_folder"], True, codec)
        loader = DataLoader(ds, batch_size=config["training"].get("batch_size_val", 16),
                            num_workers=config["generals"].get("num_workers", 4), drop_last=False)
        mels, names = [], []
        for batch in loader:
            mels.append(frontend.normalize(frontend(jnp.asarray(batch["wav"]))))
            names.append(batch["filename"])
        n = generate_pseudo_labels(
            model, {"params": params, **(model_state or {})}, gmm, mels, names,
            out_dir=f"{paths['save_folder']}/pseudo_labels",
            feature_layer=pm.get("feature_layer", "transformer_0"),
        )
        logger.info(f"wrote {n} pseudo-label TSVs")
        return 0

    if stage == "pmam_train":
        # PMAM stage 4 (post-pretrain): prototype-BCE on masked frames vs
        # GMM pseudo-labels, LoRA-only backbone updates
        # (reference recipes/desed/pmam/{main,train}.py)
        import numpy as np

        from transformer4sed_tpu.data import DataLoader, FrameWiseLabeledDataset
        from transformer4sed_tpu.pmam.train import PMAMConfig, make_pmam_step
        from transformer4sed_tpu.train.mlm import MLMState
        from transformer4sed_tpu.utils.checkpoint import save_params

        pm = config.get("pmam", {})
        gmm_means = np.load(
            args.gmm_means_path
            or pm.get("gmm_means_path", f"{paths['save_folder']}/gmm_means.npy")
        )
        ds = FrameWiseLabeledDataset(
            args.pseudo_label_dir
            or pm.get("pseudo_label_dir", f"{paths['save_folder']}/pseudo_labels"),
            config["dataset"]["unlabeled_folder"], False, codec,
        )
        loader = DataLoader(
            ds, batch_size=config["training"]["batch_size"]
            if isinstance(config["training"]["batch_size"], int)
            else sum(config["training"]["batch_size"]),
            num_workers=config["generals"].get("num_workers", 4),
            process_shard=True,
        )
        config.setdefault("opt", {}).setdefault("lora_trainable", True)
        optimizer, _ = common.optimizer_from_config(params, config, len(loader))
        aware = bool(model_state)
        state = MLMState(params=params, opt_state=optimizer.init(params),
                         step=jnp.zeros((), jnp.int32),
                         model_state=model_state or None)
        model_apply = common.make_model_apply(model, aware)
        model_name = config.get("model_name", "PaSST_CNN")
        cfg = PMAMConfig(
            temperature=pm.get("temperature", 0.1),
            w_at=config["training"].get("w_AT", 0.0),
            model_kwargs=config.get(model_name, {}).get("train_kwargs", {}),
        )
        raw_step = make_pmam_step(
            model_apply, frontend, optimizer, gmm_means, cfg, model_state_aware=aware
        )
        pmam_batch = config["training"]["batch_size"]
        pmam_batch = pmam_batch if isinstance(pmam_batch, int) else sum(pmam_batch)
        if jax.device_count() > 1 and pmam_batch % jax.device_count() == 0:
            from transformer4sed_tpu.parallel import make_mesh, shard_train_step

            mesh = make_mesh()
            step = shard_train_step(raw_step, mesh, donate_state=True)
        else:
            mesh = None
            step = jax.jit(raw_step, donate_argnums=0)
        key = jax.random.PRNGKey(args.random_seed)
        best = float("inf")
        n = len(loader)
        for epoch in range(config["training"]["scheduler"]["n_epochs"]):
            loader.set_epoch(epoch)
            acc = 0.0
            for i, batch in enumerate(loader):
                state, metrics = step(
                    state,
                    common.put_train_batch(
                        {"wav": batch["wav"], "labels": batch["label"]}, mesh
                    ),
                    jax.random.fold_in(key, epoch * n + i),
                )
                acc += float(metrics["loss_total"]) / n
            logger.scalars("Train", {"loss_total": acc}, epoch + 1)
            if acc < best:
                best = acc
                save_params(f"{paths['best_paths']}/best_student", state.params)
                if state.model_state:
                    save_params(f"{paths['best_paths']}/best_model_state", state.model_state)
        return 0

    if stage in ("matsed_finetune", "matsed_test"):
        train_loader, val_loader, test_loader = common.desed_dataset_setting(
            config, codec, args.random_seed
        )
        trainer = MATSEDTrainer(
            model, frontend, config, codec, train_loader, val_loader, test_loader, logger,
            init_params=params, init_model_state=model_state,
        )
        start_epoch = 0
        resume = common.resolve_resume(args, paths, logger)
        if resume:
            steps = trainer.restore_state(resume)
            start_epoch = steps // max(len(train_loader), 1)
            logger.info(f"resumed from {resume} at step {steps} (epoch {start_epoch})")
        if stage == "matsed_finetune" and not args.test_only:
            trainer.run(
                config["training"]["scheduler"]["n_epochs"], paths["best_paths"],
                args.random_seed, start_epoch=start_epoch,
            )
        trainer.test(filter_type=config["training"].get("filter_type", "median"))
        return 0

    if stage in ("audioset_supervised", "dasm_train", "dasm_ov", "clap_train"):
        # AudioSet-strong family (reference recipes/audioset_strong/*):
        # supervised PaSST_CNN/HTSAT_CNN, closed-set DASM, open-vocab DASM,
        # common-only CLAP
        import numpy as np

        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedTrainer,
            audioset_dataset_setting,
            load_type_map,
        )

        train_loader, val_loader = audioset_dataset_setting(config, codec, args.random_seed)
        state_json = common.resolve_meta_path(
            config["dataset"].get("state_json") or config["dataset"].get("type_map")
        )
        type_map = load_type_map(state_json) if state_json else None
        base = dict(
            init_params=params, init_model_state=model_state, type_map=type_map,
        )
        if stage == "audioset_supervised":
            trainer = SupervisedTrainer(
                model, frontend, config, codec, train_loader, val_loader, logger, **base
            )
        elif stage == "dasm_train":
            from transformer4sed_tpu.recipes.dasm_recipe import DASMTrainer

            # external query tensors for query_projector models (the
            # reference loads these as buffers at init,
            # detect_any_sound.py:124-165): one bank per modality
            banks = [
                np.load(config["dataset"][k])
                for k in ("text_query", "audio_query")
                if config["dataset"].get(k)
            ] if getattr(model, "query_projector", False) else []
            qb = banks if len(banks) > 1 else (banks[0] if banks else None)
            trainer = DASMTrainer(
                model, frontend, config, codec, train_loader, val_loader, logger,
                query_bank=qb, **base,
            )
        else:
            if type_map is None:
                raise SystemExit(f"{stage} needs dataset.state_json (common/rare map)")
            common_mask = np.asarray([type_map.get(c) == "common" for c in codec.labels])
            bank_path = config["dataset"].get("query_bank") or config["dataset"].get(
                "text_query"
            )
            bank = np.load(bank_path) if bank_path else None
            if stage == "dasm_ov":
                from transformer4sed_tpu.recipes.dasm_recipe import OVDASMTrainer

                trainer = OVDASMTrainer(
                    model, frontend, config, codec, train_loader, val_loader, logger,
                    common_mask=common_mask, query_bank=bank, **base,
                )
            else:
                from transformer4sed_tpu.recipes.clap import CommonOnlyClapTrainer

                trainer = CommonOnlyClapTrainer(
                    model, frontend, config, codec, train_loader, val_loader, logger,
                    common_mask=common_mask, query_bank=bank, **base,
                )

        from transformer4sed_tpu.utils.logging import BestModels

        gt = common.load_ground_truth(config["dataset"]["val_tsv"])
        durations = common.load_durations(config["dataset"]["val_dur"])
        median = common.median_filter_from_config(config, codec)
        key = jax.random.PRNGKey(args.random_seed)
        # BestModels persists the best metric (best_metric.json), so a
        # resumed run cannot clobber a better pre-preemption checkpoint
        best = BestModels(paths["best_paths"], flush_every=1)
        # elastic recovery, matching the matsed stages: per-epoch
        # last_state + --resume_ckpt auto picks it up after preemption
        start_epoch = 0
        resume = common.resolve_resume(args, paths, logger)
        if resume:
            steps = trainer.restore_state(resume)
            start_epoch = steps // max(len(train_loader), 1)
            logger.info(f"resumed from {resume} at step {steps} (epoch {start_epoch})")
        for epoch in range(start_epoch, config["training"]["scheduler"]["n_epochs"]):
            metrics = trainer.train_epoch(epoch, key)
            results = trainer.validation(epoch, gt, durations, median_filter=median)
            logger.info(f"epoch {epoch + 1}: train {metrics} val {results}")
            best.update(
                epoch, results["psds"], trainer.state.params,
                student_model_state=trainer.state.model_state,
            )
            trainer.save_state(f"{paths['best_paths']}/last_state")
        best.flush()
        from transformer4sed_tpu.utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # land the final async last_state before returning
        return 0

    if stage == "openset_eval":
        # zero-shot extended-vocabulary evaluation
        # (reference detect_any_sound/passt/openset_evaluation.py and clap/)
        import json

        import numpy as np
        import pandas as pd

        from transformer4sed_tpu.core.codec import LabelCodec
        from transformer4sed_tpu.data import DataLoader, StronglyLabeledDataset
        from transformer4sed_tpu.recipes.dasm_recipe import openset_evaluate

        ds = config["dataset"]
        with open(common.resolve_meta_path(ds["openset_label"])) as f:
            extra_labels = json.load(f)
        codec_open = LabelCodec(
            labels=tuple(codec.labels) + tuple(extra_labels),
            audio_len=codec.audio_len, frame_len=codec.frame_len,
            frame_hop=codec.frame_hop, net_pooling=codec.net_pooling, sr=codec.sr,
        )
        extra_query = np.load(ds["openset_embedding"])
        bank = np.load(ds["query_bank"]) if ds.get("query_bank") else None
        test = StronglyLabeledDataset(
            pd.read_csv(ds["openset_tsv"], sep="\t"), ds["openset_folder"], True, codec_open
        )
        loader = DataLoader(
            test, batch_size=config["training"].get("batch_size_val", 16),
            drop_last=False, num_workers=config["generals"].get("num_workers", 4),
        )
        gt = common.load_ground_truth(ds["openset_tsv"])
        durations = common.load_durations(ds["openset_dur"])
        psds, single, top10 = openset_evaluate(
            model, frontend, params, codec_open, loader, extra_query, gt, durations,
            query_bank=bank,
            median_filter=common.median_filter_from_config(config, codec_open),
            model_kwargs=config.get(config.get("model_name", "DASM"), {}).get("test_kwargs", {}),
            model_state=model_state or None,
        )
        with open(f"{paths['save_folder']}/single_psds.json", "w") as f:
            json.dump({k: round(v, 4) for k, v in sorted(single.items(), key=lambda kv: kv[1])}, f, indent=4)
        logger.info(f"openset psds={psds:.4f}; top10={top10}")
        return 0

    raise SystemExit(f"unknown stage {stage!r}")


if __name__ == "__main__":
    sys.exit(main())
