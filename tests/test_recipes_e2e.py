"""End-to-end recipe test: synthetic mini-DESED -> MLM pretrain epoch ->
mean-teacher fine-tune epoch -> validation (PSDS/F1) -> test.

This is the 'minimum end-to-end slice' of SURVEY.md §7.3 on synthetic
1.2-second audio with a tiny PaSST_SED.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from transformer4sed_tpu.recipes import common
from transformer4sed_tpu.recipes.matsed import MATSEDTrainer, MLMTrainer

SR = 32000
CLIP_SECONDS = 1.2
N_SAMPLES = int(SR * CLIP_SECONDS)
CLASSES = ["beep", "noise"]


def tone(freq, n=N_SAMPLES, amp=0.3):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def mini_desed(tmp_path_factory):
    """Synthetic dataset: 'beep' = 880 Hz tone events on noise floor."""
    root = tmp_path_factory.mktemp("mini_desed")
    rng = np.random.RandomState(0)

    def write(folder, name, wav):
        os.makedirs(root / folder, exist_ok=True)
        wavfile.write(str(root / folder / name), SR, (wav * 32767).astype(np.int16))

    strong_rows = []
    for i in range(4):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.02
        on, off = 0.3, 0.9
        wav[int(on * SR) : int(off * SR)] += tone(880)[: int((off - on) * SR)]
        write("strong", f"s{i}.wav", wav)
        strong_rows.append((f"s{i}.wav", on, off, "beep"))
    strong_tsv = root / "strong.tsv"
    pd.DataFrame(strong_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        strong_tsv, sep="\t", index=False
    )

    synth_rows = []
    for i in range(2):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.02
        wav[: N_SAMPLES // 2] += tone(880)[: N_SAMPLES // 2]
        write("synth", f"y{i}.wav", wav)
        synth_rows.append((f"y{i}.wav", 0.0, CLIP_SECONDS / 2, "beep"))
    synth_tsv = root / "synth.tsv"
    pd.DataFrame(synth_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        synth_tsv, sep="\t", index=False
    )

    weak_rows = []
    for i in range(4):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.02 + tone(880) * (i % 2)
        write("weak", f"w{i}.wav", wav)
        weak_rows.append((f"w{i}.wav", "beep" if i % 2 else "noise"))
    weak_tsv = root / "weak.tsv"
    pd.DataFrame(weak_rows, columns=["filename", "event_labels"]).to_csv(
        weak_tsv, sep="\t", index=False
    )

    for i in range(4):
        write("unlabeled", f"u{i}.wav", rng.randn(N_SAMPLES).astype(np.float32) * 0.05)

    val_rows, dur_rows = [], []
    for i in range(3):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.02
        wav[int(0.2 * SR) : int(0.8 * SR)] += tone(880)[: int(0.6 * SR)]
        write("val", f"v{i}.wav", wav)
        val_rows.append((f"v{i}.wav", 0.2, 0.8, "beep"))
        dur_rows.append((f"v{i}.wav", CLIP_SECONDS))
    val_tsv = root / "val.tsv"
    val_dur = root / "val_dur.tsv"
    pd.DataFrame(val_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        val_tsv, sep="\t", index=False
    )
    pd.DataFrame(dur_rows, columns=["filename", "duration"]).to_csv(val_dur, sep="\t", index=False)

    return {
        "root": str(root),
        "strong_tsv": str(strong_tsv),
        "synth_tsv": str(synth_tsv),
        "weak_tsv": str(weak_tsv),
        "val_tsv": str(val_tsv),
        "val_dur": str(val_dur),
    }


def make_config(paths):
    r = paths["root"]
    return {
        "generals": {"val_interval": 1, "num_workers": 0},
        "model_name": "PaSST_SED",
        "feature": {
            "pred_len": 120,
            "sr": SR,
            "hopsize": 320,
            "n_fft": 1024,
            "audio_max_len": CLIP_SECONDS,
            "net_subsample": 1,
        },
        "dataset": {
            "labels": CLASSES,
            "strong_folder": f"{r}/strong",
            "strong_tsv": paths["strong_tsv"],
            "weak_folder": f"{r}/weak",
            "weak_tsv": paths["weak_tsv"],
            "unlabeled_folder": f"{r}/unlabeled",
            "val_folder": f"{r}/val",
            "val_tsv": paths["val_tsv"],
            "val_dur": paths["val_dur"],
        },
        "synth_dataset": {
            "synth_train_folder": f"{r}/synth",
            "synth_train_tsv": paths["synth_tsv"],
        },
        "training": {
            "batch_size": [1, 1, 2, 2],
            "batch_size_val": 3,
            "clip_grad": True,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
            "self_loss_warmup": 1,
            "cons_scheduler_name": "Linear",
            "ema_factor": 0.999,
            "w_weak": 0.5, "w_cons_max": 2, "w_cons_min": 0, "w_weak_cons": 0.5, "w_AT": 2,
            "filter_type": "median",
            "median_window": [5, 5],
            "weak_mask": True,
            "transform": {"n_transform": 2, "choice": [1, 0, 0, 0],
                          "filter_db_range": [-6, 6], "filter_bands": [2, 5],
                          "filter_minimum_bandwidth": 4, "filter_type": "step"},
        },
        "PaSST_SED": {
            "init_kwargs": {},
            "train_stu_kwargs": {"temp_w": 1},
            "train_tch_kwargs": {"temp_w": 1},
            "val_kwargs": {"temp_w": 0.5},
            "test_kwargs": {"temp_w": 0.5},
        },
        "opt": {
            "param_groups": {
                "encoder": {"lr": 1.0e-4, "weight_decay": 1.0e-4, "freeze_layer": 0, "step_lr": 1},
                "decoder": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
                "head": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
            }
        },
        "backbone_depth": 2,
    }


def tiny_sed_model(**kw):
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    cfg = dict(
        class_num=2,
        embed_dim=32,
        decoder_dim=32,
        backbone_depth=2,
        backbone_num_heads=4,
        decoder_num_heads=4,
        at_adapter_heads=4,
        passt_feature_layer=2,
        decoder="transformerXL",
        decoder_layer_num=1,
        decoder_pos_emd_len=120,
        at_adapter=True,
    )
    cfg.update(kw)
    return PaSST_SED(**cfg)


class TestEndToEnd:
    def test_matsed_full_cycle(self, mini_desed, tmp_path):
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.utils.logging import Logger

        config = make_config(mini_desed)
        codec = common.codec_from_config(config)
        assert codec.n_frames == 120

        train_loader, val_loader, test_loader = common.desed_dataset_setting(config, codec)
        assert len(train_loader) == 2  # min(4/1, 2/1, 4/2, 4/2)

        model = tiny_sed_model()
        frontend = PasstFrontend()
        logger = Logger(tensorboard_dir=None)
        trainer = MATSEDTrainer(
            model, frontend, config, codec, train_loader, val_loader, test_loader, logger
        )

        metrics = trainer.train_epoch(0, jax.random.PRNGKey(0))
        assert np.isfinite(metrics["loss_total"])
        assert int(trainer.state.step) == 2

        val = trainer.validation(0)
        for k in ("psds1/s", "psds2/s", "psds1/t", "event_f1/s", "weak_f1/s"):
            assert k in val and np.isfinite(val[k])

        test = trainer.test(filter_type="median")
        assert 0.0 <= test["psds1"] <= 1.0
        test_max = trainer.test(filter_type="max")
        assert np.isfinite(test_max["psds2"])

    def test_mean_teacher_learns_synthetic_events(self, mini_desed):
        """End-to-end learning signal: after a few mean-teacher epochs on
        the tone-event mini-DESED, validation event F1 rises well above
        the random-init 0 (observed 0.27-0.33 by epoch ~6). Guards the
        whole chain frontend -> augment -> losses -> optimizer -> EMA ->
        decode -> metrics against silent training breakage."""
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.utils.logging import Logger

        config = make_config(mini_desed)
        config["training"]["scheduler"]["n_epochs"] = 8
        config["training"]["scheduler"]["n_epochs_cut"] = 6
        codec = common.codec_from_config(config)
        train_loader, val_loader, test_loader = common.desed_dataset_setting(config, codec)
        trainer = MATSEDTrainer(
            tiny_sed_model(), PasstFrontend(), config, codec,
            train_loader, val_loader, test_loader, Logger(tensorboard_dir=None),
        )
        key = jax.random.PRNGKey(0)
        best_f1 = 0.0
        for epoch in range(8):
            trainer.train_epoch(epoch, key)
            val = trainer.validation(epoch)
            best_f1 = max(best_f1, val["event_f1/s"])
        assert best_f1 > 0.15, f"no learning signal: best event F1 {best_f1}"

    def test_mlm_pretrain_cycle(self, mini_desed):
        from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.utils.logging import Logger

        config = make_config(mini_desed)
        config["PaSST_SED"]["train_kwargs"] = {}
        codec = common.codec_from_config(config)
        ds = UnlabeledDataset(config["dataset"]["unlabeled_folder"], False, codec)
        loader = DataLoader(ds, batch_size=2, num_workers=0)

        model = tiny_sed_model(
            at_adapter=False,
            mlm=True,
            mlm_dict={"mask_rate": 0.75, "strategy": "block", "block_width": 10, "out_dim": 32},
        )
        frontend = PasstFrontend()
        trainer = MLMTrainer(model, frontend, config, loader, loader, Logger())
        loss = trainer.train_epoch(0, jax.random.PRNGKey(0))
        assert np.isfinite(loss)
        val_loss = trainer.validation()
        assert np.isfinite(val_loss)


class TestCheckpointResume:
    def test_save_restore_roundtrip(self, mini_desed, tmp_path):
        """Elastic-recovery path: full train state (params+EMA+opt+step)
        survives a save/restore cycle and training continues from it."""
        import jax.numpy as jnp

        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.utils.logging import Logger

        config = make_config(mini_desed)
        codec = common.codec_from_config(config)
        train_loader, val_loader, test_loader = common.desed_dataset_setting(config, codec)
        trainer = MATSEDTrainer(
            tiny_sed_model(), PasstFrontend(), config, codec,
            train_loader, val_loader, test_loader, Logger(),
        )
        trainer.train_epoch(0, jax.random.PRNGKey(0))
        step_before = int(trainer.state.step)
        leaf_before = np.asarray(
            trainer.state.params["decoder_module"]["encoder_blocks_0"]["attn"]["in_proj"]["kernel"]
        )
        trainer.save_state(str(tmp_path / "last_state"))

        trainer2 = MATSEDTrainer(
            tiny_sed_model(), PasstFrontend(), config, codec,
            train_loader, val_loader, test_loader, Logger(),
        )
        steps = trainer2.restore_state(str(tmp_path / "last_state"))
        assert steps == step_before
        np.testing.assert_array_equal(
            np.asarray(
                trainer2.state.params["decoder_module"]["encoder_blocks_0"]["attn"]["in_proj"]["kernel"]
            ),
            leaf_before,
        )
        trainer2.train_epoch(1, jax.random.PRNGKey(1))
        assert int(trainer2.state.step) == step_before + len(train_loader)
