"""End-to-end CLI test for the AudioSet-strong supervised stage:
synthetic mini-AudioSet -> one training epoch -> PSDS validation via
``recipes.cli audioset_supervised``."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml
from scipy.io import wavfile

SR = 32000
CLIP_SECONDS = 1.2
N_SAMPLES = int(SR * CLIP_SECONDS)
CLASSES = ["dog", "cat", "rain"]


@pytest.fixture(scope="module")
def mini_audioset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_audioset")
    rng = np.random.RandomState(0)

    def write(folder, name, wav):
        os.makedirs(root / folder, exist_ok=True)
        wavfile.write(str(root / folder / name), SR, (wav * 32767).astype(np.int16))

    def rows(folder, n, prefix):
        out = []
        for i in range(n):
            wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.05
            write(folder, f"{prefix}{i}.wav", wav)
            out.append((f"{prefix}{i}.wav", 0.2, 0.9, CLASSES[i % 3]))
        return out

    train_tsv, val_tsv, dur_tsv = root / "train.tsv", root / "val.tsv", root / "val_dur.tsv"
    pd.DataFrame(rows("train", 4, "t"), columns=["filename", "onset", "offset", "event_label"]).to_csv(
        train_tsv, sep="\t", index=False
    )
    val_rows = rows("val", 2, "v")
    pd.DataFrame(val_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        val_tsv, sep="\t", index=False
    )
    pd.DataFrame(
        [(r[0], CLIP_SECONDS) for r in val_rows], columns=["filename", "duration"]
    ).to_csv(dur_tsv, sep="\t", index=False)

    label_dict = root / "labeldict.json"
    with open(label_dict, "w") as f:
        json.dump({c: i for i, c in enumerate(CLASSES)}, f)
    state_json = root / "state.json"
    with open(state_json, "w") as f:
        json.dump({"dog": "common", "cat": "common", "rain": "rare"}, f)

    config = {
        "generals": {"num_workers": 0},
        "model_name": "PaSST_SED",
        "PaSST_SED": {
            "init_kwargs": {
                "class_num": 3, "embed_dim": 32, "decoder_dim": 32,
                "backbone_depth": 2, "backbone_num_heads": 4,
                "decoder_num_heads": 4, "at_adapter_heads": 4,
                "passt_feature_layer": 2, "decoder": "transformerXL",
                "decoder_layer_num": 1, "decoder_pos_emd_len": 120,
                "at_adapter": True,
            },
            "train_kwargs": {"temp_w": 1},
            "val_kwargs": {"temp_w": 0.5},
        },
        "feature": {"pred_len": 120, "sr": SR, "hopsize": 320, "n_fft": 1024,
                    "audio_max_len": CLIP_SECONDS, "net_subsample": 1},
        "dataset": {
            "label_dict_path": str(label_dict),
            "state_json": str(state_json),
            "train_tsv": str(train_tsv), "train_folder": f"{root}/train",
            "val_tsv": str(val_tsv), "val_folder": f"{root}/val",
            "val_dur": str(dur_tsv),
        },
        "training": {
            "batch_size": 2, "batch_size_val": 2, "num_samples": 4,
            "clip_grad": True, "median_window": 5,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
        },
        "opt": {"param_groups": {
            "encoder": {"lr": 1e-4, "weight_decay": 1e-4},
            "decoder": {"lr": 1e-3, "weight_decay": 1e-4},
            "head": {"lr": 1e-3, "weight_decay": 1e-4},
        }},
        "backbone_depth": 2,
    }
    config_path = root / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    return {"root": str(root), "config": str(config_path)}


class TestAudioSetCLI:
    def test_supervised_stage(self, mini_audioset, tmp_path):
        from transformer4sed_tpu.recipes.cli import main

        rc = main([
            "audioset_supervised",
            "--config_dir", mini_audioset["config"],
            "--save_folder", str(tmp_path / "run"),
            "--random_seed", "0",
        ])
        assert rc == 0
        # best params saved
        assert any((tmp_path / "run").rglob("best_student*")) or any(
            p for p in (tmp_path / "run").rglob("*") if "best" in p.name
        )


class TestDASMOVCLI:
    def test_ov_stage(self, mini_audioset, tmp_path):
        """Open-vocab DASM through the CLI: labels restricted to common
        classes, learnable query bank sliced in-loss, common-first eval."""
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        with open(mini_audioset["config"]) as f:
            config = _yaml.safe_load(f)
        config["model_name"] = "DASM"
        config["DASM"] = {
            "init_kwargs": {
                "class_num": 3, "decoder_dim": 32, "num_heads": 4,
                "decoder": "transformerXL", "decoder_layer_num": 1,
                "decoder_pos_emd_len": 120, "embed_dim": 32,
                "backbone_depth": 2, "backbone_num_heads": 4,
                "passt_feature_layer": 2, "at_decoder_layer": 1,
                "f_pool_heads": 4, "out_type": "sigmoid", "cnn_param": None,
            },
            "at_param": {"out_type": "sigmoid", "query_projector": False},
            "train_kwargs": {},
            "val_kwargs": {},
        }
        config["training"]["w_AT"] = 1.0
        cfg_path = tmp_path / "dasm_ov.yaml"
        with open(cfg_path, "w") as f:
            _yaml.safe_dump(config, f)

        rc = main([
            "dasm_ov",
            "--config_dir", str(cfg_path),
            "--save_folder", str(tmp_path / "run"),
            "--random_seed", "0",
        ])
        assert rc == 0


def _dasm_config(base_config):
    config = dict(base_config)
    config["model_name"] = "DASM"
    config["DASM"] = {
        "init_kwargs": {
            "class_num": 3, "decoder_dim": 32, "num_heads": 4,
            "decoder": "transformerXL", "decoder_layer_num": 1,
            "decoder_pos_emd_len": 120, "embed_dim": 32,
            "backbone_depth": 2, "backbone_num_heads": 4,
            "passt_feature_layer": 2, "at_decoder_layer": 1,
            "f_pool_heads": 4, "out_type": "sigmoid", "cnn_param": None,
        },
        "train_kwargs": {},
        "val_kwargs": {},
        "test_kwargs": {},
    }
    config["training"]["w_AT"] = 1.0
    return config


class TestDASMClosedAndOpensetCLI:
    def test_dasm_train_then_openset_eval(self, mini_audioset, tmp_path):
        """Closed-set DASM through the CLI, then zero-shot openset_eval
        with a novel-class query appended to the trained learnable bank
        (the reference openset_evaluation.py flow)."""
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        with open(mini_audioset["config"]) as f:
            config = _dasm_config(_yaml.safe_load(f))
        cfg_path = tmp_path / "dasm.yaml"
        with open(cfg_path, "w") as f:
            _yaml.safe_dump(config, f)
        rc = main([
            "dasm_train", "--config_dir", str(cfg_path),
            "--save_folder", str(tmp_path / "run"), "--random_seed", "0",
        ])
        assert rc == 0
        ckpt = tmp_path / "run" / "best" / "best_student"
        assert ckpt.is_dir()

        # openset assets: one novel class ("thunder") over the val clips,
        # novel query embedding in decoder_dim space (learnable-bank model)
        root = mini_audioset["root"]
        openset_label = tmp_path / "openset_label.json"
        with open(openset_label, "w") as f:
            json.dump(["thunder"], f)
        emb = tmp_path / "openset_emb.npy"
        np.save(emb, np.random.RandomState(0).randn(1, 32).astype(np.float32))
        rows = pd.read_csv(f"{root}/val.tsv", sep="\t")
        rows.loc[rows.index[-1], "event_label"] = "thunder"
        open_tsv = tmp_path / "openset.tsv"
        rows.to_csv(open_tsv, sep="\t", index=False)
        config["dataset"].update({
            "openset_label": str(openset_label),
            "openset_embedding": str(emb),
            "openset_tsv": str(open_tsv),
            "openset_folder": f"{root}/val",
            "openset_dur": config["dataset"]["val_dur"],
        })
        cfg2 = tmp_path / "openset.yaml"
        with open(cfg2, "w") as f:
            _yaml.safe_dump(config, f)
        rc = main([
            "openset_eval", "--config_dir", str(cfg2),
            "--save_folder", str(tmp_path / "openset"), "--random_seed", "0",
            "--pretrained_ckpt", str(ckpt),
        ])
        assert rc == 0
        single = json.load(open(tmp_path / "openset" / "single_psds.json"))
        assert set(single) <= set(CLASSES) | {"thunder"}
        log = (tmp_path / "openset" / "log.txt").read_text()
        assert "openset psds=" in log


class TestCLAPCLI:
    def test_clap_train_stage(self, mini_audioset, tmp_path):
        """Common-only CLAP_SED through the CLI: text-query bank, common
        classes trained, full-bank validation."""
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        with open(mini_audioset["config"]) as f:
            config = _yaml.safe_load(f)
        config["model_name"] = "CLAP_SED"
        config["CLAP_SED"] = {
            "init_kwargs": {
                "embed_dim": 96 * 8, "class_num": 3, "query_dim": 16,
                "htsat_config": "tiny",
            },
            "train_kwargs": {}, "val_kwargs": {},
        }
        bank = tmp_path / "text_bank.npy"
        np.save(bank, np.random.RandomState(1).randn(3, 16).astype(np.float32))
        config["dataset"]["query_bank"] = str(bank)
        # CLAP frontend is HTSAT-style: label grid = backbone frames
        config["feature"]["pred_len"] = 32
        config["feature"]["net_subsample"] = 120.0 / 32.0
        cfg_path = tmp_path / "clap.yaml"
        with open(cfg_path, "w") as f:
            _yaml.safe_dump(config, f)
        rc = main([
            "clap_train", "--config_dir", str(cfg_path),
            "--save_folder", str(tmp_path / "run"), "--random_seed", "0",
        ])
        assert rc == 0
        log = (tmp_path / "run" / "log.txt").read_text()
        assert "epoch 1:" in log


class TestSupervisedResume:
    def test_auto_resume_from_last_state(self, mini_audioset, tmp_path):
        """Elastic recovery for the AudioSet family: a second run with
        --resume_ckpt auto picks up last_state and skips done epochs."""
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        save = tmp_path / "run"
        rc = main([
            "audioset_supervised", "--config_dir", mini_audioset["config"],
            "--save_folder", str(save), "--random_seed", "0",
        ])
        assert rc == 0
        assert any("last_state" in p.name for p in save.rglob("*"))

        with open(mini_audioset["config"]) as f:
            config = _yaml.safe_load(f)
        config["training"]["scheduler"]["n_epochs"] = 2
        cfg2 = tmp_path / "resume.yaml"
        with open(cfg2, "w") as f:
            _yaml.safe_dump(config, f)
        rc = main([
            "audioset_supervised", "--config_dir", str(cfg2),
            "--save_folder", str(save), "--random_seed", "0",
            "--resume_ckpt", "auto",
        ])
        assert rc == 0
        log = (save / "log.txt").read_text()
        assert "resumed from" in log
        # first run did epoch 1; the resumed run logs only epoch 2
        assert log.count("epoch 2:") >= 1


class TestSupervisedSharded:
    def test_supervised_stage_sharded(self, mini_audioset, tmp_path):
        """batch_size divisible by the 8-device CPU mesh -> the trainer
        shards batches over the data mesh (matches MATSEDTrainer)."""
        import jax as _jax
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        if _jax.device_count() < 2:
            pytest.skip("needs the multi-device CPU mesh")
        with open(mini_audioset["config"]) as f:
            config = _yaml.safe_load(f)
        # 8 clips for one full batch of 8 -> shards 1 clip/device
        rng = np.random.RandomState(7)
        train_dir = tmp_path / "train8"
        os.makedirs(train_dir)
        rows = []
        for i in range(8):
            wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.05
            wavfile.write(str(train_dir / f"s{i}.wav"), SR, (wav * 32767).astype(np.int16))
            rows.append((f"s{i}.wav", 0.2, 0.9, CLASSES[i % 3]))
        train_tsv = tmp_path / "train8.tsv"
        pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
            train_tsv, sep="\t", index=False
        )
        config["dataset"]["train_tsv"] = str(train_tsv)
        config["dataset"]["train_folder"] = str(train_dir)
        config["training"]["batch_size"] = 8
        config["training"]["batch_size_val"] = 2
        cfg_path = tmp_path / "sharded.yaml"
        with open(cfg_path, "w") as f:
            _yaml.safe_dump(config, f)
        rc = main([
            "audioset_supervised",
            "--config_dir", str(cfg_path),
            "--save_folder", str(tmp_path / "run"),
            "--random_seed", "0",
        ])
        assert rc == 0
        log = (tmp_path / "run" / "log.txt").read_text()
        assert "sharding batches over" in log


class TestHTSATSupervisedCLI:
    def test_htsat_cnn_stage(self, mini_audioset, tmp_path):
        """audioset_supervised with the HTSAT(Swin) backbone through the
        CLI: BatchNorm state threaded, tiny config, one epoch."""
        import yaml as _yaml

        from transformer4sed_tpu.recipes.cli import main

        with open(mini_audioset["config"]) as f:
            config = _yaml.safe_load(f)
        config["model_name"] = "HTSAT_CNN"
        # HTSAT tiny on 1.2 s emits 32 latent frames x10 upsample = 320
        # output frames; the label grid must match (fractional pooling,
        # reference audioset HTSAT configs do the same via net_subsample)
        config["feature"]["net_subsample"] = 120.0 / 320.0
        config["feature"]["pred_len"] = 320
        config["HTSAT_CNN"] = {
            "init_kwargs": {
                "class_num": 3, "decoder_dim": 32, "num_heads": 4,
                "decoder": "transformerXL", "decoder_layer_num": 1,
                "decoder_pos_emd_len": 512, "htsat_config": "tiny",
                "cnn_param": {
                    "nb_filters": [8, 8],
                    "pooling": [[1, 8], [1, 8]],
                    "normalization": "layer",
                    "activation": "glu",
                },
            },
            "train_kwargs": {"temp_w": 1},
            "val_kwargs": {"temp_w": 0.5},
        }
        cfg_path = tmp_path / "htsat_config.yaml"
        with open(cfg_path, "w") as f:
            _yaml.safe_dump(config, f)

        rc = main([
            "audioset_supervised",
            "--config_dir", str(cfg_path),
            "--save_folder", str(tmp_path / "run"),
            "--random_seed", "0",
        ])
        assert rc == 0
        assert any("best" in p.name for p in (tmp_path / "run").rglob("*"))
