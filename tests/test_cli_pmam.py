"""End-to-end CLI test of the four PMAM stages:
pmam_extract -> pmam_gmm -> pmam_pseudo_labels -> pmam_train."""

import os

import numpy as np
import pytest
import yaml
from scipy.io import wavfile

SR = 32000
CLIP_SECONDS = 1.2
N_SAMPLES = int(SR * CLIP_SECONDS)


@pytest.fixture(scope="module")
def pmam_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("pmam_cli")
    wavs = root / "unlabeled"
    os.makedirs(wavs)
    rng = np.random.RandomState(0)
    for i in range(4):
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.05
        wavfile.write(str(wavs / f"u{i}.wav"), SR, (wav * 32767).astype(np.int16))

    config = {
        "generals": {"num_workers": 0},
        "model_name": "PaSST_SED",
        "PaSST_SED": {
            "init_kwargs": {
                "class_num": 2, "embed_dim": 32, "decoder_dim": 32,
                "backbone_depth": 2, "backbone_num_heads": 4,
                "decoder_num_heads": 4, "passt_feature_layer": 2,
                "decoder": "transformerXL", "decoder_layer_num": 1,
                "decoder_pos_emd_len": 120, "at_adapter": False,
                "mlm": True,
                "mlm_dict": {"mask_rate": 0.75, "strategy": "block",
                             "block_width": 10, "out_dim": 32},
            },
            "train_kwargs": {},
        },
        "feature": {"pred_len": 120, "sr": SR, "hopsize": 320, "n_fft": 1024,
                    "audio_max_len": CLIP_SECONDS, "net_subsample": 1},
        "dataset": {"labels": ["a", "b"], "unlabeled_folder": str(wavs)},
        "training": {
            "batch_size": 2, "batch_size_val": 2, "clip_grad": True, "w_AT": 0.0,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
        },
        "pmam": {"feature_layer": "transformer_0", "downsample_rate": 4,
                 "n_components": 3, "covariance_type": "diag", "n_iter": 5,
                 "temperature": 0.1},
        "opt": {
            "lora_trainable": False,
            "param_groups": {
                "encoder": {"lr": 0, "weight_decay": 1.0e-4},
                "decoder": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
                "head": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
            },
        },
        "backbone_depth": 2,
    }
    config_path = root / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    return {"root": str(root), "config": str(config_path)}


class TestPMAMCLI:
    def test_four_stages(self, pmam_setup, tmp_path):
        from transformer4sed_tpu.recipes.cli import main

        run = str(tmp_path / "run")
        args = ["--config_dir", pmam_setup["config"], "--save_folder", run,
                "--random_seed", "0"]
        for stage in ("pmam_extract", "pmam_gmm", "pmam_pseudo_labels", "pmam_train"):
            assert main([stage] + args) == 0, stage
        assert os.path.exists(f"{run}/gmm_means.npy")
        assert len(os.listdir(f"{run}/pseudo_labels")) == 4
        assert any("best_student" in p for p in os.listdir(f"{run}/best"))
