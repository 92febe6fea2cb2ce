"""Full 3-stage MAT-SED pipeline through the shipped shell runner.

Drives ``exps/mat-sed/train.sh`` (pretrain -> finetune1 -> finetune2
with best-checkpoint hand-off and ``--resume_ckpt auto`` re-entrancy)
end-to-end on a synthetic mini-DESED with tiny configs — the systems
test for the reference's ``exps/mat-sed/base/train.sh`` staging
(SURVEY.md §1 layer 6), covering warm-start key-dropping between MLM
and fine-tune models and the sliding-window stage's window fusion.
"""

import copy
import os
import subprocess

import pytest
import yaml

from tests.test_recipes_e2e import CLASSES, CLIP_SECONDS, SR, make_config, mini_desed  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_INIT = {
    "class_num": 2, "embed_dim": 32, "decoder_dim": 32,
    "backbone_depth": 2, "backbone_num_heads": 4, "decoder_num_heads": 4,
    "at_adapter_heads": 4, "passt_feature_layer": 2,
    "decoder": "transformerXL", "decoder_layer_num": 1,
    "decoder_pos_emd_len": 120,
}


def test_three_stage_pipeline(mini_desed, tmp_path):  # noqa: F811
    base = make_config(mini_desed)

    pretrain = copy.deepcopy(base)
    pretrain["training"]["batch_size"] = [1, 1, 2]
    pretrain["training"]["transform"]["n_transform"] = 1
    pretrain["dataset"]["strong_folder"] = f"{mini_desed['root']}/strong"
    pretrain["PaSST_SED"] = {
        "init_kwargs": {
            **TINY_INIT, "at_adapter": False, "mlm": True,
            "mlm_dict": {"mask_rate": 0.75, "mask_style": [0.8, 0.1, 0.1],
                         "strategy": "block", "block_width": 4, "out_dim": 32},
        },
        "train_kwargs": {},
    }
    pretrain["opt"] = {"param_groups": {
        "encoder": {"lr": 0, "weight_decay": 1.0e-4, "freeze_layer": 0, "step_lr": 0},
        "decoder": {"lr": 2.0e-4, "weight_decay": 1.0e-4},
        "head": {"lr": 2.0e-4, "weight_decay": 1.0e-4},
    }}

    finetune1 = copy.deepcopy(base)
    finetune1["PaSST_SED"]["init_kwargs"] = {**TINY_INIT, "at_adapter": True}

    finetune2 = copy.deepcopy(finetune1)
    win = {"encoder_win": True, "win_param": [80, 40], "mix_rate": 0.5}
    finetune2["PaSST_SED"]["train_stu_kwargs"] = {**win, "temp_w": 1}
    finetune2["PaSST_SED"]["train_tch_kwargs"] = {**win, "temp_w": 1}
    finetune2["PaSST_SED"]["val_kwargs"] = {**win, "temp_w": 0.5}
    finetune2["PaSST_SED"]["test_kwargs"] = {**win, "temp_w": 0.5}

    cfg_dir = tmp_path / "configs"
    os.makedirs(cfg_dir)
    for name, cfg in (("pretrain", pretrain), ("finetune1", finetune1),
                      ("finetune2", finetune2)):
        with open(cfg_dir / f"{name}.yaml", "w") as f:
            yaml.safe_dump(cfg, f)

    exp_dir = tmp_path / "exp"
    env = {**os.environ, "CONFIG_DIR": str(cfg_dir), "JAX_PLATFORMS": "cpu",
           "MAX_RETRIES": "1", "PYTHONPATH": REPO}
    r = subprocess.run(
        ["bash", os.path.join(REPO, "exps/mat-sed/train.sh"), str(exp_dir), "7"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    # every stage produced its best checkpoint and handed it off
    for stage in ("pretrain", "finetune1", "finetune2"):
        assert (exp_dir / stage / "log.txt").exists(), stage
        assert (exp_dir / stage / "best" / "best_student").exists(), stage
    ft2_log = (exp_dir / "finetune2" / "log.txt").read_text()
    assert "warm-started from" in ft2_log
    assert "psds1" in ft2_log


def test_pmam_pipeline(mini_desed, tmp_path):  # noqa: F811
    """Full PMAM staging through exps/pmam/train.sh: MLM checkpoint ->
    tokenizer (extract -> GMM -> pseudo-labels) -> prototype-BCE
    post-pretrain (separate save folder, tokenizer outputs passed by the
    new --gmm_means_path/--pseudo_label_dir flags) -> mean-teacher
    finetune1/2 with checkpoint hand-off."""
    base = make_config(mini_desed)

    mlm_init = {
        **TINY_INIT, "at_adapter": False, "mlm": True,
        "mlm_dict": {"mask_rate": 0.75, "mask_style": [0.8, 0.1, 0.1],
                     "strategy": "block", "block_width": 4, "out_dim": 32},
    }

    # stage 0 (outside the script, like the reference's mat-sed mlm stage):
    # produce the MLM checkpoint the PMAM tokenizer consumes
    pre = copy.deepcopy(base)
    pre["training"]["batch_size"] = [1, 1, 2]
    pre["training"]["transform"]["n_transform"] = 1
    pre["PaSST_SED"] = {"init_kwargs": mlm_init, "train_kwargs": {}}
    pre["opt"] = {"param_groups": {
        "encoder": {"lr": 0, "weight_decay": 1.0e-4, "freeze_layer": 0, "step_lr": 0},
        "decoder": {"lr": 2.0e-4, "weight_decay": 1.0e-4},
        "head": {"lr": 2.0e-4, "weight_decay": 1.0e-4},
    }}

    post = copy.deepcopy(base)
    post["PaSST_SED"] = {"init_kwargs": mlm_init, "train_kwargs": {}}
    post["training"]["batch_size"] = 2
    post["training"]["w_AT"] = 0.0
    post["dataset"]["unlabeled_folder"] = f"{mini_desed['root']}/unlabeled"
    post["pmam"] = {"feature_layer": "transformer_0", "downsample_rate": 4,
                    "n_components": 3, "covariance_type": "diag", "n_iter": 5,
                    "temperature": 0.1}
    post["opt"] = {"lora_trainable": False, "param_groups": {
        "encoder": {"lr": 0, "weight_decay": 1.0e-4},
        "decoder": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
        "head": {"lr": 1.0e-3, "weight_decay": 1.0e-4},
    }}

    ft1 = copy.deepcopy(base)
    ft1["PaSST_SED"]["init_kwargs"] = {**TINY_INIT, "at_adapter": True}
    ft2 = copy.deepcopy(ft1)

    cfg_dir = tmp_path / "configs"
    os.makedirs(cfg_dir)
    for name, cfg in (("pretrain", pre), ("post_pretrain", post),
                      ("finetune1", ft1), ("finetune2", ft2)):
        with open(cfg_dir / f"{name}.yaml", "w") as f:
            yaml.safe_dump(cfg, f)

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "MAX_RETRIES": "1"}
    mlm_dir = tmp_path / "mlm"
    r = subprocess.run(
        ["python", "-m", "transformer4sed_tpu.recipes.cli", "matsed_pretrain",
         "--config_dir", str(cfg_dir / "pretrain.yaml"),
         "--save_folder", str(mlm_dir), "--random_seed", "7"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    exp_dir = tmp_path / "exp"
    env.update({
        "CONFIG": str(cfg_dir / "post_pretrain.yaml"),
        "FT1_CONFIG": str(cfg_dir / "finetune1.yaml"),
        "FT2_CONFIG": str(cfg_dir / "finetune2.yaml"),
        "MLM_CKPT": str(mlm_dir / "best" / "best_student"),
    })
    r = subprocess.run(
        ["bash", os.path.join(REPO, "exps/pmam/train.sh"), str(exp_dir), "7"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    assert (exp_dir / "tokenizer" / "gmm_means.npy").exists()
    assert len(os.listdir(exp_dir / "tokenizer" / "pseudo_labels")) == 4
    for stage in ("post_pretrain", "finetune1", "finetune2"):
        assert (exp_dir / stage / "best" / "best_student").exists(), stage
    assert "psds1" in (exp_dir / "finetune2" / "log.txt").read_text()


def test_dasm_pipeline(tmp_path):
    """DASM staging through exps/dasm/train.sh: closed-set training ->
    open-vocabulary AS-partial (common classes only) -> zero-shot
    open-set evaluation with a novel query — one config drives all
    three stages, checkpoints chain via best_student."""
    import json

    import numpy as np
    import pandas as pd
    from scipy.io import wavfile

    sr, dur = 32000, 1.2
    n = int(sr * dur)
    rng = np.random.RandomState(0)
    classes = ["dog", "cat", "rain"]
    root = tmp_path / "data"

    def rows(folder, count, prefix):
        os.makedirs(root / folder, exist_ok=True)
        out = []
        for i in range(count):
            wav = (rng.randn(n) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(root / folder / f"{prefix}{i}.wav"), sr, wav)
            out.append((f"{prefix}{i}.wav", 0.2, 0.9, classes[i % 3]))
        return out

    pd.DataFrame(rows("train", 4, "t"),
                 columns=["filename", "onset", "offset", "event_label"]).to_csv(
        root / "train.tsv", sep="\t", index=False)
    val_rows = rows("val", 2, "v")
    pd.DataFrame(val_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        root / "val.tsv", sep="\t", index=False)
    pd.DataFrame([(r[0], dur) for r in val_rows],
                 columns=["filename", "duration"]).to_csv(
        root / "val_dur.tsv", sep="\t", index=False)

    with open(root / "labeldict.json", "w") as f:
        json.dump({c: i for i, c in enumerate(classes)}, f)
    with open(root / "state.json", "w") as f:
        json.dump({"dog": "common", "cat": "common", "rain": "rare"}, f)
    with open(root / "openset_label.json", "w") as f:
        json.dump(["thunder"], f)
    np.save(root / "openset_emb.npy", rng.randn(1, 32).astype(np.float32))
    orows = pd.read_csv(root / "val.tsv", sep="\t")
    orows.loc[orows.index[-1], "event_label"] = "thunder"
    orows.to_csv(root / "openset.tsv", sep="\t", index=False)

    config = {
        "generals": {"num_workers": 0},
        "model_name": "DASM",
        "DASM": {
            "init_kwargs": {
                "class_num": 3, "decoder_dim": 32, "num_heads": 4,
                "decoder": "transformerXL", "decoder_layer_num": 1,
                "decoder_pos_emd_len": 120, "embed_dim": 32,
                "backbone_depth": 2, "backbone_num_heads": 4,
                "passt_feature_layer": 2, "at_decoder_layer": 1,
                "f_pool_heads": 4, "out_type": "sigmoid", "cnn_param": None,
            },
            "train_kwargs": {}, "val_kwargs": {}, "test_kwargs": {},
        },
        "feature": {"pred_len": 120, "sr": sr, "hopsize": 320, "n_fft": 1024,
                    "audio_max_len": dur, "net_subsample": 1},
        "dataset": {
            "label_dict_path": str(root / "labeldict.json"),
            "state_json": str(root / "state.json"),
            "train_tsv": str(root / "train.tsv"), "train_folder": str(root / "train"),
            "val_tsv": str(root / "val.tsv"), "val_folder": str(root / "val"),
            "val_dur": str(root / "val_dur.tsv"),
            "openset_label": str(root / "openset_label.json"),
            "openset_embedding": str(root / "openset_emb.npy"),
            "openset_tsv": str(root / "openset.tsv"),
            "openset_folder": str(root / "val"),
            "openset_dur": str(root / "val_dur.tsv"),
        },
        "training": {
            "batch_size": 2, "batch_size_val": 2, "num_samples": 4,
            "clip_grad": True, "median_window": 5, "w_AT": 1.0,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
        },
        "opt": {"param_groups": {
            "encoder": {"lr": 1e-4, "weight_decay": 1e-4},
            "decoder": {"lr": 1e-3, "weight_decay": 1e-4},
            "head": {"lr": 1e-3, "weight_decay": 1e-4},
        }},
    }
    cfg = tmp_path / "dasm.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)

    exp_dir = tmp_path / "exp"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "MAX_RETRIES": "1", "CONFIG": str(cfg)}
    r = subprocess.run(
        ["bash", os.path.join(REPO, "exps/dasm/train.sh"), str(exp_dir), "7"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    for stage in ("closed", "ov"):
        assert (exp_dir / stage / "best" / "best_student").is_dir(), stage
    assert "openset psds=" in (exp_dir / "openset" / "log.txt").read_text()
