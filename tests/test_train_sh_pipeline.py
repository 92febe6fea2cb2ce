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
