"""Shipped-config smoke tests (VERDICT r4 item 8): every CLI stage has
a runnable starting-point YAML under ``config/``.

Two layers per config:

* **full-size schema**: the YAML's ``init_kwargs`` must construct the
  model and produce output geometry consistent with the YAML's
  ``feature`` section — checked shape-only via ``jax.eval_shape`` (no
  full-size compute on the test host).
* **end-to-end**: the stage runs through ``recipes.cli`` on a synthetic
  447-class mini-AudioSet built from the VENDORED label tables
  (``meta/audioset_strong``), with only dataset paths and scale knobs
  (batch size, samples/epoch, epochs, model width/depth) overridden —
  the training/opt/dataset schema exercised is the shipped one.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml
from scipy.io import wavfile

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 32000
N_SAMPLES = 10 * SR


def _load_config(rel):
    with open(os.path.join(REPO, "config", rel)) as f:
        return yaml.safe_load(f)


@pytest.fixture(scope="module")
def class_names():
    with open(os.path.join(REPO, "meta/audioset_strong/labeldict_audioset_strong.json")) as f:
        label_dict = json.load(f)
    with open(os.path.join(REPO, "meta/audioset_strong/state.json")) as f:
        state = json.load(f)
    # events drawn from COMMON classes so the common-only trainers
    # (clap_train) have supervision for every synthetic event
    common = [k for k, v in state.items() if v == "common"][:3]
    return {"all": list(label_dict), "events": common}


@pytest.fixture(scope="module")
def mini_audioset_447(tmp_path_factory, class_names):
    """4 train + 3 val 10-s clips labeled with REAL AudioSet class names."""
    root = tmp_path_factory.mktemp("mini_as447")
    rng = np.random.RandomState(0)

    def write(folder, name):
        os.makedirs(root / folder, exist_ok=True)
        wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.02
        wavfile.write(str(root / folder / name), SR, (wav * 32767).astype(np.int16))

    train_rows, val_rows, dur_rows = [], [], []
    for i in range(8):
        name = f"t{i}.wav"
        write("train", name)
        train_rows.append((name, 0.5, 4.0, class_names["events"][i % 3]))
    for i in range(4):
        name = f"v{i}.wav"
        write("val", name)
        val_rows.append((name, 1.0, 5.0, class_names["events"][i % 3]))
        dur_rows.append((name, 10.0))
    pd.DataFrame(train_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        root / "train.tsv", sep="\t", index=False)
    pd.DataFrame(val_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        root / "val.tsv", sep="\t", index=False)
    pd.DataFrame(dur_rows, columns=["filename", "duration"]).to_csv(
        root / "dur.tsv", sep="\t", index=False)
    return str(root)


def _scale_down(config, root, tmp_path):
    """Dataset paths -> synthetic tree; scale knobs -> test size. The
    schema under test (sections, keys, model kwargs shape) is shipped."""
    config["dataset"].update({
        "train_folder": f"{root}/train", "train_tsv": f"{root}/train.tsv",
        "val_folder": f"{root}/val", "val_tsv": f"{root}/val.tsv",
        "val_dur": f"{root}/dur.tsv",
    })
    config["dataset"].pop("weight_tsv", None)  # weights name real AS clips
    config["generals"]["num_workers"] = 0
    tr = config["training"]
    tr["batch_size"] = [8]
    tr["batch_size_val"] = 4
    tr.pop("samples_per_epoch", None)
    tr["scheduler"]["n_epochs"] = 1
    return config


def _write(config, tmp_path, name):
    p = tmp_path / name
    with open(p, "w") as f:
        yaml.safe_dump(config, f)
    return str(p)


SMALL_SWIN = dict(spec_size=256, patch_size=4, patch_stride=(4, 4),
                  num_classes=447, embed_dim=32, depths=(1, 1, 2, 1),
                  num_heads=(2, 2, 4, 4), window_size=2, mel_bins=64)


class TestHTSATCNNConfig:
    REL = "audioset_strong/htsat_cnn.yaml"

    def test_full_size_schema_and_geometry(self):
        from transformer4sed_tpu.recipes import common
        from transformer4sed_tpu.recipes.cli import build_model

        config = _load_config(self.REL)
        model, frontend = build_model(config)
        codec = common.codec_from_config(
            config, labels=[f"c{i}" for i in range(447)])
        assert codec.n_frames == config["feature"]["pred_len"] == 320
        t_mel = N_SAMPLES // frontend.hop_length + 1
        mel = jax.ShapeDtypeStruct((1, 1, t_mel, frontend.n_mels), jnp.float32)
        variables = jax.eval_shape(
            lambda m: model.init({"params": jax.random.PRNGKey(0)}, m), mel)
        out = jax.eval_shape(
            lambda v, m: model.apply(v, m, mutable=["batch_stats"])[0], variables, mel)
        # shipped pred_len must equal the full-size model's output grid
        assert out.strong.shape == (1, 447, config["feature"]["pred_len"])

    def test_e2e_cli(self, mini_audioset_447, tmp_path):
        from transformer4sed_tpu.recipes.cli import main

        config = _scale_down(_load_config(self.REL), mini_audioset_447, tmp_path)
        config["HTSAT_CNN"]["init_kwargs"].update(
            decoder_dim=32, num_heads=4, decoder_layer_num=1,
            htsat_kwargs=dict(SMALL_SWIN),
            cnn_param=dict(nb_filters=[8, 8], pooling=[[1, 8], [1, 8]],
                           normalization="layer", activation="glu"),
        )
        rc = main([
            "audioset_supervised", "--config_dir",
            _write(config, tmp_path, "htsat_cnn.yaml"),
            "--save_folder", str(tmp_path / "run"), "--random_seed", "0",
        ])
        assert rc == 0
        log = (tmp_path / "run" / "log.txt").read_text()
        assert "epoch 1:" in log


class TestPaSSTCNNConfig:
    """The pre-existing shipped config, now under the same full-size
    geometry gate (it shipped r4 with 4 nb_filters and no per-layer
    kernel_size/padding/stride — an IndexError at full size that this
    test caught; fixed by listing the geometry per conv layer)."""

    REL = "audioset_strong/passt_cnn.yaml"

    def test_full_size_schema_and_geometry(self):
        from transformer4sed_tpu.recipes import common
        from transformer4sed_tpu.recipes.cli import build_model

        config = _load_config(self.REL)
        model, frontend = build_model(config)
        codec = common.codec_from_config(
            config, labels=[f"c{i}" for i in range(447)])
        assert codec.n_frames == config["feature"]["pred_len"] == 1000
        mel = jax.ShapeDtypeStruct((1, 128, 998), jnp.float32)
        variables = jax.eval_shape(
            lambda m: model.init({"params": jax.random.PRNGKey(0)}, m), mel)
        out = jax.eval_shape(lambda v, m: model.apply(v, m), variables, mel)
        assert out.strong.shape == (1, 447, config["feature"]["pred_len"])


class TestClapConfig:
    REL = "clap/clap.yaml"

    def test_full_size_schema_and_geometry(self):
        from transformer4sed_tpu.recipes import common
        from transformer4sed_tpu.recipes.cli import build_model

        config = _load_config(self.REL)
        model, frontend = build_model(config)
        codec = common.codec_from_config(
            config, labels=[f"c{i}" for i in range(447)])
        assert codec.n_frames == config["feature"]["pred_len"] == 32
        t_mel = N_SAMPLES // frontend.hop_length + 1
        mel = jax.ShapeDtypeStruct((1, 1, t_mel, frontend.n_mels), jnp.float32)
        variables = jax.eval_shape(
            lambda m: model.init({"params": jax.random.PRNGKey(0)}, m), mel)
        out = jax.eval_shape(lambda v, m: model.apply(v, m), variables, mel)
        # CLAP scores on the raw fine-grained grid (no x10 interp)
        assert out.strong.shape == (1, 447, config["feature"]["pred_len"])

    def test_e2e_cli(self, mini_audioset_447, tmp_path):
        from transformer4sed_tpu.recipes.cli import main

        config = _scale_down(_load_config(self.REL), mini_audioset_447, tmp_path)
        bank = tmp_path / "text_bank.npy"
        np.save(bank, np.random.RandomState(1).randn(447, 512).astype(np.float32))
        config["dataset"]["query_bank"] = str(bank)
        # shrunken Swin: fine_grained dim = embed_dim * 8 = 256
        config["CLAP_SED"]["init_kwargs"].update(
            embed_dim=256, htsat_kwargs=dict(SMALL_SWIN))
        rc = main([
            "clap_train", "--config_dir", _write(config, tmp_path, "clap.yaml"),
            "--save_folder", str(tmp_path / "run"), "--random_seed", "0",
        ])
        assert rc == 0
        log = (tmp_path / "run" / "log.txt").read_text()
        assert "epoch 1:" in log


class TestDASMClosedSetConfig:
    REL = "dasm/closed_set.yaml"

    def test_full_size_schema_and_geometry(self):
        from transformer4sed_tpu.recipes import common
        from transformer4sed_tpu.recipes.cli import build_model

        config = _load_config(self.REL)
        assert config["DASM"]["at_param"]["out_type"] == "logit"  # CE head
        model, frontend = build_model(config)
        codec = common.codec_from_config(
            config, labels=[f"c{i}" for i in range(447)])
        assert codec.n_frames == config["feature"]["pred_len"] == 1000
        mel = jax.ShapeDtypeStruct((1, 128, 998), jnp.float32)
        q = [jax.ShapeDtypeStruct((447, d), jnp.float32)
             for d in config["DASM"]["init_kwargs"]["query_dim"]]
        variables = jax.eval_shape(
            lambda m, q: model.init({"params": jax.random.PRNGKey(0)}, m, query=q),
            mel, q)
        out = jax.eval_shape(
            lambda v, m, q: model.apply(v, m, query=q, query_type=None),
            variables, mel, q)
        assert out.strong.shape == (1, 447, 1000)
        assert out.at_out.shape == (1, 447, 448)  # (C+1)-way logits

    def test_e2e_cli(self, mini_audioset_447, tmp_path):
        from transformer4sed_tpu.recipes.cli import main

        config = _scale_down(_load_config(self.REL), mini_audioset_447, tmp_path)
        for key, dim in (("text_query", 512), ("audio_query", 768)):
            p = tmp_path / f"{key}.npy"
            np.save(p, np.random.RandomState(2).randn(447, dim).astype(np.float32))
            config["dataset"][key] = str(p)
        config["DASM"]["init_kwargs"].update(
            embed_dim=32, backbone_depth=2, backbone_num_heads=4,
            passt_feature_layer=2, decoder_dim=32, num_heads=4,
            decoder_layer_num=1, at_decoder_layer=1, f_pool_heads=4,
        )
        rc = main([
            "dasm_train", "--config_dir", _write(config, tmp_path, "dasm.yaml"),
            "--save_folder", str(tmp_path / "run"), "--random_seed", "0",
        ])
        assert rc == 0
        log = (tmp_path / "run" / "log.txt").read_text()
        assert "epoch 1:" in log
