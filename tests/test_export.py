"""AOT serving artifacts (recipes/export.py): jax.export roundtrip +
config-free serving through the CLI.

The exported StableHLO program must reproduce the live serving forward
bit-for-bit on the same backend, and `serve --exported` must score a
directory with no model code/config/checkpoint in the loop.
"""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

SR = 32000
CLIP_SECONDS = 1.2
N_SAMPLES = int(SR * CLIP_SECONDS)
CLASSES = ["beep", "noise"]

TINY_INIT = {
    "class_num": 2, "embed_dim": 32, "decoder_dim": 32, "backbone_depth": 2,
    "backbone_num_heads": 4, "decoder_num_heads": 4, "at_adapter_heads": 4,
    "passt_feature_layer": 2, "decoder": "transformerXL", "decoder_layer_num": 1,
    "decoder_pos_emd_len": 120, "at_adapter": True,
}


def tiny_config():
    return {
        "generals": {"num_workers": 0},
        "model_name": "PaSST_SED",
        "feature": {
            "pred_len": 120, "sr": SR, "hopsize": 320, "n_fft": 1024,
            "audio_max_len": CLIP_SECONDS, "net_subsample": 1,
        },
        "dataset": {"labels": CLASSES},
        "training": {"median_window": [5, 5]},
        "PaSST_SED": {"init_kwargs": TINY_INIT, "test_kwargs": {"temp_w": 0.5}},
    }


def build_tiny():
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model

    config = tiny_config()
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    mel = frontend.normalize(frontend(jnp.zeros((1, N_SAMPLES))))
    params = model.init({"params": jax.random.PRNGKey(0)}, mel)["params"]
    return config, codec, model, frontend, params


class TestExportRoundtrip:
    def test_exported_matches_live_forward(self, tmp_path):
        from transformer4sed_tpu.core.filters import apply_class_filter
        from transformer4sed_tpu.recipes.export import (
            export_serving_forward,
            load_exported,
            write_artifact,
        )

        config, codec, model, frontend, params = build_tiny()
        median = [5, 5]
        kwargs = config["PaSST_SED"]["test_kwargs"]
        blob = export_serving_forward(
            model, frontend, params, codec, batch_size=2,
            median_filter=median, model_kwargs=kwargs,
        )
        path = str(tmp_path / "tiny.jaxexp")
        meta = write_artifact(path, blob, codec, batch_size=2)
        assert meta["pred_len"] == codec.n_frames == 120

        exp, meta2 = load_exported(path)
        assert meta2["labels"] == CLASSES

        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(2, N_SAMPLES).astype(np.float32) * 0.05)
        pm = jnp.zeros((2, codec.n_frames), bool)
        got_scores, got_weak = exp.call(wav, pm)

        mel = frontend.normalize(frontend(wav))
        out = model.apply({"params": params}, mel, pad_mask=pm, **kwargs)
        want_scores = apply_class_filter(
            jnp.transpose(out.strong, (0, 2, 1)), tuple(median), kind="median")
        # 1e-5: the exported program and the live jit compile with
        # different fusion orders; diffs are f32 rounding (~1e-6)
        np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_weak), np.asarray(out.weak),
                                   atol=1e-5)

    def test_codec_from_meta_consistency_check(self, tmp_path):
        from transformer4sed_tpu.recipes.export import codec_from_meta

        from transformer4sed_tpu.recipes import common

        codec = common.codec_from_config(tiny_config())
        meta = {
            "labels": CLASSES, "sr": SR, "audio_len": CLIP_SECONDS,
            "frame_len": 1024, "frame_hop": 320, "net_pooling": 1,
            "pred_len": codec.n_frames,
        }
        rebuilt = codec_from_meta(meta)
        assert rebuilt.n_frames == codec.n_frames
        assert rebuilt.labels == codec.labels
        meta["pred_len"] = codec.n_frames + 2
        with pytest.raises(ValueError, match="inconsistent"):
            codec_from_meta(meta)


class TestExportServeCLI:
    def test_export_then_serve_without_config(self, tmp_path):
        """Full production cycle: orbax ckpt -> export CLI -> artifact ->
        serve CLI with --exported only (no config/ckpt/model code)."""
        import yaml

        from transformer4sed_tpu.recipes import export as export_cli
        from transformer4sed_tpu.recipes import serve as serve_cli
        from transformer4sed_tpu.utils.checkpoint import save_params

        config, codec, model, frontend, params = build_tiny()
        cfg_path = tmp_path / "config.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(config, f)
        ckpt = tmp_path / "params"
        save_params(str(ckpt), params)

        artifact = tmp_path / "model.jaxexp"
        rc = export_cli.main([
            "--config_dir", str(cfg_path), "--ckpt", str(ckpt),
            "--out", str(artifact), "--batch_size", "2",
        ])
        assert rc == 0
        assert artifact.exists() and (tmp_path / "model.jaxexp.meta.json").exists()

        wav_dir = tmp_path / "clips"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(1)
        for i in range(3):  # 3 clips: one full batch of 2 + a padded tail
            wav = rng.randn(N_SAMPLES).astype(np.float32) * 0.05
            wavfile.write(str(wav_dir / f"c{i}.wav"), SR,
                          (wav * 32767).astype(np.int16))

        out_dir = tmp_path / "scores"
        serve_cli.main([
            "--exported", str(artifact),
            "--wav_dir", str(wav_dir), "--out_dir", str(out_dir),
        ])
        tsvs = sorted(p for p in os.listdir(out_dir) if p.endswith(".tsv"))
        assert tsvs == ["c0.tsv", "c1.tsv", "c2.tsv"]
        with open(out_dir / "events.jsonl") as f:
            lines = [json.loads(ln) for ln in f]
        assert {l["filename"] for l in lines} == {"c0.wav", "c1.wav", "c2.wav"}
        # score table geometry matches the sidecar
        rows = np.loadtxt(out_dir / "c0.tsv", skiprows=1)
        assert rows.shape == (codec.n_frames, 2 + len(CLASSES))

    def test_serve_rejects_mixed_modes(self, tmp_path):
        from transformer4sed_tpu.recipes import serve as serve_cli

        with pytest.raises(SystemExit):
            serve_cli.main([
                "--exported", "x.jaxexp", "--config_dir", "c.yaml",
                "--wav_dir", str(tmp_path), "--out_dir", str(tmp_path),
            ])
        with pytest.raises(SystemExit):
            serve_cli.main(["--wav_dir", str(tmp_path), "--out_dir", str(tmp_path)])
