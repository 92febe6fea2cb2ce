"""Query-bank CLI: text bank assembly, encoder plug-point, audio
prototypes, and the full text-labels -> bank -> open-vocab serve chain
(the reference's ``detect_any_sound.ipynb`` cells 3/11 as a production
path)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from transformer4sed_tpu.recipes import queries

KEY = jax.random.PRNGKey(0)


def _write_labels(path, labels):
    with open(path, "w") as f:
        f.write("\n".join(labels) + "\n")


class TestBuildText:
    def test_from_npz_prompted_names(self, tmp_path, capsys):
        labels = ["dog", "cat", "rain"]
        _write_labels(tmp_path / "labels.txt", labels)
        emb = np.arange(12, dtype=np.float32).reshape(4, 3)
        names = np.array(["sound of cat", "sound of dog", "unused", "rain"])
        np.savez(tmp_path / "table.npz", names=names, embeddings=emb)
        out = tmp_path / "bank.npy"
        rc = queries.main([
            "build_text", "--labels", str(tmp_path / "labels.txt"),
            "--embeddings", str(tmp_path / "table.npz"), "--out", str(out),
        ])
        assert rc == 0
        bank = np.load(out)
        # config order: dog <- row 1, cat <- row 0, rain <- bare-name row 3
        np.testing.assert_array_equal(bank, emb[[1, 0, 3]])
        sidecar = (tmp_path / "bank_names.txt").read_text().split()
        assert sidecar == labels

    def test_labeldict_json_order(self, tmp_path):
        with open(tmp_path / "dict.json", "w") as f:
            json.dump({"b": 1, "a": 0, "c": 2}, f)
        emb = np.eye(3, dtype=np.float32)
        np.savez(tmp_path / "t.npz",
                 names=np.array(["a", "b", "c"]), embeddings=emb)
        queries.main([
            "build_text", "--labels", str(tmp_path / "dict.json"),
            "--embeddings", str(tmp_path / "t.npz"),
            "--out", str(tmp_path / "bank.npy"),
        ])
        np.testing.assert_array_equal(np.load(tmp_path / "bank.npy"), emb)

    def test_missing_label_raises_without_encoder(self, tmp_path):
        _write_labels(tmp_path / "labels.txt", ["dog", "unicorn"])
        np.savez(tmp_path / "t.npz", names=np.array(["dog"]),
                 embeddings=np.ones((1, 2), np.float32))
        with pytest.raises(ValueError, match="unicorn"):
            queries.main([
                "build_text", "--labels", str(tmp_path / "labels.txt"),
                "--embeddings", str(tmp_path / "t.npz"),
                "--out", str(tmp_path / "bank.npy"),
            ])

    def test_text_encoder_plug_point(self, tmp_path, monkeypatch):
        """Labels missing from the table go through --text_encoder
        pkg.module:fn with the prompt prepended (the MGA-CLAP slot)."""
        (tmp_path / "fake_clap.py").write_text(
            "import numpy as np\n"
            "def encode(prompts):\n"
            "    assert all(p.startswith('sound of ') for p in prompts)\n"
            "    return np.asarray([[float(len(p)), 1.0] for p in prompts])\n"
        )
        monkeypatch.syspath_prepend(str(tmp_path))
        _write_labels(tmp_path / "labels.txt", ["dog", "unicorn"])
        np.savez(tmp_path / "t.npz", names=np.array(["sound of dog"]),
                 embeddings=np.full((1, 2), 7.0, np.float32))
        queries.main([
            "build_text", "--labels", str(tmp_path / "labels.txt"),
            "--embeddings", str(tmp_path / "t.npz"),
            "--out", str(tmp_path / "bank.npy"),
            "--text_encoder", "fake_clap:encode",
        ])
        bank = np.load(tmp_path / "bank.npy")
        np.testing.assert_array_equal(bank[0], [7.0, 7.0])
        np.testing.assert_array_equal(bank[1], [float(len("sound of unicorn")), 1.0])

    def test_npy_table_with_names_and_normalize(self, tmp_path):
        _write_labels(tmp_path / "labels.txt", ["a", "b"])
        np.save(tmp_path / "emb.npy", np.array([[3.0, 4.0], [0.0, 5.0]], np.float32))
        _write_labels(tmp_path / "enames.txt", ["a", "b"])
        queries.main([
            "build_text", "--labels", str(tmp_path / "labels.txt"),
            "--embeddings", str(tmp_path / "emb.npy"),
            "--embedding_names", str(tmp_path / "enames.txt"),
            "--out", str(tmp_path / "bank.npy"), "--normalize",
        ])
        bank = np.load(tmp_path / "bank.npy")
        np.testing.assert_allclose(np.linalg.norm(bank, axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(bank[0], [0.6, 0.8], atol=1e-6)


class TestExtractAudioCLI:
    def test_htsat_prototypes(self, tmp_path):
        """extract_audio end-to-end: tiny HTSAT_CNN checkpoint + 2 labelled
        clips -> [C, D] prototype bank with nonzero rows for seen classes."""
        import pandas as pd
        from scipy.io import wavfile

        from transformer4sed_tpu.models.htsat import HTSATFrontend
        from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
        from transformer4sed_tpu.utils.checkpoint import save_params

        sr, dur = 32000, 1.2
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        rows = []
        for i, cls in enumerate(["a", "b"]):
            wav = (rng.randn(int(dur * sr)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"c{i}.wav"), sr, wav)
            rows.append({"filename": f"c{i}.wav", "onset": 0.0, "offset": 1.0,
                         "event_label": cls})
        pd.DataFrame(rows).to_csv(tmp_path / "strong.tsv", sep="\t", index=False)

        init_kwargs = dict(
            class_num=2, decoder_dim=32, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=512, htsat_config="tiny",
        )
        model = HTSAT_CNN(**init_kwargs)
        frontend = HTSATFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(dur * sr)))))
        variables = model.init({"params": KEY}, mel)
        ckpt = tmp_path / "best" / "best_student"
        save_params(str(ckpt), variables["params"])
        save_params(str(tmp_path / "best" / "best_model_state"),
                    {k: v for k, v in variables.items() if k != "params"})

        config = {
            "model_name": "HTSAT_CNN",
            "HTSAT_CNN": {"init_kwargs": init_kwargs},
            "feature": {"pred_len": 320, "sr": sr, "hopsize": 320, "n_fft": 1024,
                        "audio_max_len": dur, "net_subsample": 120.0 / 320.0},
            "dataset": {"labels": ["a", "b"]},
        }
        with open(tmp_path / "cfg.yaml", "w") as f:
            yaml.safe_dump(config, f)

        out = tmp_path / "audio_queries.npy"
        rc = queries.main([
            "extract_audio", "--config_dir", str(tmp_path / "cfg.yaml"),
            "--ckpt", str(ckpt), "--tsv", str(tmp_path / "strong.tsv"),
            "--wav_dir", str(wav_dir), "--out", str(out),
            "--batch_size", "2", "--num_workers", "0",
        ])
        assert rc == 0
        bank = np.load(out)
        assert bank.shape[0] == 2 and bank.shape[1] > 0
        assert np.abs(bank).sum(axis=1).min() > 0  # both classes observed


class TestBankToServeChain:
    def test_open_vocab_serve_from_text_labels(self, tmp_path):
        """The VERDICT 'done' criterion: an open-vocab serve run driven
        end-to-end from text labels + an embedding file (no hand-built
        query tensors)."""
        from scipy.io import wavfile

        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes import serve
        from transformer4sed_tpu.utils.checkpoint import save_params

        labels = ["dog_bark", "car_horn", "siren", "speech"]
        _write_labels(tmp_path / "labels.txt", labels)
        rng = np.random.RandomState(1)
        table = rng.randn(4, 16).astype(np.float32)
        np.savez(tmp_path / "table.npz",
                 names=np.array([f"sound of {l}" for l in labels]),
                 embeddings=table)
        queries.main([
            "build_text", "--labels", str(tmp_path / "labels.txt"),
            "--embeddings", str(tmp_path / "table.npz"),
            "--out", str(tmp_path / "bank.npy"),
        ])

        sr, dur = 32000, 1.2
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        for i in range(2):
            wav = (rng.randn(int(dur * sr)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"q{i}.wav"), sr, wav)

        dasm_kwargs = dict(
            class_num=4, decoder_dim=32, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=120, embed_dim=32,
            backbone_depth=2, backbone_num_heads=4, passt_feature_layer=2,
            at_decoder_layer=1, f_pool_heads=4, out_type="sigmoid", cnn_param=None,
            query_projector=True, query_dim=16,
        )
        config = {
            "model_name": "DASM",
            "feature": {"pred_len": 120, "sr": sr, "hopsize": 320, "n_fft": 1024,
                        "audio_max_len": dur, "net_subsample": 1},
            "dataset": {"labels": labels},
            "training": {"median_window": 3},
            "DASM": {"init_kwargs": dasm_kwargs, "test_kwargs": {"temp_w": 0.5}},
        }
        with open(tmp_path / "cfg.yaml", "w") as f:
            yaml.safe_dump(config, f)
        model = tiny_dasm(**dasm_kwargs)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(dur * sr)))))
        params = model.init(
            {"params": KEY}, mel, query=jnp.asarray(table), query_type="text"
        )["params"]
        save_params(str(tmp_path / "ckpt"), params)

        out_dir = tmp_path / "out"
        serve.main([
            "--config_dir", str(tmp_path / "cfg.yaml"),
            "--ckpt", str(tmp_path / "ckpt"),
            "--wav_dir", str(wav_dir), "--out_dir", str(out_dir),
            "--batch_size", "2",
            "--query", str(tmp_path / "bank.npy"), "--query_type", "text",
            "--query_names", str(tmp_path / "bank_names.txt"),
        ])
        header = (out_dir / "q0.tsv").read_text().splitlines()[0].split("\t")
        assert header == ["onset", "offset"] + labels

    def test_query_row_mismatch_without_names_errors(self, tmp_path):
        """--query with a row count differing from the config class list and
        no --query_names must die with a clear CLI error, not a shape
        assert deep in ClipScores (round-1 advisor finding)."""
        from transformer4sed_tpu.recipes import serve

        np.save(tmp_path / "q.npy", np.zeros((7, 16), np.float32))
        config = {
            "model_name": "DASM",
            "feature": {"pred_len": 120, "sr": 32000, "hopsize": 320,
                        "n_fft": 1024, "audio_max_len": 1.2, "net_subsample": 1},
            "dataset": {"labels": ["a", "b"]},
            "DASM": {"init_kwargs": {}},
        }
        with open(tmp_path / "cfg.yaml", "w") as f:
            yaml.safe_dump(config, f)
        with pytest.raises(SystemExit):
            serve.main([
                "--config_dir", str(tmp_path / "cfg.yaml"),
                "--ckpt", str(tmp_path / "nope"),
                "--wav_dir", str(tmp_path), "--out_dir", str(tmp_path / "o"),
                "--query", str(tmp_path / "q.npy"),
            ])
