"""Tests: single-clip inference path + AudioSet supervised trainer driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.recipes.infer import infer_clip

KEY = jax.random.PRNGKey(0)


class TestInferClip:
    def test_events_from_tiny_model(self):
        from tests.test_recipes_e2e import tiny_sed_model
        from transformer4sed_tpu.frontend import PasstFrontend

        codec = LabelCodec(
            labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
        )
        model = tiny_sed_model(class_num=2)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
        params = model.init({"params": KEY}, mel)["params"]
        wav = np.random.RandomState(0).randn(32000).astype(np.float32)  # 1 s of 1.2 s
        events, strong, weak = infer_clip(
            model, frontend, params, wav, codec, threshold=0.5, median_filter=5,
            model_kwargs={"temp_w": 0.5},
        )
        assert strong.shape[0] == 2
        assert weak.shape == (2,)
        for label, onset, offset in events:
            assert label in ("a", "b")
            assert 0 <= onset < offset <= codec.audio_len


class TestSupervisedStep:
    def test_supervised_step_runs(self):
        from tests.test_train import tiny_frontend, tiny_model
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState
        import optax

        model = tiny_model()
        frontend = tiny_frontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 38081).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY}, mel)

        def model_apply(params, m, train=False, rngs=None, model_state=None, **kw):
            return model.apply({"params": params}, m, train=train, rngs=rngs, **kw), None

        tx = optax.adamw(1e-4)
        state = MLMState(
            params=variables["params"], opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        cfg = SupervisedConfig(loss_name="AslLoss", loss_kwargs={"rp": 0, "rn": 4, "margin": 0.05})
        step = jax.jit(make_supervised_step(model_apply, frontend, tx, cfg))
        labels = jnp.asarray((np.random.RandomState(1).rand(2, 3, 120) > 0.8).astype(np.float32))
        state, metrics = step(state, {"wav": wav, "labels": labels}, KEY)
        assert np.isfinite(float(metrics["loss_class_strong"]))


class TestAudioQueries:
    def test_extract_audio_queries(self):
        from transformer4sed_tpu.recipes.queries import extract_audio_queries

        rng = np.random.RandomState(0)
        d, c = 8, 3
        # class k embeddings cluster at mean k*10
        def embed_fn(wav):
            b = wav.shape[0]
            return jnp.asarray(rng.randn(b, 20, d).astype(np.float32)) + wav[:, :1, None] * 0

        batches = []
        for k in range(c):
            wav = np.zeros((2, 100), np.float32)
            labels = np.zeros((2, c, 20), np.float32)
            labels[:, k, :] = 1.0
            batches.append({"wav": wav, "label": labels})

        # deterministic embed: class index encoded in constant embedding
        def embed_const(wav):
            # identify class by call order via closure counter
            return jnp.full((wav.shape[0], 20, d), embed_const.k * 10.0)

        outs = []
        for k, batch in enumerate(batches):
            embed_const.k = k
            outs.append(
                extract_audio_queries(embed_const, [batch], n_classes=c, embed_dim=d)
            )
        # each single-batch result has mean k*10 in row k, zeros elsewhere
        for k, q in enumerate(outs):
            np.testing.assert_allclose(q[k], k * 10.0, atol=1e-5)
            other = [i for i in range(c) if i != k]
            np.testing.assert_allclose(q[other], 0.0, atol=1e-6)

    def test_cap_classes(self):
        from transformer4sed_tpu.recipes.queries import extract_audio_queries

        d, c = 4, 2
        def embed(wav):
            return jnp.ones((wav.shape[0], 10, d))

        batch = {"wav": np.zeros((1, 50), np.float32),
                 "label": np.ones((1, c, 10), np.float32)}
        # class 1 capped at threshold 0 -> first batch counts, second skipped
        q = extract_audio_queries(embed, [batch, batch], n_classes=c, embed_dim=d,
                                  cap_classes=[1], cap_threshold=0)
        np.testing.assert_allclose(q, 1.0, atol=1e-6)


class TestInferLongAudio:
    def test_sliding_overlap_add(self):
        """3 s of audio through a 1.2 s-window model: windows overlap-add
        into per-second segment scores and event decoding spans windows."""
        from tests.test_recipes_e2e import tiny_sed_model
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes.infer import infer_long_audio

        codec = LabelCodec(
            labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
        )
        model = tiny_sed_model(class_num=2)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
        params = model.init({"params": KEY}, mel)["params"]
        wav = np.random.RandomState(0).randn(3 * 32000).astype(np.float32) * 0.05
        events, seg_scores = infer_long_audio(
            model, frontend, params, wav, codec,
            threshold=0.3, median_filter=3, stride=0.6,
            model_kwargs={"temp_w": 0.5},
        )
        assert seg_scores.shape == (3, 2)  # ceil(3 s / 1 s) segments
        assert np.isfinite(seg_scores).all()
        for label, onset, offset in events:
            assert label in ("a", "b") and 0 <= onset < offset <= 3.0


class TestServeEngine:
    def test_batch_scoring_dir(self, tmp_path):
        """Compile-once engine scores a wav directory: TSVs in the
        sed_scores_eval layout + events JSONL; ragged tail batch padded."""
        import json
        import os

        from scipy.io import wavfile

        from tests.test_recipes_e2e import tiny_sed_model
        from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes.serve import InferenceEngine

        codec = LabelCodec(
            labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
        )
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        for i in range(5):  # 5 clips with batch 2 -> ragged final batch
            wav = (rng.randn(int(1.2 * 32000)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"c{i}.wav"), 32000, wav)

        model = tiny_sed_model(class_num=2)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
        params = model.init({"params": KEY}, mel)["params"]

        engine = InferenceEngine(
            model, frontend, params, codec, batch_size=2,
            median_filter=3, model_kwargs={"temp_w": 0.5},
        )
        ds = UnlabeledDataset(str(wav_dir), True, codec)
        loader = DataLoader(ds, batch_size=2, drop_last=False, num_workers=0)
        seen = []
        for names, scores, weak in engine.score_batches(iter(loader)):
            assert scores.shape[1:] == (120, 2) and weak.shape[1:] == (2,)
            assert np.isfinite(scores).all()
            seen.extend(names)
        assert sorted(seen) == [f"c{i}.wav" for i in range(5)]

    def test_data_parallel_matches_single_device(self, tmp_path):
        """batch_size divisible by the (8-CPU) device count -> the engine
        shards batches over a data mesh; scores must equal the
        single-device path bit-for-bit."""
        import os

        import jax as _jax
        from scipy.io import wavfile

        from tests.test_recipes_e2e import tiny_sed_model
        from transformer4sed_tpu.core.codec import LabelCodec
        from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes.serve import InferenceEngine

        if _jax.device_count() < 2:
            import pytest as _pytest

            _pytest.skip("needs the multi-device CPU mesh")
        codec = LabelCodec(
            labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
        )
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        for i in range(11):  # ragged tail under batch 8
            wav = (rng.randn(int(1.2 * 32000)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"c{i}.wav"), 32000, wav)

        model = tiny_sed_model(class_num=2)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
        params = model.init({"params": KEY}, mel)["params"]

        def collect(engine):
            ds = UnlabeledDataset(str(wav_dir), True, codec)
            loader = DataLoader(ds, batch_size=8, drop_last=False, num_workers=0)
            out = {}
            for names, scores, weak in engine.score_batches(iter(loader)):
                for i, n in enumerate(names):
                    out[n] = (scores[i], weak[i])
            return out

        kwargs = dict(batch_size=8, median_filter=3, model_kwargs={"temp_w": 0.5})
        sharded = collect(InferenceEngine(model, frontend, params, codec, **kwargs))
        single = collect(
            InferenceEngine(model, frontend, params, codec, data_parallel=False, **kwargs)
        )
        assert set(sharded) == set(single) == {f"c{i}.wav" for i in range(11)}
        for n in sharded:
            np.testing.assert_allclose(sharded[n][0], single[n][0], atol=1e-6)
            np.testing.assert_allclose(sharded[n][1], single[n][1], atol=1e-6)


class TestServeBatchNorm:
    def test_serve_main_htsat_restores_model_state(self, tmp_path):
        """serve.main with an HTSAT (BatchNorm) checkpoint: the sibling
        best_model_state dir is restored — without it the apply would
        raise ScopeCollectionNotFound."""
        import json
        import os

        import yaml
        from scipy.io import wavfile

        from transformer4sed_tpu.models.htsat import HTSATFrontend
        from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
        from transformer4sed_tpu.recipes import serve
        from transformer4sed_tpu.utils.checkpoint import save_params

        sr, dur = 32000, 1.2
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        for i in range(2):
            wav = (rng.randn(int(dur * sr)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"h{i}.wav"), sr, wav)

        init_kwargs = dict(
            class_num=2, decoder_dim=32, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=512, htsat_config="tiny",
        )
        model = HTSAT_CNN(**init_kwargs)
        frontend = HTSATFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(dur * sr)))))
        variables = model.init({"params": KEY}, mel)
        assert "batch_stats" in variables
        ckpt_dir = tmp_path / "best"
        save_params(str(ckpt_dir / "best_student"), variables["params"])
        save_params(
            str(ckpt_dir / "best_model_state"),
            {k: v for k, v in variables.items() if k != "params"},
        )

        config = {
            "model_name": "HTSAT_CNN",
            "HTSAT_CNN": {"init_kwargs": init_kwargs, "test_kwargs": {"temp_w": 0.5}},
            "feature": {"pred_len": 320, "sr": sr, "hopsize": 320, "n_fft": 1024,
                        "audio_max_len": dur, "net_subsample": 120.0 / 320.0},
            "dataset": {"labels": ["a", "b"]},
            "training": {"median_window": 3},
        }
        cfg_path = tmp_path / "config.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(config, f)
        out_dir = tmp_path / "scores"
        serve.main([
            "--config_dir", str(cfg_path),
            "--ckpt", str(ckpt_dir / "best_student"),
            "--wav_dir", str(wav_dir),
            "--out_dir", str(out_dir),
            "--batch_size", "2",
        ])
        lines = [json.loads(l) for l in open(out_dir / "events.jsonl")]
        assert {l["filename"] for l in lines} == {"h0.wav", "h1.wav"}
        assert (out_dir / "h0.tsv").exists()


class TestServeOpenVocab:
    def test_serve_main_with_external_queries(self, tmp_path):
        """serve.main end-to-end with a DASM model and --query/--query_names:
        per-query score TSVs + events JSONL under the query names."""
        import json
        import os
        import sys

        import yaml
        from scipy.io import wavfile

        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes import serve
        from transformer4sed_tpu.utils.checkpoint import save_params

        sr, dur = 32000, 1.2
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        for i in range(3):
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
            "dataset": {"labels": ["a", "b", "c", "d"]},
            "training": {"median_window": 3},
            "DASM": {"init_kwargs": dasm_kwargs, "test_kwargs": {"temp_w": 0.5}},
        }
        cfg_path = tmp_path / "cfg.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(config, f)

        queries = rng.randn(4, 16).astype(np.float32)
        np.save(tmp_path / "queries.npy", queries)
        with open(tmp_path / "names.txt", "w") as f:
            f.write("dog_bark\ncar_horn\nsiren\nspeech\n")

        model = tiny_dasm(**dasm_kwargs)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(dur * sr)))))
        params = model.init(
            {"params": KEY}, mel, query=jnp.asarray(queries), query_type="text"
        )["params"]
        save_params(str(tmp_path / "ckpt"), params)

        out_dir = tmp_path / "out"
        serve.main([
            "--config_dir", str(cfg_path), "--ckpt", str(tmp_path / "ckpt"),
            "--wav_dir", str(wav_dir), "--out_dir", str(out_dir),
            "--batch_size", "2", "--query", str(tmp_path / "queries.npy"),
            "--query_type", "text", "--query_names", str(tmp_path / "names.txt"),
        ])

        tsv = (out_dir / "q0.tsv").read_text().splitlines()
        assert tsv[0].split("\t") == ["onset", "offset", "dog_bark", "car_horn", "siren", "speech"]
        events = [json.loads(l) for l in (out_dir / "events.jsonl").read_text().splitlines()]
        assert {e["filename"] for e in events} == {f"q{i}.wav" for i in range(3)}
        for e in events:
            for ev in e["events"]:
                assert ev["event"] in ("dog_bark", "car_horn", "siren", "speech")
