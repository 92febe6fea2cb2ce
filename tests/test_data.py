"""Data layer tests on synthetic WAV fixtures."""

import os

import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.data import (
    ConcatBatchSampler,
    DataLoader,
    RandomSampler,
    Scaler,
    StronglyLabeledDataset,
    UnlabeledDataset,
    WeaklyLabeledDataset,
    WeightedSampler,
    load_audio,
    pad_wav,
)

SR = 16000
CLASSES = ("cat", "dog")


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    for i in range(6):
        wav = (rng.randn(SR * 2) * 0.1 * 32767).astype(np.int16)  # 2 s
        wavfile.write(str(d / f"clip{i}.wav"), SR, wav)
    return str(d)


def make_codec():
    return LabelCodec(labels=CLASSES, audio_len=3.0, frame_len=1024, frame_hop=320, sr=SR)


class TestAudioIO:
    def test_load_resample(self, wav_dir):
        wav = load_audio(os.path.join(wav_dir, "clip0.wav"), sr=8000)
        assert wav.dtype == np.float32
        assert abs(len(wav) - 16000) < 10  # 2 s at 8 kHz
        assert np.abs(wav).max() <= 1.0

    def test_pad_and_mask(self, wav_dir):
        codec = make_codec()
        wav = load_audio(os.path.join(wav_dir, "clip0.wav"), sr=SR)  # 2 s of 3 s
        padded, mask = pad_wav(wav, int(codec.audio_len * SR), codec)
        assert len(padded) == 48000
        assert (padded[32000:] == 0).all()
        # mask true on padded tail frames
        assert mask[-1] and not mask[0]
        boundary = int(np.ceil(float(codec.time_to_frame(2.0))))
        assert not mask[boundary - 1] and mask[boundary]


class TestDatasets:
    def test_strong(self, wav_dir):
        codec = make_codec()
        df = pd.DataFrame(
            {
                "filename": ["clip0.wav", "clip0.wav", "clip1.wav"],
                "onset": [0.0, 1.0, 0.5],
                "offset": [0.5, 2.0, 1.5],
                "event_label": ["cat", "dog", "cat"],
            }
        )
        ds = StronglyLabeledDataset(df, wav_dir, return_name=True, codec=codec)
        assert len(ds) == 2
        s = ds[0]
        assert s["wav"].shape == (48000,)
        assert s["label"].shape == (2, codec.n_frames)
        assert s["label"][0].sum() > 0 and s["label"][1].sum() > 0
        assert s["filename"] == "clip0.wav"

    def test_weak(self, wav_dir):
        codec = make_codec()
        df = pd.DataFrame({"filename": ["clip2.wav"], "event_labels": ["cat,dog"]})
        ds = WeaklyLabeledDataset(df, wav_dir, return_name=False, codec=codec)
        s = ds[0]
        np.testing.assert_array_equal(s["label"][:, 0], [1, 1])
        assert s["label"][:, 1:].sum() == 0
        # trainers recover tags via sum over time
        np.testing.assert_array_equal(s["label"].sum(-1), [1, 1])

    def test_unlabeled(self, wav_dir):
        codec = make_codec()
        ds = UnlabeledDataset(wav_dir, return_name=True, codec=codec)
        assert len(ds) == 6
        assert ds[0]["label"].sum() == 0


class TestSamplers:
    def test_random_seeded(self):
        s = RandomSampler(10, seed=1)
        s.set_epoch(0)
        a = list(s)
        b = list(s)
        assert a == b
        s.set_epoch(1)
        assert list(s) != a
        assert sorted(a) == list(range(10))

    def test_weighted(self):
        s = WeightedSampler([0.0, 0.0, 1.0], num_samples=50)
        assert list(s) == [2] * 50

    def test_concat_composition(self):
        s = ConcatBatchSampler(
            [RandomSampler(8), RandomSampler(12), RandomSampler(20)], batch_sizes=[2, 1, 4]
        )
        assert len(s) == min(8 // 2, 12 // 1, 20 // 4)
        batches = list(s)
        for b in batches:
            assert len(b) == 7
            assert all(0 <= i < 8 for i in b[:2])
            assert all(8 <= i < 20 for i in b[2:3])
            assert all(20 <= i < 40 for i in b[3:])


class TestLoader:
    def test_multi_source_batches(self, wav_dir):
        codec = make_codec()
        strong_df = pd.DataFrame(
            {
                "filename": ["clip0.wav", "clip1.wav"],
                "onset": [0.0, 0.0],
                "offset": [1.0, 1.0],
                "event_label": ["cat", "dog"],
            }
        )
        weak_df = pd.DataFrame(
            {"filename": ["clip2.wav", "clip3.wav"], "event_labels": ["cat", "dog"]}
        )
        strong = StronglyLabeledDataset(strong_df, wav_dir, False, codec)
        weak = WeaklyLabeledDataset(weak_df, wav_dir, False, codec)
        unlab = UnlabeledDataset(wav_dir, False, codec)
        sampler = ConcatBatchSampler(
            [RandomSampler(len(strong)), RandomSampler(len(weak)), RandomSampler(len(unlab))],
            batch_sizes=[1, 1, 2],
        )
        loader = DataLoader([strong, weak, unlab], batch_sampler=sampler, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(sampler)
        b = batches[0]
        assert b["wav"].shape == (4, 48000)
        assert b["label"].shape == (4, 2, codec.n_frames)
        assert b["pad_mask"].shape == (4, codec.n_frames)

    def test_simple_loader(self, wav_dir):
        codec = make_codec()
        ds = UnlabeledDataset(wav_dir, False, codec)
        loader = DataLoader(ds, batch_size=3, num_workers=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["wav"].shape == (3, 48000)


class TestScaler:
    def test_instance_standard(self):
        x = np.random.RandomState(0).randn(2, 8, 10).astype(np.float32) * 5 + 3
        out = np.asarray(Scaler(statistic="instance")(x))
        np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-2)

    def test_dataset_fit_roundtrip(self):
        rng = np.random.RandomState(1)
        batches = [rng.randn(4, 8, 10).astype(np.float32) * 2 + 1 for _ in range(5)]
        sc = Scaler(statistic="dataset").fit(batches)
        out = np.asarray(sc(batches[0]))
        assert abs(out.mean()) < 0.2
        sc2 = Scaler(statistic="dataset").load_state_dict(sc.state_dict())
        np.testing.assert_allclose(np.asarray(sc2(batches[0])), out)
