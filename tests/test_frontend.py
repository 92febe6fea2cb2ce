"""Frontend tests: STFT parity vs torch.stft, mel-bank properties, frontend shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.frontend import (
    MelFrontend,
    PasstFrontend,
    amplitude_to_db,
    fast_normalize,
    htk_mel_banks,
    kaldi_mel_banks,
    stft_magnitude,
)
from transformer4sed_tpu.frontend.mel import hamming_window, hann_window


class TestWindows:
    def test_hann_matches_torch(self):
        torch = pytest.importorskip("torch")
        ours = hann_window(800, periodic=False)
        ref = torch.hann_window(800, periodic=False).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_hamming_matches_torch(self):
        torch = pytest.importorskip("torch")
        ours = hamming_window(2048, periodic=False)
        ref = torch.hamming_window(2048, periodic=False).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestStft:
    @pytest.mark.parametrize("n_fft,hop,win", [(1024, 320, 800), (2048, 256, 2048)])
    def test_power_matches_torch(self, n_fft, hop, win):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        wav = rng.randn(2, 16000).astype(np.float32)

        window = hann_window(win, periodic=False)
        ours = np.asarray(
            stft_magnitude(jnp.asarray(wav), n_fft, hop, win, jnp.asarray(window), power=2.0)
        )

        t_spec = torch.stft(
            torch.tensor(wav),
            n_fft,
            hop_length=hop,
            win_length=win,
            center=True,
            normalized=False,
            window=torch.tensor(window),
            return_complex=True,
        )
        ref = (t_spec.abs() ** 2).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_frame_count(self):
        wav = jnp.zeros((1, 320000 - 1))  # post-preemphasis length for 10 s @ 32 kHz
        out = stft_magnitude(wav, 1024, 320, 800, jnp.asarray(hann_window(800)), power=2.0)
        assert out.shape == (1, 513, 1000)


class TestMelBanks:
    def test_kaldi_banks_shape_and_triangles(self):
        banks = np.asarray(kaldi_mel_banks(128, 1024, 32000, 0.0, 15000.0))
        assert banks.shape == (128, 513)
        # Nyquist column zero-padded
        assert (banks[:, -1] == 0).all()
        # every filter is non-negative with a single peak
        assert (banks >= 0).all()
        peaks = banks.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()  # centres increase monotonically
        assert banks.max() <= 1.0 + 1e-6

    def test_kaldi_banks_traced_fmin_fmax(self):
        # traced scalars must work (in-jit augmentation)
        fn = jax.jit(lambda lo, hi: kaldi_mel_banks(64, 1024, 32000, lo, hi))
        out = fn(jnp.asarray(5.0), jnp.asarray(14500.0))
        assert out.shape == (64, 513)
        assert bool(jnp.isfinite(out).all())

    def test_kaldi_center_frequency_location(self):
        # filter m peaks at the fft bin nearest mel centre; check endpoints in Hz
        n_mels, n_fft, sr = 8, 1024, 16000
        banks = np.asarray(kaldi_mel_banks(n_mels, n_fft, sr, 20.0, 8000.0))

        def mel(f):
            return 1127 * np.log(1 + f / 700)

        def imel(m):
            return 700 * (np.exp(m / 1127) - 1)

        delta = (mel(8000) - mel(20)) / (n_mels + 1)
        for m in range(n_mels):
            center_hz = imel(mel(20) + (m + 1) * delta)
            peak_bin = banks[m].argmax()
            assert abs(peak_bin * sr / n_fft - center_hz) < sr / n_fft * 1.5

    def test_htk_banks_shape(self):
        banks = np.asarray(htk_mel_banks(128, 2048, 16000, 0.0, 8000.0))
        assert banks.shape == (128, 1025)
        assert (banks >= 0).all()
        # triangles overlap: every interior frequency is covered
        coverage = banks.sum(axis=0)
        assert (coverage[50:900] > 0).all()


class TestFrontends:
    def test_passt_shapes_and_norm(self):
        fe = PasstFrontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 320000).astype(np.float32))
        mel = fe(wav)
        assert mel.shape == (2, 128, 1000)
        normed = fe.normalize(mel)
        assert bool(jnp.isfinite(normed).all())
        # fast-norm of tiny power should be around (log(1e-5)+4.5)/5 ~ -1.4
        silent = fe.normalize(jnp.zeros((1, 128, 10)))
        np.testing.assert_allclose(np.asarray(silent), (np.log(1e-5) + 4.5) / 5, rtol=1e-4)

    def test_passt_aug_changes_output_only_in_training(self):
        fe = PasstFrontend()
        wav = jnp.asarray(np.random.RandomState(1).randn(1, 32000).astype(np.float32))
        key = jax.random.PRNGKey(0)
        eval_out = fe(wav, key=key, training=False)
        eval_out2 = fe(wav, key=jax.random.PRNGKey(1), training=False)
        np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
        train1 = fe(wav, key=jax.random.PRNGKey(2), training=True)
        train2 = fe(wav, key=jax.random.PRNGKey(3), training=True)
        assert not np.allclose(np.asarray(train1), np.asarray(train2))

    def test_passt_jits(self):
        fe = PasstFrontend()
        fn = jax.jit(lambda w, k: fe(w, key=k, training=True))
        out = fn(jnp.zeros((1, 32000)), jax.random.PRNGKey(0))
        assert out.shape == (1, 128, 100)

    def test_generic_mel_frontend(self):
        fe = MelFrontend(sr=16000, n_fft=2048, hop_length=256, n_mels=128)
        wav = jnp.asarray(np.random.RandomState(2).randn(1, 160000).astype(np.float32))
        mel = fe(wav)
        assert mel.shape == (1, 128, 626)
        assert float(mel.min()) >= -50.0 and float(mel.max()) <= 80.0

    def test_amplitude_to_db(self):
        x = jnp.asarray([1.0, 10.0, 0.0])
        out = np.asarray(amplitude_to_db(x))
        np.testing.assert_allclose(out, [0.0, 20.0, -50.0], atol=1e-5)
