"""Native C++ waveform loader vs the scipy fallback path."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.data.audio_io import (
    load_wav_batch,
    pad_wav,
    load_audio,
    waveform_modification,
)
from transformer4sed_tpu.native.build import load_wav_core

LIB = load_wav_core()
needs_lib = pytest.mark.skipif(LIB is None, reason="no C++ toolchain")


def codec(sr=32000, dur=1.0):
    return LabelCodec(labels=["a"], audio_len=dur, frame_len=1024, frame_hop=320,
                      net_pooling=1, sr=sr)


def sine(sr, dur, freq=440.0, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@needs_lib
class TestNativeDecode:
    def test_pcm16_matches_scipy(self, tmp_path):
        sr = 32000
        wav = sine(sr, 1.0)
        path = tmp_path / "x.wav"
        wavfile.write(str(path), sr, (wav * 32767).astype(np.int16))
        c = codec()
        native, m_native = waveform_modification(str(path), sr, c)
        os.environ["T4S_DISABLE_NATIVE_WAV"] = "1"
        try:
            ref, m_ref = waveform_modification(str(path), sr, c)
        finally:
            del os.environ["T4S_DISABLE_NATIVE_WAV"]
        np.testing.assert_allclose(native, ref, atol=1e-6)
        np.testing.assert_array_equal(m_native, m_ref)

    def test_float32_and_stereo(self, tmp_path):
        sr = 32000
        left = sine(sr, 0.5, 440.0)
        right = sine(sr, 0.5, 880.0)
        path = tmp_path / "st.wav"
        wavfile.write(str(path), sr, np.stack([left, right], axis=1))
        c = codec()
        native, _ = waveform_modification(str(path), sr, c)
        expected = (left + right) / 2
        np.testing.assert_allclose(native[: len(expected)], expected, atol=1e-6)
        # zero-padded tail + pad mask
        assert np.all(native[len(expected):] == 0)

    def test_pad_and_truncate(self, tmp_path):
        sr = 32000
        c = codec()
        short = sine(sr, 0.25)
        long = sine(sr, 2.0)
        p1, p2 = tmp_path / "short.wav", tmp_path / "long.wav"
        wavfile.write(str(p1), sr, (short * 32767).astype(np.int16))
        wavfile.write(str(p2), sr, (long * 32767).astype(np.int16))
        w1, m1 = waveform_modification(str(p1), sr, c)
        w2, m2 = waveform_modification(str(p2), sr, c)
        assert w1.shape == w2.shape == (sr,)
        assert m1.sum() > 0 and m2.sum() == 0

    def test_resample_quality(self, tmp_path):
        # 44.1k -> 32k sine must stay a clean sine (SNR vs ideal > 40 dB)
        sr_in, sr_out = 44100, 32000
        wav = sine(sr_in, 1.0, freq=1000.0)
        path = tmp_path / "r.wav"
        wavfile.write(str(path), sr_in, (wav * 32767).astype(np.int16))
        c = codec(sr=sr_out)
        out, _ = waveform_modification(str(path), sr_out, c)
        n = sr_out
        t = np.arange(n) / sr_out
        ideal = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        # ignore filter edges
        sl = slice(500, n - 500)
        err = out[sl] - ideal[sl]
        snr = 10 * np.log10(np.mean(ideal[sl] ** 2) / max(np.mean(err ** 2), 1e-20))
        assert snr > 40, f"native resampler SNR {snr:.1f} dB"

    def test_missing_file_falls_back_cleanly(self, tmp_path):
        c = codec()
        with pytest.raises(Exception):
            waveform_modification(str(tmp_path / "nope.wav"), 32000, c)

    def test_batch_matches_single(self, tmp_path):
        sr = 32000
        c = codec()
        paths = []
        for i in range(5):
            wav = sine(sr, 0.5 + 0.1 * i, freq=200.0 * (i + 1))
            p = tmp_path / f"b{i}.wav"
            wavfile.write(str(p), sr, (wav * 32767).astype(np.int16))
            paths.append(str(p))
        wavs, masks = load_wav_batch(paths, sr, c, n_threads=3)
        assert wavs.shape == (5, sr) and masks.shape[0] == 5
        for i, p in enumerate(paths):
            w, m = waveform_modification(p, sr, c)
            np.testing.assert_allclose(wavs[i], w, atol=1e-6)
            np.testing.assert_array_equal(masks[i], m)


class TestFallbackPath:
    def test_disable_env_forces_scipy(self, tmp_path, monkeypatch):
        sr = 32000
        wav = sine(sr, 1.0)
        path = tmp_path / "y.wav"
        wavfile.write(str(path), sr, (wav * 32767).astype(np.int16))
        monkeypatch.setenv("T4S_DISABLE_NATIVE_WAV", "1")
        c = codec()
        out, mask = waveform_modification(str(path), sr, c)
        ref, ref_mask = pad_wav(load_audio(str(path), sr), sr, c)
        np.testing.assert_allclose(out, ref)
        np.testing.assert_array_equal(mask, ref_mask)


@needs_lib
class TestMalformedInputs:
    """The native parser must fail with error codes, never crash."""

    def _load(self, path, c):
        import ctypes

        out = np.zeros(32000, dtype=np.float32)
        tl = ctypes.c_long(0)
        return LIB.t4s_load_wav(
            str(path).encode(), 32000, 32000,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.byref(tl),
        )

    def test_error_codes(self, tmp_path):
        c = codec()
        cases = {
            "missing.wav": 1,            # open fails
            "empty.wav": 2,              # too short
            "not_riff.wav": 2,           # wrong magic
        }
        (tmp_path / "empty.wav").write_bytes(b"")
        (tmp_path / "not_riff.wav").write_bytes(b"OggS" + b"\0" * 100)
        for name, want in cases.items():
            assert self._load(tmp_path / name, c) == want, name

    def test_truncated_and_fuzzed(self, tmp_path):
        rng = np.random.RandomState(0)
        sr = 32000
        wav = sine(sr, 0.5)
        good = tmp_path / "good.wav"
        wavfile.write(str(good), sr, (wav * 32767).astype(np.int16))
        blob = good.read_bytes()
        c = codec()
        # truncations at various points: must return 0 (short data chunk
        # is clipped) or an error code, never crash
        for cut in (10, 20, 44, 100, len(blob) // 2):
            p = tmp_path / f"cut{cut}.wav"
            p.write_bytes(blob[:cut])
            assert self._load(p, c) in (0, 1, 2, 3, 4)
        # random byte corruption of the header
        for trial in range(20):
            b = bytearray(blob)
            for _ in range(8):
                b[rng.randint(0, min(len(b), 64))] = rng.randint(0, 256)
            p = tmp_path / f"fuzz{trial}.wav"
            p.write_bytes(bytes(b))
            assert self._load(p, c) in (0, 1, 2, 3, 4)

    def test_chunk_len_overflow(self, tmp_path):
        # fmt chunk with a huge declared length must not walk off the buffer
        import struct

        body = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        body += b"fmt " + struct.pack("<I", 0xFFFFFFF0) + b"\x01\x00\x01\x00"
        p = tmp_path / "overflow.wav"
        p.write_bytes(body)
        c = codec()
        assert self._load(p, c) in (2, 3, 4)
