"""FLAC decode: native C++ core vs pure-Python fallback vs ground truth.

A minimal *test-only* FLAC encoder below produces spec-conformant
streams (real CRC-8/CRC-16, STREAMINFO, UTF-8 frame numbers) covering
every subframe type the decoders implement — constant, verbatim, fixed
orders 0-4, LPC — plus rice/rice2 partitions, escape partitions, wasted
bits, all four stereo decorrelation modes, and ragged last blocks.
Decoding FLAC is lossless, so decoded integers must match the encoder
input EXACTLY (as v / 2^(bps-1) float32).
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.data.audio_io import load_wav_batch, waveform_modification
from transformer4sed_tpu.data.flac import decode_flac
from transformer4sed_tpu.native.build import load_wav_core

LIB = load_wav_core()
needs_lib = pytest.mark.skipif(LIB is None, reason="no C++ toolchain")


# ---------------------------------------------------------------------------
# test-only FLAC encoder
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, v: int, k: int):
        if k == 0:
            return
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.nb += k
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def align(self):
        if self.nb:
            self.write(0, 8 - self.nb)


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else (-(e << 1) - 1)


def _signed_bits(e: int) -> int:
    return (e.bit_length() if e >= 0 else (-e - 1).bit_length()) + 1


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_residual(bw, res, n, order, po, rice2=False, escape=False):
    method = 1 if rice2 else 0
    pbits, esc = (5, 0x1F) if rice2 else (4, 0xF)
    bw.write(method, 2)
    bw.write(po, 4)
    idx = 0
    for part in range(1 << po):
        take = (n >> po) - (order if part == 0 else 0)
        chunk = res[idx : idx + take]
        idx += take
        if escape:
            raw = max([_signed_bits(e) for e in chunk] or [1])
            bw.write(esc, pbits)
            bw.write(raw, 5)
            for e in chunk:
                bw.write(e, raw)
        else:
            us = [_zigzag(e) for e in chunk]
            mean = sum(us) // len(us) if us else 0
            param = min(max(0, mean.bit_length() - 1), esc - 1)
            bw.write(param, pbits)
            for u in us:
                for _ in range(u >> param):
                    bw.write(0, 1)
                bw.write(1, 1)
                bw.write(u, param)


def _write_subframe(bw, s, bps, kind, po=0, lpc=None, wasted=0,
                    rice2=False, escape=False):
    n = len(s)
    bw.write(0, 1)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in s)
        s = [v >> wasted for v in s]
        bps -= wasted
    if kind == "constant":
        assert len(set(s)) == 1
        code = 0
    elif kind == "verbatim":
        code = 1
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        code = 8 + order
    elif kind == "lpc":
        order = len(lpc["coef"])
        code = 32 + order - 1
    else:
        raise ValueError(kind)
    bw.write(code, 6)
    if wasted:
        bw.write(1, 1)
        for _ in range(wasted - 1):
            bw.write(0, 1)
        bw.write(1, 1)
    else:
        bw.write(0, 1)

    if kind == "constant":
        bw.write(s[0], bps)
    elif kind == "verbatim":
        for v in s:
            bw.write(v, bps)
    elif kind.startswith("fixed"):
        coef = _FIXED[order]
        for v in s[:order]:
            bw.write(v, bps)
        res = [s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coef))
               for i in range(order, n)]
        _write_residual(bw, res, n, order, po, rice2, escape)
    else:  # lpc
        coef, shift, prec = lpc["coef"], lpc["shift"], lpc["precision"]
        for v in s[:order]:
            bw.write(v, bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coef:
            bw.write(c, prec)
        res = [s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coef)) >> shift)
               for i in range(order, n)]
        _write_residual(bw, res, n, order, po, rice2, escape)


def encode_flac(samples, sr, bps=16, blocksize=256, kind="verbatim",
                stereo="independent", po=0, lpc=None, wasted=0,
                rice2=False, escape=False) -> bytes:
    """samples: int array [n] (mono) or [n, 2] (stereo)."""
    samples = np.asarray(samples, dtype=np.int64)
    mono = samples.ndim == 1
    n_total = samples.shape[0]
    channels = 1 if mono else samples.shape[1]

    bw = _BitWriter()
    bw.write(1, 1)  # last metadata block
    bw.write(0, 7)  # STREAMINFO
    bw.write(34, 24)
    bw.write(blocksize, 16)
    bw.write(blocksize, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sr, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n_total, 36)
    for _ in range(16):
        bw.write(0, 8)
    out = b"fLaC" + bytes(bw.buf)

    ca = {"independent": channels - 1, "left_side": 8,
          "right_side": 9, "mid_side": 10}[stereo]
    for fno, start in enumerate(range(0, n_total, blocksize)):
        block = samples[start : start + blocksize]
        n = block.shape[0]
        fbw = _BitWriter()
        fbw.write(0b11111111111110, 14)
        fbw.write(0, 1)  # reserved
        fbw.write(0, 1)  # fixed blocking
        fbw.write(7, 4)  # blocksize: 16-bit field
        fbw.write(0, 4)  # sample rate: STREAMINFO
        fbw.write(ca, 4)
        fbw.write(0, 3)  # sample size: STREAMINFO
        fbw.write(0, 1)
        if fno < 0x80:  # UTF-8 frame number
            fbw.write(fno, 8)
        else:
            fbw.write(0b110_00000 | (fno >> 6), 8)
            fbw.write(0b10_000000 | (fno & 0x3F), 8)
        fbw.write(n - 1, 16)
        fbw.write(_crc8(bytes(fbw.buf)), 8)

        if mono:
            chs, sbps = [block.tolist()], [bps]
        elif stereo == "independent":
            chs, sbps = [block[:, 0].tolist(), block[:, 1].tolist()], [bps, bps]
        elif stereo == "left_side":
            chs = [block[:, 0].tolist(), (block[:, 0] - block[:, 1]).tolist()]
            sbps = [bps, bps + 1]
        elif stereo == "right_side":
            chs = [(block[:, 0] - block[:, 1]).tolist(), block[:, 1].tolist()]
            sbps = [bps + 1, bps]
        else:  # mid_side
            side = block[:, 0] - block[:, 1]
            mid = (block[:, 0] + block[:, 1]) >> 1
            chs, sbps = [mid.tolist(), side.tolist()], [bps, bps + 1]
        for s, sb in zip(chs, sbps):
            _write_subframe(fbw, s, sb, kind, po=po, lpc=lpc, wasted=wasted,
                            rice2=rice2, escape=escape)
        fbw.align()
        fbw.write(_crc16(bytes(fbw.buf)), 16)
        out += bytes(fbw.buf)
    return out


# ---------------------------------------------------------------------------
# decode checks
# ---------------------------------------------------------------------------


def _native_decode(path: str, sr: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float32)
    tl = ctypes.c_long(0)
    err = LIB.t4s_load_wav(
        str(path).encode(), sr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.byref(tl))
    assert err == 0, f"native FLAC decode error {err}"
    assert tl.value == n
    return out


def _expected_mono(samples: np.ndarray, bps: int = 16) -> np.ndarray:
    f = samples.astype(np.float64) / float(1 << (bps - 1))
    if f.ndim == 2:
        f = f.astype(np.float32).astype(np.float64).mean(axis=1)  # mono downmix
    return f.astype(np.float32)


def _signal(n, seed=0, amp=12000, ch=1):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 32000.0
    base = amp * np.sin(2 * np.pi * 440.0 * t)
    sig = base[:, None] + rng.randn(n, ch) * 500
    sig = np.round(sig).astype(np.int64)
    return sig[:, 0] if ch == 1 else sig


CASES = [
    dict(kind="verbatim"),
    dict(kind="constant"),
    dict(kind="fixed0", po=2),
    dict(kind="fixed1"),
    dict(kind="fixed2", po=1, rice2=True),
    dict(kind="fixed3"),
    dict(kind="fixed4", po=2),
    dict(kind="lpc", lpc={"coef": [3, -2], "shift": 1, "precision": 5}),
    dict(kind="lpc", po=1,
         lpc={"coef": [10, -7, 3, 1], "shift": 3, "precision": 6}),
    dict(kind="fixed2", escape=True),
    dict(kind="fixed1", wasted=2),
]


@needs_lib
@pytest.mark.parametrize("case", CASES, ids=lambda c: "-".join(
    f"{k}={v}" for k, v in c.items() if k != "lpc") or "lpc")
def test_mono_subframe_types_native_and_python(tmp_path, case):
    n = 600
    sig = _signal(n, seed=1)
    if case.get("kind") == "constant":
        sig = np.full(n, -1234, np.int64)
    if case.get("wasted"):
        sig = (sig >> case["wasted"]) << case["wasted"]
    blob = encode_flac(sig, 32000, blocksize=256, **case)
    p = tmp_path / "x.flac"
    p.write_bytes(blob)
    expected = _expected_mono(sig)

    wav_py, sr = decode_flac(str(p))  # pure-Python fallback
    assert sr == 32000
    np.testing.assert_array_equal(wav_py, expected)

    wav_native = _native_decode(p, 32000, n)  # C++ core
    np.testing.assert_array_equal(wav_native, expected)


@needs_lib
@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(tmp_path, stereo):
    n = 512
    sig = _signal(n, seed=2, ch=2)
    blob = encode_flac(sig, 32000, blocksize=256, kind="fixed2", stereo=stereo)
    p = tmp_path / "st.flac"
    p.write_bytes(blob)
    expected = _expected_mono(sig)  # decoders downmix to mono by mean

    wav_py, _ = decode_flac(str(p))
    np.testing.assert_array_equal(
        wav_py.astype(np.float64).mean(axis=1).astype(np.float32)
        if wav_py.ndim == 2 else wav_py, expected)

    wav_native = _native_decode(p, 32000, n)
    np.testing.assert_allclose(wav_native, expected, atol=1e-7)


@needs_lib
def test_ragged_last_block(tmp_path):
    n = 600  # 256 + 256 + 88
    sig = _signal(n, seed=3)
    blob = encode_flac(sig, 32000, blocksize=256, kind="fixed1")
    p = tmp_path / "rag.flac"
    p.write_bytes(blob)
    np.testing.assert_array_equal(_native_decode(p, 32000, n), _expected_mono(sig))
    wav_py, _ = decode_flac(str(p))
    np.testing.assert_array_equal(wav_py, _expected_mono(sig))


@needs_lib
def test_waveform_modification_accepts_flac_with_resample(tmp_path):
    # 44.1 kHz FLAC tone -> 32 kHz pipeline: same SNR bar as the wav path
    sr_in, sr_out = 44100, 32000
    t = np.arange(sr_in) / sr_in
    sig = np.round(16384 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int64)
    p = tmp_path / "r.flac"
    p.write_bytes(encode_flac(sig, sr_in, blocksize=4096, kind="fixed2"))
    c = LabelCodec(labels=["a"], audio_len=1.0, frame_len=1024, frame_hop=320,
                   net_pooling=1, sr=sr_out)
    out, mask = waveform_modification(str(p), sr_out, c)
    assert out.shape == (sr_out,)
    ideal = 0.5 * np.sin(2 * np.pi * 1000.0 * np.arange(sr_out) / sr_out)
    sl = slice(500, sr_out - 500)
    err = out[sl] - ideal[sl]
    snr = 10 * np.log10(np.mean(ideal[sl] ** 2) / max(np.mean(err ** 2), 1e-20))
    assert snr > 40, f"FLAC->resample SNR {snr:.1f} dB"
    assert mask.sum() == 0


@needs_lib
def test_batch_mixes_wav_and_flac(tmp_path):
    from scipy.io import wavfile

    sr, n = 32000, 16000
    c = LabelCodec(labels=["a"], audio_len=0.5, frame_len=1024, frame_hop=320,
                   net_pooling=1, sr=sr)
    sig = _signal(n, seed=4)
    pw = tmp_path / "a.wav"
    wavfile.write(str(pw), sr, sig.astype(np.int16))
    pf = tmp_path / "b.flac"
    pf.write_bytes(encode_flac(sig, sr, blocksize=4096, kind="fixed2"))
    wavs, masks = load_wav_batch([str(pw), str(pf)], sr, c, n_threads=2)
    np.testing.assert_array_equal(wavs[0], wavs[1])
    np.testing.assert_array_equal(masks[0], masks[1])


@needs_lib
def test_python_fallback_without_native(tmp_path, monkeypatch):
    n = 400
    sig = _signal(n, seed=5)
    p = tmp_path / "fb.flac"
    p.write_bytes(encode_flac(sig, 32000, blocksize=256, kind="lpc",
                              lpc={"coef": [2, -1], "shift": 1, "precision": 4}))
    monkeypatch.setenv("T4S_DISABLE_NATIVE_WAV", "1")
    c = LabelCodec(labels=["a"], audio_len=n / 32000.0, frame_len=1024,
                   frame_hop=320, net_pooling=1, sr=32000)
    out, _ = waveform_modification(str(p), n, c)
    np.testing.assert_array_equal(out, _expected_mono(sig))


@needs_lib
class TestMalformedFlac:
    """Corrupt FLAC must fail with error codes, never crash."""

    def _load(self, path):
        out = np.zeros(1000, dtype=np.float32)
        tl = ctypes.c_long(0)
        return LIB.t4s_load_wav(
            str(path).encode(), 32000, 1000,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.byref(tl))

    def test_truncations_and_fuzz(self, tmp_path):
        sig = _signal(500, seed=6)
        blob = encode_flac(sig, 32000, blocksize=256, kind="fixed2")
        rng = np.random.RandomState(0)
        # every truncation loses samples STREAMINFO promised, so both
        # decoders must fail LOUDLY — a cut right after the metadata
        # (cut=42 here) used to decode to silence with exit code 0
        for cut in (4, 10, 42, 60, len(blob) // 2, len(blob) - 3):
            p = tmp_path / f"cut{cut}.flac"
            p.write_bytes(blob[:cut])
            assert self._load(p) in (2, 3, 4), f"cut={cut} must be an error"
            with pytest.raises(ValueError):
                decode_flac(str(p))
        for trial in range(30):
            b = bytearray(blob)
            for _ in range(6):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            p = tmp_path / f"fz{trial}.flac"
            p.write_bytes(bytes(b))
            assert self._load(p) in (0, 1, 2, 3, 4)
