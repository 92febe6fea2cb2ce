"""Waveform IO: load -> mono -> resample -> pad/truncate -> pad mask.

Reference semantics (``src/preprocess/feats_extraction.py:7-38``):
librosa.load at the codec sample rate, downmix to mono, zero-pad or
truncate to ``audio_len * sr`` samples, and build a frame-level pad
mask (True where frames are padding). librosa is not available in this
image; the hot path is the native C++ core (``native/wav_core.cpp``:
RIFF *and* FLAC decode + windowed-sinc resample, GIL-free, batch thread
pool) with a scipy.io.wavfile / pure-Python FLAC (``data/flac.py``)
fallback, dispatched on magic bytes. FLAC covers AudioSet-strong's
common wire format; other containers (mp3/ogg) must be pre-converted
(the reference repo ships a resample CLI for the same reason —
``src/utils/resample.py``).
"""

from __future__ import annotations

import math
import os
from fractions import Fraction
from typing import Tuple

import numpy as np


def to_mono(wav: np.ndarray, rand_ch: bool = False, rng: np.random.Generator | None = None) -> np.ndarray:
    if wav.ndim > 1:
        if rand_ch:
            rng = rng or np.random.default_rng()
            ch = int(rng.integers(0, wav.shape[-1] - 1)) if wav.shape[-1] > 1 else 0
            wav = wav[:, ch]
        else:
            wav = wav.mean(axis=-1)
    return wav


def _decode_wav(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from transformer4sed_tpu.data.flac import decode_flac

        return decode_flac(path)
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, sr


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return wav
    from scipy.signal import resample_poly

    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    return resample_poly(wav, frac.numerator, frac.denominator).astype(np.float32)


def load_audio(path: str, sr: int) -> np.ndarray:
    """Load a WAV file as mono float32 at sample rate ``sr``."""
    wav, orig_sr = _decode_wav(path)
    wav = to_mono(wav)
    return resample(wav, orig_sr, sr).astype(np.float32)


def pad_wav(wav: np.ndarray, pad_to: int, codec) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad or truncate to ``pad_to`` samples; return (wav, pad_mask).

    pad_mask: [codec.n_frames] bool, True where the frame is padding.
    """
    if len(wav) < pad_to:
        pad_from = len(wav)
        wav = np.pad(wav, (0, pad_to - len(wav)), mode="constant")
    else:
        wav = wav[:pad_to]
        pad_from = pad_to
    pad_idx = math.ceil(float(codec.time_to_frame(pad_from / codec.sr)))
    pad_mask = np.arange(codec.n_frames) >= pad_idx
    return wav.astype(np.float32), pad_mask


def _pad_mask_from_len(true_len: int, codec) -> np.ndarray:
    pad_idx = math.ceil(float(codec.time_to_frame(true_len / codec.sr)))
    return np.arange(codec.n_frames) >= pad_idx


def waveform_modification(path: str, pad_to: int, codec) -> Tuple[np.ndarray, np.ndarray]:
    """Decode -> mono -> resample(sr) -> pad/truncate + frame pad mask.

    Uses the native C++ core (``native/wav_core.cpp``: GIL-free decode +
    windowed-sinc resample) when a toolchain is available; otherwise the
    scipy path above. Disable with ``T4S_DISABLE_NATIVE_WAV=1``.
    """
    if not os.environ.get("T4S_DISABLE_NATIVE_WAV"):
        from transformer4sed_tpu.native.build import load_wav_core

        lib = load_wav_core()
        if lib is not None:
            import ctypes

            out = np.empty(pad_to, dtype=np.float32)
            true_len = ctypes.c_long(0)
            err = lib.t4s_load_wav(
                str(path).encode(), int(codec.sr), int(pad_to),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(true_len),
            )
            if err == 0:
                return out, _pad_mask_from_len(int(true_len.value), codec)
            # fall through to scipy on decode errors (e.g. exotic codecs)
    wav = load_audio(path, codec.sr)
    return pad_wav(wav, pad_to, codec)


def load_wav_batch(paths, pad_to: int, codec, n_threads: int = 8):
    """Batch-parallel native load: (wavs [N, pad_to] f32, pad_masks [N, F]).

    One C call decodes/resamples the whole batch on a thread pool with
    the GIL released (ctypes) — the serving engine's IO path. Falls back
    to per-file :func:`waveform_modification` without the native lib.
    """
    paths = [str(p) for p in paths]
    n = len(paths)
    if not os.environ.get("T4S_DISABLE_NATIVE_WAV"):
        from transformer4sed_tpu.native.build import load_wav_core

        lib = load_wav_core()
        if lib is not None and n:
            import ctypes

            out = np.empty((n, pad_to), dtype=np.float32)
            true_len = np.zeros(n, dtype=np.int64)
            err = np.zeros(n, dtype=np.int32)
            arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
            lib.t4s_load_wav_batch(
                arr, n, int(codec.sr), int(pad_to),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                true_len.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                err.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                int(n_threads),
            )
            masks = np.stack([_pad_mask_from_len(int(t), codec) for t in true_len])
            # redo ONLY the failed files through the scipy path (exotic
            # codecs the native parser rejects); successes are kept
            for i in np.nonzero(err)[0]:
                out[i], masks[i] = pad_wav(load_audio(paths[i], codec.sr), pad_to, codec)
            return out, masks
    wavs, masks = [], []
    for p in paths:
        w, m = waveform_modification(p, pad_to, codec)
        wavs.append(w)
        masks.append(m)
    return (
        np.stack(wavs) if wavs else np.zeros((0, pad_to), np.float32),
        np.stack(masks) if masks else np.zeros((0, codec.n_frames), bool),
    )
