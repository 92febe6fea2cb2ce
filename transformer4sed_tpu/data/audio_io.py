"""Waveform IO: load -> mono -> resample -> pad/truncate -> pad mask.

Reference semantics (``src/preprocess/feats_extraction.py:7-38``):
librosa.load at the codec sample rate, downmix to mono, zero-pad or
truncate to ``audio_len * sr`` samples, and build a frame-level pad
mask (True where frames are padding). librosa is not available in this
image, so decoding uses scipy.io.wavfile (PCM + IEEE-float WAV) with
polyphase resampling; other containers must be pre-converted (the
reference repo ships a resample CLI for the same reason —
``src/utils/resample.py``).
"""

from __future__ import annotations

import math
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


def waveform_modification(path: str, pad_to: int, codec) -> Tuple[np.ndarray, np.ndarray]:
    wav = load_audio(path, codec.sr)
    return pad_wav(wav, pad_to, codec)
