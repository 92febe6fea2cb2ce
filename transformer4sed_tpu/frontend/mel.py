"""Waveform -> log-mel frontends, fully on-device and jit-friendly.

One parametrised STFT+mel pipeline reproduces the reference's frontend
variants:

  * PaSST (``src/models/passt/passt_feature_extraction.py:53-94``):
    wav peak-norm -> pre-emphasis -> STFT(1024/320/800, Hann
    periodic=False, center/reflect) -> power -> Kaldi mel banks with
    *random fmin/fmax augmentation* -> log "fast normalisation".
  * Generic CRNN (``src/preprocess/feats_extraction.py:41-57``):
    magnitude mel (Hamming periodic=False, HTK scale, no norm) ->
     20*log10 with amin 1e-5 -> clamp [-50, 80].

TPU notes: framing is a static gather, the DFT is an rFFT, and the mel
projection is a single [n_mels, n_bins] x [n_bins, T] GEMM that XLA
fuses with the surrounding elementwise ops. The fmin/fmax augmentation
is computed *inside* jit from traced scalars — the Kaldi filterbank
formula is closed-form, so no host round-trip or basis-bank staging is
needed.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# -- windows ------------------------------------------------------------------

def hann_window(win_length: int, periodic: bool = False) -> np.ndarray:
    """Hann window; ``periodic=False`` matches torch.hann_window(periodic=False)."""
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def hamming_window(win_length: int, periodic: bool = False) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


# -- STFT ---------------------------------------------------------------------

def _frame_indices(n_samples: int, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + n_samples // hop
    return (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: jnp.ndarray,
    power: float = 2.0,
) -> jnp.ndarray:
    """Center-padded STFT -> |X|^power, shape ``[B, n_fft//2 + 1, T]``.

    Matches torch.stft(center=True, pad_mode='reflect') frame layout:
    a window shorter than n_fft is zero-padded symmetrically.
    """
    if wav.ndim == 1:
        wav = wav[None]
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")

    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        full_window = jnp.zeros((n_fft,), dtype=window.dtype).at[left : left + win_length].set(window)
    else:
        full_window = window

    # windowed DFT as frame-gather + one MXU matmul. TPU's FFT lowering
    # measured 23.7 ms at the PaSST shape (B=64, 1001 frames of 1024);
    # this path runs 5.8 ms. Default matmul precision (bf16 passes for
    # f32 operands) costs ~0.4% relative spectrogram error — ~1e-3 in
    # the normalized log-mel features, far below augmentation noise —
    # while HIGH/HIGHEST measured 15.9/18.1 ms. CPU (tests/parity)
    # computes in full f32 regardless of the precision flag.
    bins = n_fft // 2 + 1
    k = np.arange(bins)[:, None] * np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k / n_fft
    basis = jnp.asarray(
        np.concatenate([np.cos(ang), -np.sin(ang)], axis=0), dtype=jnp.float32
    ) * full_window[None, :]
    idx = jnp.asarray(_frame_indices(wav.shape[-1], n_fft, hop_length))
    frames = x[:, idx]  # [B, T, n_fft]
    out = jnp.einsum("btn,cn->bct", frames.astype(jnp.float32), basis)  # [B, 2*bins, T]
    mag2 = out[:, :bins] ** 2 + out[:, bins:] ** 2
    if power == 2.0:
        return mag2
    mag = jnp.sqrt(jnp.maximum(mag2, 0.0))
    return mag ** power if power != 1.0 else mag


# -- mel filterbanks ----------------------------------------------------------

def _kaldi_mel(freq):
    return 1127.0 * jnp.log(1.0 + freq / 700.0)


def kaldi_mel_banks(n_mels: int, n_fft: int, sr: float, fmin, fmax) -> jnp.ndarray:
    """Kaldi-style mel filterbank, ``[n_mels, n_fft//2 + 1]``.

    Parity target: torchaudio.compliance.kaldi.get_mel_banks (as used at
    ``passt_feature_extraction.py:73-81``) which emits ``n_fft//2``
    columns; the Nyquist column here is the zero pad the reference adds
    by hand. ``fmin``/``fmax`` may be traced scalars, enabling in-jit
    frequency-range augmentation.
    """
    num_fft_bins = n_fft // 2
    fft_bin_width = sr / n_fft
    mel_low = _kaldi_mel(jnp.asarray(fmin, jnp.float32))
    mel_high = _kaldi_mel(jnp.asarray(fmax, jnp.float32))
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bins = jnp.arange(n_mels, dtype=jnp.float32)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    freqs = fft_bin_width * jnp.arange(num_fft_bins, dtype=jnp.float32)[None, :]
    mel = _kaldi_mel(freqs)
    up = (mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel) / (right_mel - center_mel)
    weights = jnp.maximum(0.0, jnp.minimum(up, down))
    # zero Nyquist column (reference pads it manually)
    return jnp.pad(weights, ((0, 0), (0, 1)))


def _htk_mel(freq):
    return 2595.0 * jnp.log10(1.0 + freq / 700.0)


def _htk_mel_inv(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def htk_mel_banks(n_mels: int, n_fft: int, sr: float, fmin: float, fmax: float) -> jnp.ndarray:
    """torchaudio ``melscale_fbanks(mel_scale='htk', norm=None)`` parity.

    Returns ``[n_mels, n_fft//2 + 1]`` triangular filters (transposed
    w.r.t. torchaudio's [n_freqs, n_mels] layout for a direct GEMM).
    """
    n_freqs = n_fft // 2 + 1
    freqs = jnp.linspace(0.0, sr / 2.0, n_freqs)
    m_pts = jnp.linspace(_htk_mel(jnp.asarray(fmin)), _htk_mel(jnp.asarray(fmax)), n_mels + 2)
    f_pts = _htk_mel_inv(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = jnp.maximum(0.0, jnp.minimum(down, up))  # [n_freqs, n_mels]
    return fb.T


# -- normalisations -----------------------------------------------------------

def fast_normalize(mel: jnp.ndarray) -> jnp.ndarray:
    """PaSST "fast normalization": (log(x + 1e-5) + 4.5) / 5."""
    return (jnp.log(mel + 1e-5) + 4.5) / 5.0


def amplitude_to_db(
    mel: jnp.ndarray, amin: float = 1e-5, clamp: Tuple[float, float] = (-50.0, 80.0)
) -> jnp.ndarray:
    """20*log10(max(x, amin)), clamped — the reference ``take_log``."""
    db = 20.0 * jnp.log10(jnp.maximum(mel, amin))
    return jnp.clip(db, clamp[0], clamp[1])


def peak_normalize_wav(wav: jnp.ndarray) -> jnp.ndarray:
    max_abs = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return wav / (max_abs + 1e-10)


# -- frontends ----------------------------------------------------------------

@dataclass(frozen=True)
class PasstFrontend:
    """PaSST log-mel frontend with in-jit fmin/fmax augmentation.

    ``__call__`` returns the *power mel* (like the reference forward);
    apply :func:`fast_normalize` afterwards (the reference calls
    ``.normalize`` separately in the trainers).
    """

    n_mels: int = 128
    sr: int = 32000
    win_length: int = 800
    hop_length: int = 320
    n_fft: int = 1024
    fmin: float = 0.0
    fmax: Optional[float] = None
    wav_norm: bool = True
    fmin_aug_range: int = 10
    fmax_aug_range: int = 2000
    preemphasis: float = 0.97

    @property
    def effective_fmax(self) -> float:
        if self.fmax is not None:
            return self.fmax
        return self.sr // 2 - self.fmax_aug_range // 2

    def __call__(
        self,
        wav: jnp.ndarray,
        key: Optional[jax.Array] = None,
        training: bool = False,
    ) -> jnp.ndarray:
        """wav [B, n_samples] -> power mel [B, n_mels, T]."""
        if wav.ndim == 1:
            wav = wav[None]
        wav = wav.astype(jnp.float32)
        if self.wav_norm:
            wav = peak_normalize_wav(wav)
        # pre-emphasis: valid conv with kernel [-0.97, 1] -> y[t] = x[t+1] - 0.97 x[t]
        wav = wav[:, 1:] - self.preemphasis * wav[:, :-1]

        window = jnp.asarray(hann_window(self.win_length, periodic=False))
        power = stft_magnitude(wav, self.n_fft, self.hop_length, self.win_length, window, power=2.0)

        fmin, fmax = self.fmin, self.effective_fmax
        if training and key is not None:
            kmin, kmax = jax.random.split(key)
            fmin = fmin + jax.random.randint(kmin, (), 0, self.fmin_aug_range).astype(jnp.float32)
            fmax = (
                fmax
                + self.fmax_aug_range // 2
                - jax.random.randint(kmax, (), 0, self.fmax_aug_range).astype(jnp.float32)
            )
        basis = kaldi_mel_banks(self.n_mels, self.n_fft, self.sr, fmin, fmax)
        # float32 GEMM (the reference disables autocast for this matmul)
        return jnp.einsum(
            "mf,bft->bmt", basis, power, preferred_element_type=jnp.float32
        )

    def normalize(self, mel: jnp.ndarray) -> jnp.ndarray:
        return fast_normalize(mel)

    @property
    def n_frames_for(self):
        """n output frames for a given sample count (preemphasis drops one sample)."""
        return lambda n_samples: 1 + (n_samples - 1) // self.hop_length


@dataclass(frozen=True)
class MelFrontend:
    """Generic magnitude-mel frontend (reference ``setmelspectrogram`` + ``take_log``)."""

    sr: int = 16000
    n_fft: int = 2048
    win_length: Optional[int] = None
    hop_length: int = 256
    fmin: float = 0.0
    fmax: Optional[float] = None
    n_mels: int = 128
    power: float = 1.0
    log: bool = True

    def __call__(self, wav: jnp.ndarray, key=None, training: bool = False) -> jnp.ndarray:
        if wav.ndim == 1:
            wav = wav[None]
        win_length = self.win_length or self.n_fft
        fmax = self.fmax if self.fmax is not None else self.sr / 2
        window = jnp.asarray(hamming_window(win_length, periodic=False))
        spec = stft_magnitude(
            wav.astype(jnp.float32), self.n_fft, self.hop_length, win_length, window, power=self.power
        )
        basis = htk_mel_banks(self.n_mels, self.n_fft, self.sr, self.fmin, fmax)
        mel = jnp.einsum("mf,bft->bmt", basis, spec, preferred_element_type=jnp.float32)
        if self.log:
            mel = amplitude_to_db(mel)
        return mel

    def normalize(self, mel: jnp.ndarray) -> jnp.ndarray:
        return mel
