"""HTS-AT: hierarchical token-semantic audio transformer (Swin) backbone.

Flax reimplementation of the vendored HTSAT
(``src/models/htsat/htsat.py:621-945``), the audio branch of CLAP:

  * log-mel (64 bins, torchlibrosa semantics — see
    :class:`HTSATFrontend`) -> per-mel-bin BatchNorm (``bn0``) ->
    ``reshape_wav2img`` frequency-ratio folding into a
    [spec_size, spec_size] "image";
  * Swin stages (window attention + relative position bias, shifted
    windows, patch merging), CLAP-tiny config: patch 4, embed 96,
    depths (2,2,6,2), heads (4,8,16,32), window 8;
  * heads: token-semantic ``tscam`` conv -> framewise/clipwise outputs,
    plus the ``fine_grained_embedding`` (freq-fold mean of the final
    feature map) that HTSAT_CNN / DASM_HTSAT / CLAP_SED consume.

The reference upsamples short mels with bicubic align_corners=True
(``htsat.py:855-859``); reproduced exactly via a precomputed
cubic-convolution matrix (A=-0.75, torch semantics) applied as an MXU
matmul — live-oracle-pinned in ``tests/test_reference_live.py``.
Stochastic depth defaults to 0 (the reference's 0.1 matters only for
from-scratch training).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.frontend.mel import stft_magnitude, hann_window
from transformer4sed_tpu.models.norm import RefBatchNorm
from transformer4sed_tpu.models.vit import Mlp, trunc_normal_init


# -- slaney mel (librosa default, used by torchlibrosa LogmelFilterBank) -------

def _hz_to_slaney_mel(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _slaney_mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    f = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def slaney_mel_banks(n_mels: int, n_fft: int, sr: float, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') parity, [n_mels, n_fft//2+1]."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_slaney_mel(fmin), _hz_to_slaney_mel(fmax), n_mels + 2)
    hz_pts = _slaney_mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@dataclass(frozen=True)
class HTSATFrontend:
    """torchlibrosa Spectrogram+LogmelFilterBank parity (CLAP tiny config)."""

    sr: int = 32000
    n_fft: int = 1024
    hop_length: int = 320
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    ref: float = 1.0
    amin: float = 1e-10

    def __call__(self, wav: jnp.ndarray, key=None, training: bool = False) -> jnp.ndarray:
        """wav [B, S] -> log-mel [B, 1, T, n_mels]."""
        if wav.ndim == 1:
            wav = wav[None]
        window = jnp.asarray(hann_window(self.n_fft, periodic=True))
        power = stft_magnitude(
            wav.astype(jnp.float32), self.n_fft, self.hop_length, self.n_fft, window, power=2.0
        )  # [B, bins, T]
        basis = jnp.asarray(slaney_mel_banks(self.n_mels, self.n_fft, self.sr, self.fmin, self.fmax))
        mel = jnp.einsum("mf,bft->bmt", basis, power, preferred_element_type=jnp.float32)
        logmel = 10.0 * jnp.log10(jnp.maximum(mel, self.amin)) - 10.0 * jnp.log10(
            jnp.maximum(jnp.asarray(self.ref), self.amin)
        )
        return jnp.transpose(logmel, (0, 2, 1))[:, None]  # [B, 1, T, F]

    def normalize(self, mel):
        return mel


def bicubic_resize_matrix(in_len: int, out_len: int, a: float = -0.75) -> np.ndarray:
    """[out, in] weights reproducing torch ``F.interpolate(mode='bicubic',
    align_corners=True)`` along one axis (cubic convolution, Keys A=-0.75,
    out-of-range taps clamped to the border). Host-side, static shapes."""

    def cc1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def cc2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    w = np.zeros((out_len, in_len), dtype=np.float64)
    scale = (in_len - 1) / (out_len - 1) if out_len > 1 else 0.0
    for i in range(out_len):
        real = i * scale
        f = int(np.floor(real))
        frac = real - f
        taps = (f - 1, f, f + 1, f + 2)
        coefs = (cc2(frac + 1.0), cc1(frac), cc1(1.0 - frac), cc2(2.0 - frac))
        for idx, cf in zip(taps, coefs):
            w[i, min(max(idx, 0), in_len - 1)] += cf
    return w.astype(np.float32)


# -- Swin pieces ----------------------------------------------------------------

def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    b, h, width, c = x.shape
    x = x.reshape(b, h // w, w, width // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, width: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    b = windows.shape[0] // (h * width // w // w)
    x = windows.reshape(b, h // w, width // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, width, -1)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [w², w²]


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        n_windows: int = 1,
    ) -> jnp.ndarray:
        bnw, n, c = x.shape
        w = self.window_size
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(),
            ((2 * w - 1) * (2 * w - 1), h),
        )
        idx = jnp.asarray(_relative_position_index(w).reshape(-1))
        bias = bias_table[idx].reshape(n, n, h).transpose(2, 0, 1)  # [H, w², w²]

        if self.use_flash:
            # fused Pallas kernel on TPU (windows packed onto MXU tiles,
            # scores never reach HBM); identical-math XLA path elsewhere
            from transformer4sed_tpu.kernels.window_attention import swin_window_attention

            n_w = n_windows if mask is None else int(mask.shape[0])
            out = swin_window_attention(q, k, v, bias, mask, n_w, scale)
            out = out.reshape(bnw, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        attn = attn + bias[None]

        if mask is not None:  # [nW, n, n] additive
            n_w = mask.shape[0]
            attn = attn.reshape(bnw // n_w, n_w, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _shift_attn_mask(h: int, width: int, w: int, shift: int) -> np.ndarray:
    """Additive [-inf/0] mask for shifted windows, [nW, w², w²].

    Pure numpy: under jit even constant jnp ops are staged to tracers,
    and this mask must stay a compile-time constant.
    """
    img = np.zeros((h, width))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(h // w, w, width // w, w)
        .transpose(0, 2, 1, 3)
        .reshape(-1, w * w)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hgt, wdt = self.input_resolution
        b, l, c = x.shape
        assert l == hgt * wdt
        win = min(self.window_size, hgt, wdt)
        shift = 0 if win >= min(hgt, wdt) and self.shift_size else self.shift_size
        shift = 0 if win == min(hgt, wdt) and self.shift_size >= win else shift
        if win >= min(hgt, wdt):
            shift = 0

        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, hgt, wdt, c)
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        windows = window_partition(h, win)
        mask = jnp.asarray(_shift_attn_mask(hgt, wdt, win, shift)) if shift else None
        # Kernel on in training. Controlled same-session A/B of the
        # HTSAT_CNN full supervised step (447 classes, T_out=320) with
        # the fully-Pallas saved-O backward (kernels/window_attention.py):
        #   B=32: XLA 202.0 ms vs kernel 211.2 ms  (kernel -4.4%)
        #   B=64: XLA 305.7 ms vs kernel 300.3 ms  (kernel +1.8%)
        # The AudioSet recipe trains at B=64 (config/audioset_strong),
        # where the kernel wins; the small-batch loss comes from the
        # extra in-VMEM softmax recompute amortising worse when fewer
        # windows share a packed tile. Eval/serving keeps the 1.16x
        # forward win at every batch size. Callers who train small
        # batches can set use_flash=False (static, trace-time branch).
        attn_out = WindowAttention(
            num_heads=self.num_heads, window_size=win, qkv_bias=self.qkv_bias,
            use_flash=self.use_flash, dtype=self.dtype, name="attn",
        )(windows, mask=mask, n_windows=(hgt // win) * (wdt // win))
        h = window_reverse(attn_out, win, hgt, wdt)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = x + h.reshape(b, l, c)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            h, deterministic=deterministic
        )
        return x


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hgt, wdt = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, hgt, wdt, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        ).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class HTSAT(nn.Module):
    """HTS-AT Swin backbone + token-semantic heads (CLAP audio branch)."""

    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    num_classes: int = 527
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_flash: bool = True
    mel_bins: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    def reshape_wav2img(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fold [B, 1, T, F] log-mel into a [B, 1, S, S] image (htsat.py:848-863)."""
        b, c, t, f = x.shape
        target_t = self.spec_size * self.freq_ratio
        target_f = self.spec_size // self.freq_ratio
        assert t <= target_t and f <= target_f, "mel larger than swin input"
        if t < target_t:
            # torch F.interpolate(mode='bicubic', align_corners=True) exactly:
            # a static [out, in] cubic-convolution matrix -> one matmul
            w = jnp.asarray(bicubic_resize_matrix(t, target_t), x.dtype)
            x = jnp.einsum("ot,bctf->bcof", w, x)
        if f < target_f:
            w = jnp.asarray(bicubic_resize_matrix(f, target_f), x.dtype)
            x = jnp.einsum("of,bctf->bcto", w, x)
        x = x.transpose(0, 1, 3, 2)  # [B, C, F, T]
        x = x.reshape(b, c, target_f, self.freq_ratio, target_t // self.freq_ratio)
        x = x.transpose(0, 1, 3, 2, 4)
        return x.reshape(b, c, self.freq_ratio * target_f, target_t // self.freq_ratio)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """mel: [B, 1, T, F] log-mel (after bn0). Returns the reference's
        output dict: framewise_output, clipwise_output,
        fine_grained_embedding, embedding."""
        # per-mel-bin batchnorm (reference bn0 = BatchNorm2d over mel bins)
        h = mel[:, 0]  # [B, T, F]: stats per mel bin (feature axis)
        h = RefBatchNorm(use_running_average=not train, momentum=0.1, epsilon=1e-5, name="bn0")(h)
        mel = h[:, None]

        x = self.reshape_wav2img(mel)  # [B, 1, S, S]
        frames_num = x.shape[2]

        # patch embed: conv(k=4, s=4) + LN, NHWC
        h = x.transpose(0, 2, 3, 1)
        h = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=self.patch_stride,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed_proj",
        )(h)
        gh, gw = h.shape[1], h.shape[2]
        h = h.reshape(h.shape[0], gh * gw, self.embed_dim)
        h = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(h)

        res = (gh, gw)
        for i_layer, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i_layer)
            for blk in range(depth):
                h = SwinBlock(
                    input_resolution=res,
                    num_heads=self.num_heads[i_layer],
                    window_size=self.window_size,
                    shift_size=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    use_flash=self.use_flash,
                    dtype=self.dtype,
                    name=f"layers_{i_layer}_blocks_{blk}",
                )(h, deterministic=not train)
            if i_layer < len(self.depths) - 1:
                h = PatchMerging(input_resolution=res, dtype=self.dtype, name=f"layers_{i_layer}_downsample")(h)
                res = (res[0] // 2, res[1] // 2)

        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        b, n, c = h.shape
        sf = frames_num // (2 ** (len(self.depths) - 1)) // self.patch_stride[0]
        st = x.shape[3] // (2 ** (len(self.depths) - 1)) // self.patch_stride[1]
        grid = h.transpose(0, 2, 1).reshape(b, c, sf, st)

        # unfold the freq-ratio folding: [B, C, F', ratio * T']
        c_freq_bin = sf // self.freq_ratio
        grid = grid.reshape(b, c, sf // c_freq_bin, c_freq_bin, st)
        grid = grid.transpose(0, 1, 3, 2, 4).reshape(b, c, c_freq_bin, -1)

        fine_grained = jnp.mean(grid, axis=2).transpose(0, 2, 1)  # [B, T'', C]
        embedding = jnp.mean(grid.reshape(b, c, -1), axis=2)

        # token-semantic head: conv (c_freq_bin, 3)
        tg = grid.transpose(0, 2, 3, 1)  # NHWC [B, F', T'', C]
        logits_map = nn.Conv(
            self.num_classes,
            kernel_size=(c_freq_bin, 3),
            padding=((0, 0), (1, 1)),
            dtype=self.dtype,
            name="tscam_conv",
        )(tg)  # [B, 1, T'', classes]
        logits = logits_map[:, 0]  # [B, T'', classes]

        from transformer4sed_tpu.models.interpolate import interpolate_time

        framewise = interpolate_time(
            jax.nn.sigmoid(logits), 8 * self.patch_stride[1], mode="nearest"
        )
        clipwise = jax.nn.sigmoid(jnp.mean(logits, axis=1))
        return {
            "framewise_output": framewise,
            "clipwise_output": clipwise,
            "fine_grained_embedding": fine_grained,
            "embedding": embedding,
            "latent_t": fine_grained.shape[1],
        }


def create_htsat_model(config: str = "tiny", **overrides) -> HTSAT:
    """Factory matching the reference ``create_htsat_model`` sizes
    (``htsat.py:901-945``)."""
    sizes = {
        "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32)),
        "base": dict(embed_dim=128, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
        "large": dict(embed_dim=256, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
    }
    kwargs = dict(sizes[config])
    kwargs.update(overrides)
    return HTSAT(**kwargs)
