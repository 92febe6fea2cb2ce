"""Legacy AST family: Kaldi-fbank frontend, deit-style AST backbone, and
the AST_SED / AST_AT heads (pre-MAT-SED baselines).

Parity targets: ``src/models/ast/ast_models.py:88-772`` and
``ast_feature_extraction.py:14-57``. Differences from PaSST: a single
*flattened* learnable positional embedding over [cls, dist, f*t patch
grid] (deit-inherited) instead of disentangled time/freq tables, and a
Kaldi fbank frontend (25 ms / 10 ms, hanning, AudioSet mean/std, padded
to 1024 frames). The reference computes fbanks in a per-sample Python
loop; here the whole batch is one fused framing + rFFT + mel GEMM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.frontend.mel import hann_window, kaldi_mel_banks
from transformer4sed_tpu.models.interpolate import interpolate_time
from transformer4sed_tpu.models.sed_model import SEDOutput
from transformer4sed_tpu.models.vit import Block, PatchEmbed, trunc_normal_init
from transformer4sed_tpu.models.xl import BiGRUDecoder, _sincos_1d


@dataclass(frozen=True)
class ASTFrontend:
    """Kaldi-fbank-compatible batched frontend (AST conventions)."""

    sr: int = 16000
    num_mel_bins: int = 128
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    target_length: int = 1024
    audioset_mean: float = -4.2677393
    audioset_std: float = 4.5689974
    preemphasis: float = 0.97

    def __call__(self, wav: jnp.ndarray, key=None, training: bool = False) -> jnp.ndarray:
        """wav [B, S] -> fbank [B, n_mels, target_length]."""
        if wav.ndim == 1:
            wav = wav[None]
        wav = wav.astype(jnp.float32)
        wav = wav - jnp.mean(wav, axis=-1, keepdims=True)

        frame_len = int(self.sr * self.frame_length_ms / 1000)  # 400
        hop = int(self.sr * self.frame_shift_ms / 1000)  # 160
        n_fft = 1 << (frame_len - 1).bit_length()  # 512

        n_frames = 1 + (wav.shape[-1] - frame_len) // hop  # snip_edges
        idx = jnp.asarray(
            (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]).astype(np.int32)
        )
        frames = wav[:, idx]  # [B, T, frame_len]
        # kaldi per-frame DC removal + pre-emphasis
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        first = frames[..., :1] * (1.0 - self.preemphasis)
        rest = frames[..., 1:] - self.preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
        frames = frames * jnp.asarray(hann_window(frame_len, periodic=False))

        # DFT as one MXU matmul instead of jnp.fft.rfft: TPU's FFT lowering
        # is ~4x slower than the matmul at these shapes (same trade as
        # frontend/mel.py:stft_magnitude). The rfft zero-pads 400 -> 512,
        # so only the first frame_len basis columns are needed.
        bins = n_fft // 2 + 1
        k = np.arange(bins)[:, None] * np.arange(frame_len)[None, :]
        ang = 2.0 * np.pi * k / n_fft
        # one stacked [cos; -sin] matmul (same shape trick as
        # frontend/mel.py:stft_magnitude), not two half-width ones
        basis = jnp.asarray(
            np.concatenate([np.cos(ang), -np.sin(ang)], axis=0), jnp.float32
        )
        out = jnp.einsum(
            "btn,cn->btc", frames, basis, preferred_element_type=jnp.float32
        )  # [B, T, 2*bins]
        spec = out[..., :bins] ** 2 + out[..., bins:] ** 2  # [B, T, bins]
        basis = kaldi_mel_banks(self.num_mel_bins, n_fft, self.sr, 20.0, self.sr / 2)
        mel = jnp.einsum("mf,btf->btm", basis, spec, preferred_element_type=jnp.float32)
        fbank = jnp.log(jnp.maximum(mel, 1.1921e-07))  # kaldi epsilon (float eps)

        t = fbank.shape[1]
        if t < self.target_length:
            fbank = jnp.pad(fbank, ((0, 0), (0, self.target_length - t), (0, 0)))
        else:
            fbank = fbank[:, : self.target_length]
        fbank = (fbank - self.audioset_mean) / (self.audioset_std * 2.0)
        return jnp.transpose(fbank, (0, 2, 1))  # [B, F, T]

    def normalize(self, fbank):
        return fbank


class AST(nn.Module):
    """deit-style AST backbone: flat pos embed over [cls, dist, patches]."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    input_fdim: int = 128
    input_tdim: int = 1024
    fstride: int = 10
    tstride: int = 10
    patch_size: Tuple[int, int] = (16, 16)
    label_dim: int = 527
    tap_layers: Tuple[int, ...] = (10,)
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> Tuple[int, int]:
        return (
            (self.input_fdim - self.patch_size[0]) // self.fstride + 1,
            (self.input_tdim - self.patch_size[1]) // self.tstride + 1,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: [B, 1, F, T] normalised fbank."""
        patches = PatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            stride=(self.fstride, self.tstride),
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # [B, D, F', T']
        b, d, f_dim, t_dim = patches.shape
        seq = patches.reshape(b, d, f_dim * t_dim).transpose(0, 2, 1)

        cls_token = self.param("cls_token", trunc_normal_init(), (1, 1, self.embed_dim))
        dist_token = self.param("dist_token", trunc_normal_init(), (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(),
            (1, 2 + self.grid[0] * self.grid[1], self.embed_dim),
        )
        seq = jnp.concatenate(
            [jnp.tile(cls_token, (b, 1, 1)), jnp.tile(dist_token, (b, 1, 1)), seq], axis=1
        )
        seq = seq + pos_embed[:, : seq.shape[1]]

        out: Dict[str, jnp.ndarray] = {}
        taps = set(self.tap_layers)
        h = seq.astype(self.dtype)
        for i in range(self.depth):
            h = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(h, deterministic=not train)
            if (i + 1) in taps:
                out[f"layer{i + 1}_out"] = h.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h.astype(jnp.float32))
        out["frame"] = h
        globals_ = (h[:, 0] + h[:, 1]) / 2.0
        out["globals"] = nn.Dense(self.label_dim, name="mlp_head")(
            nn.LayerNorm(epsilon=1e-6, name="mlp_head_norm")(globals_)
        )
        out["f_dim"], out["t_dim"] = f_dim, t_dim
        return out


class AST_SED(nn.Module):
    """AST backbone + f-pool + GRU/transformer context + classifier."""

    class_num: int = 10
    decode_ratio: int = 10
    ast_feature_layer: int = 10
    f_pool: str = "mean_pool"
    context_block: str = "gru"
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    input_fdim: int = 128
    input_tdim: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = AST(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            input_fdim=self.input_fdim,
            input_tdim=self.input_tdim,
            tap_layers=(self.ast_feature_layer,),
            dtype=self.dtype,
        )
        self.out_norm = nn.LayerNorm(epsilon=1e-5)
        if self.f_pool == "frequency_wise_tranformer_encoder":
            from transformer4sed_tpu.models.pooling import FrequencyWiseTransformerPooling

            self.f_pool_module = FrequencyWiseTransformerPooling(dtype=self.dtype)
        elif self.f_pool not in ("mean_pool",):
            raise ValueError(f"unsupported f_pool {self.f_pool!r}")

        if self.context_block in ("gru", "local_gru_decoder"):
            self.decoder_module = BiGRUDecoder(hidden_dim=self.embed_dim, num_layers=2, dtype=self.dtype)
            cls_in = 2 * self.embed_dim
        elif self.context_block == "transformer":
            from transformer4sed_tpu.models.xl import TransformerDecoder

            self.decoder_module = TransformerDecoder(
                decoder_layer_num=2,
                num_heads=4,
                mlp_ratio=4.0,
                add_pos_embed=True,
                dtype=self.dtype,
            )
            cls_in = self.embed_dim
        elif self.context_block == "no":
            self.decoder_module = None
            cls_in = self.embed_dim
        else:
            raise ValueError(f"invalid context block {self.context_block!r}")
        self.classifier = nn.Dense(self.class_num)

    def __call__(
        self,
        fbank: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        out = self.backbone(fbank[:, None], train=train)
        feat = out[f"layer{self.ast_feature_layer}_out"][:, 2:, :]
        feat = self.out_norm(feat)
        b, p, c = feat.shape
        grid = feat.reshape(b, out["f_dim"], out["t_dim"], c)
        if self.f_pool == "mean_pool":
            frames = jnp.mean(grid, axis=1)
        else:
            cols = grid.transpose(0, 2, 1, 3).reshape(b * out["t_dim"], out["f_dim"], c)
            frames = self.f_pool_module(cols, deterministic=not train).reshape(b, out["t_dim"], c)
        frames = interpolate_time(frames, self.decode_ratio, "linear")
        h = self.decoder_module(frames, deterministic=not train) if self.decoder_module else frames
        logits = self.classifier(h)
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(strong=sed.transpose(0, 2, 1), weak=weak)


class AST_AT(nn.Module):
    """Audio-tagging-only AST head (reference AST_AT)."""

    class_num: int = 527
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    input_fdim: int = 128
    input_tdim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fbank: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = AST(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            input_fdim=self.input_fdim,
            input_tdim=self.input_tdim,
            label_dim=self.class_num,
            tap_layers=(),
            dtype=self.dtype,
            name="backbone",
        )(fbank[:, None], train=train)
        return jax.nn.sigmoid(out["globals"])


class ASTWithSlide(nn.Module):
    """AST_SED with sliding-window overlap-add encoding
    (reference ``ASTWithSlide``, ``ast_models.py:562-658``): fbank
    windows run through the backbone + f-pool independently and are
    overlap-added into the output frame grid."""

    class_num: int = 10
    decode_ratio: int = 10
    ast_feature_layer: int = 10
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    input_fdim: int = 128
    input_tdim: int = 1024
    win_width: int = 256
    step: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = AST(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            input_fdim=self.input_fdim,
            input_tdim=self.win_width,
            tap_layers=(self.ast_feature_layer,),
            dtype=self.dtype,
        )
        self.out_norm = nn.LayerNorm(epsilon=1e-5)
        self.decoder_module = BiGRUDecoder(hidden_dim=self.embed_dim, num_layers=2, dtype=self.dtype)
        self.classifier = nn.Dense(self.class_num)

    def _encode_window(self, fbank_win: jnp.ndarray, train: bool) -> jnp.ndarray:
        out = self.backbone(fbank_win[:, None], train=train)
        feat = self.out_norm(out[f"layer{self.ast_feature_layer}_out"][:, 2:, :])
        b, p, c = feat.shape
        grid = feat.reshape(b, out["f_dim"], out["t_dim"], c)
        frames = jnp.mean(grid, axis=1)
        return interpolate_time(frames, self.decode_ratio, "linear")

    def __call__(
        self,
        fbank: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        from transformer4sed_tpu.models.slide import slide_window_encode

        t = fbank.shape[-1]
        # output grid scaled so a full-width window fills its span exactly
        emb_len = ((self.win_width - 16) // 10 + 1) * self.decode_ratio * t // self.win_width
        x = slide_window_encode(
            lambda w: self._encode_window(w, train),
            fbank,
            emb_len=emb_len,
            win_width=self.win_width,
            step=self.step,
        )
        h = self.decoder_module(x, deterministic=not train)
        logits = self.classifier(h)
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            pm = pad_mask[:, : sed.shape[1]]
            sed = jnp.where(pm[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(strong=sed.transpose(0, 2, 1), weak=weak)

