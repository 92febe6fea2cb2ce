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
        # mlp_head = Sequential(PLAIN nn.LayerNorm, Linear) -> eps 1e-5
        # (ast_models.py:137), unlike the backbone's timm 1e-6 norms
        out["globals"] = nn.Dense(self.label_dim, name="mlp_head")(
            nn.LayerNorm(epsilon=1e-5, name="mlp_head_norm")(globals_)
        )
        out["f_dim"], out["t_dim"] = f_dim, t_dim
        return out


class AST_SED(nn.Module):
    """AST backbone + f-pool + GRU/transformer context + classifier.

    Parity: ``ast_models.py:395-559``. Field defaults mirror the
    reference constructor (f_pool='frequency_wise_tranformer_encoder',
    context_block='local_gru_decoder'). Interpolation happens ONLY for
    ``local_gru_decoder`` and in NEAREST mode (``F.interpolate``'s
    default, ast_models.py:538); plain ``gru``/``transformer``/``no``
    decode at patch-time resolution. ``temp_w`` is kept for the shared
    SED head contract — the reference AST_SED applies no temperature
    (ast_models.py:556), so the default 1.0 is parity.
    """

    class_num: int = 10
    decode_ratio: int = 10
    ast_feature_layer: int = 10
    f_pool: str = "frequency_wise_tranformer_encoder"
    context_block: str = "local_gru_decoder"
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

            # reference builds timm Blocks with a PLAIN nn.LayerNorm
            # norm_layer (ast_models.py:464) -> eps 1e-5, qkv_bias False;
            # pos table = fixed sincos over grid_size = init t_dim - 1
            # (ast_models.py:468-474) added as an absolute prefix slice
            self.decoder_module = TransformerDecoder(
                decoder_layer_num=2,
                num_heads=4,
                mlp_ratio=4.0,
                qkv_bias=False,
                ln_eps=1e-5,
                seq_len=(self.input_tdim - 16) // 10 + 1,
                add_pos_embed=True,
                dtype=self.dtype,
            )
            self.decoder_norm = nn.LayerNorm(epsilon=1e-5)
            cls_in = self.embed_dim
        elif self.context_block == "no":
            self.decoder_module = None
            cls_in = self.embed_dim
        else:
            raise ValueError(f"invalid context block {self.context_block!r}")
        self.classifier = nn.Dense(self.class_num)

    def encode_frames(self, fbank: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """fbank [B, F, T] -> frame embeddings [B, t_dim, C]: backbone tap,
        out_norm, frequency pooling (``AST_SED.forward`` ast_models.py:490-522
        == ``ASTWithSlide.encode`` :601-643)."""
        out = self.backbone(fbank[:, None], train=train)
        feat = out[f"layer{self.ast_feature_layer}_out"][:, 2:, :]
        feat = self.out_norm(feat)
        b, p, c = feat.shape
        grid = feat.reshape(b, out["f_dim"], out["t_dim"], c)
        if self.f_pool == "mean_pool":
            return jnp.mean(grid, axis=1)
        cols = grid.transpose(0, 2, 1, 3).reshape(b * out["t_dim"], out["f_dim"], c)
        return self.f_pool_module(cols, deterministic=not train).reshape(b, out["t_dim"], c)

    def __call__(
        self,
        fbank: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        frames = self.encode_frames(fbank, train=train)
        if self.context_block == "local_gru_decoder":
            frames = interpolate_time(frames, self.decode_ratio, "nearest")
        h = self.decoder_module(frames, deterministic=not train) if self.decoder_module else frames
        if self.context_block == "transformer":
            h = self.decoder_norm(h)
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


class ASTWithSlide(AST_SED):
    """AST_SED with sliding-window overlap-add encoding (reference
    ``ASTWithSlide``, ``ast_models.py:562-658``).

    Reference scheme: each fbank window runs through backbone + f-pool
    at PATCH resolution (``encode``, no interpolation), windows are
    overlap-added into a ``round(T * scale)`` frame grid and averaged by
    visit count, the grid is cropped to its first 100 frames
    (``forward`` :594, hardcoded), then nearest-interpolated x
    ``decode_ratio`` and decoded by the GRU. ``scale`` is the
    reference's hardcoded ``101/1024`` patch-per-frame ratio (:572),
    exposed as a field so small-geometry tests can keep full coverage.

    TPU-first deviation (documented): the reference loops windows
    sequentially on-device; here all windows are one batched backbone
    call and the overlap-add is a single scatter-add — identical
    numerics, one MXU-friendly kernel. Requires static full-width
    windows: ``(T - win_width) % step == 0`` (the reference's own 1024 /
    256 / 16 satisfies it; other combinations would give the torch code
    ragged tail windows).
    """

    win_width: int = 256
    step: int = 16
    scale: float = 101.0 / 1024.0

    def __call__(  # type: ignore[override]
        self,
        fbank: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        if self.context_block not in ("gru", "local_gru_decoder"):
            raise ValueError("ASTWithSlide decodes with the GRU (rnn_decode)")
        b, f, t = fbank.shape
        win, step = self.win_width, self.step
        if (t - win) % step != 0:
            raise ValueError(
                f"T={t} not compatible with win={win}, step={step}: static "
                "full-width windows require (T - win) % step == 0"
            )
        starts = list(range(0, t + step - win, step))
        w = len(starts)
        wins = jnp.stack(
            [jax.lax.slice_in_dim(fbank, s, s + win, axis=2) for s in starts], axis=1
        ).reshape(b * w, f, win)
        frames = self.encode_frames(wins, train=train)  # [B*W, t_w, C]
        t_w, c = frames.shape[1], frames.shape[2]
        frames = frames.reshape(b, w * t_w, c)

        # overlap-add at patch resolution (reference :581-591): window i
        # writes rows [round(start_i*scale), min(P, ...+t_w)); clipped
        # writes land in a dump slot P. Python round() == torch round().
        p = round(t * self.scale)
        idx = np.full((w, t_w), p, np.int32)
        for i, s in enumerate(starts):
            left = round(s * self.scale)
            for j in range(t_w):
                if left + j < p:
                    idx[i, j] = left + j
        # geometry is static, so uncovered rows are detectable at trace
        # time. Upstream's AST slide divides without an isnan fix
        # (ast_models.py:591 — unlike encoder_slide_window.py:34-35,
        # which zero-fills), so an uncovered row *inside* the :100 crop
        # is NaN upstream; we fail loud instead (deviation #8,
        # PARITY.md). Rows at/after the crop are discarded upstream and
        # harmless, so they are exempt.
        crop = min(100, p)
        visits = np.bincount(idx.reshape(-1), minlength=p + 1)[:crop]
        if (visits == 0).any():
            bad = np.where(visits == 0)[0]
            raise ValueError(
                f"slide geometry leaves {bad.size} of the first {crop} grid rows "
                f"uncovered (first: {bad[:5].tolist()}) for win={win}, step={step}, "
                f"scale={self.scale} — upstream's overlap-add would produce NaN rows"
            )
        idx_flat = jnp.asarray(idx.reshape(-1))
        emb = jnp.zeros((b, p + 1, c), frames.dtype).at[:, idx_flat, :].add(frames)
        acc = jnp.zeros((p + 1,), frames.dtype).at[idx_flat].add(1.0)
        emb = emb[:, :p] / acc[:p][None, :, None]

        x = emb[:, : min(100, p)]  # reference crop :594
        x = interpolate_time(x, self.decode_ratio, "nearest")  # rnn_decode :645-652
        h = self.decoder_module(x, deterministic=not train)
        logits = self.classifier(h)
        sed = jax.nn.sigmoid(logits / temp_w)  # no temperature upstream; 1.0 == parity
        if pad_mask is not None:
            pm = pad_mask[:, : sed.shape[1]]
            sed = jnp.where(pm[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(strong=sed.transpose(0, 2, 1), weak=weak)

