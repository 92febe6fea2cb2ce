"""PaSST_SED: the MAT-SED network — PaSST encoder + frequency pooling +
x10 interpolation + context-network decoder + classifier / AT branch /
MLM head.

Parity map to the reference (``src/models/passt/passt_sed.py:37-308``):
  * backbone tap at ``passt_feature_layer`` (default 10), drop the
    cls/dist tokens, LayerNorm(``out_norm``), reshape to the
    [B, f, t, C] patch grid;
  * f-pool: mean / attention / frequency-wise transformer;
  * pad the 99-frame grid to 100 by repeating the last frame, then
    linear-interpolate x``decode_ratio`` to 1000 frames;
  * optional sliding-window global/local fusion
    ``mix_rate * local + (1 - mix_rate) * global`` — the local pass
    batches all same-width windows through the backbone in one call
    (see ``models/slide.py``) instead of the reference's per-window
    Python loop;
  * decoder: transformerXL (rel-pos, optional band mask) / conformer /
    vanilla transformer / bi-GRU / none;
  * ``sigmoid(logits / temp_w)``, pad-mask zeroing, linear-softmax weak
    pooling; separate AT adapter (attention-pool over backbone frame
    tokens) and MLM reconstruction mode.

RNG collections: 'patchout' (backbone aug), 'mlm' (masking),
'dropout'.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.models.interpolate import interpolate_time
from transformer4sed_tpu.models.mlm import MLMMasker
from transformer4sed_tpu.models.passt import PaSST
from transformer4sed_tpu.models.pooling import AttentionPooling, FrequencyWiseTransformerPooling
from transformer4sed_tpu.models.sed_model import SEDOutput
from transformer4sed_tpu.models.slide import slide_window_encode
from transformer4sed_tpu.models.vit import fast_gelu, trunc_normal_init
from transformer4sed_tpu.models.xl import (
    BiGRUDecoder,
    ConformerDecoder,
    TransformerDecoder,
    TransformerXLDecoder,
)


class PaSST_SED(nn.Module):
    class_num: int = 10
    decode_ratio: int = 10
    interpolate_mode: str = "linear"
    passt_feature_layer: int = 10
    embed_dim: int = 768
    decoder_dim: int = 768
    f_pool: str = "mean_pool"
    s_patchout_f: int = 0
    s_patchout_t: int = 0
    decoder: str = "transformerXL"
    decoder_layer_num: int = 3
    decoder_pos_emd_len: int = 1000
    decoder_win_len: Optional[Any] = None
    at_adapter: bool = False
    mlm: bool = False
    mlm_dict: Optional[Dict[str, Any]] = None
    backbone_depth: int = 12
    backbone_num_heads: int = 12
    backbone_img_size: Tuple[int, int] = (128, 998)
    decoder_num_heads: int = 12
    at_adapter_heads: int = 12
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = PaSST(
            embed_dim=self.embed_dim,
            depth=self.backbone_depth,
            num_heads=self.backbone_num_heads,
            # pos-embed grid; the 20s/30s reference variants use longer
            # time grids (passt.py:1073-1232 -> PASST_VARIANTS img_size)
            img_size=tuple(self.backbone_img_size),
            s_patchout_f=self.s_patchout_f,
            s_patchout_t=self.s_patchout_t,
            tap_layers=(self.passt_feature_layer,),
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.out_norm = nn.LayerNorm(epsilon=1e-5)

        if self.f_pool == "attention":
            self.f_pool_module = AttentionPooling(num_heads=6, dtype=self.dtype)
        elif self.f_pool == "frequency_wise_tranformer_encoder":
            self.f_pool_module = FrequencyWiseTransformerPooling(dtype=self.dtype)
        elif self.f_pool != "mean_pool":
            raise NotImplementedError(f"f_pool {self.f_pool!r}")

        if self.decoder == "transformerXL":
            self.decoder_module = TransformerXLDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.decoder_num_heads,
                seq_len=self.decoder_pos_emd_len,
                window_len=self.decoder_win_len,
                use_flash=self.use_flash,
                dtype=self.dtype,
            )
            cls_in = self.decoder_dim
        elif self.decoder == "conformer":
            self.decoder_module = ConformerDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.decoder_num_heads,
                seq_len=self.decoder_pos_emd_len,
                window_len=self.decoder_win_len,
                use_flash=self.use_flash,
                dtype=self.dtype,
            )
            cls_in = self.decoder_dim
        elif self.decoder == "transformer":
            self.decoder_module = TransformerDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.decoder_num_heads,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
            cls_in = self.decoder_dim
        elif self.decoder == "gru":
            self.decoder_module = BiGRUDecoder(
                hidden_dim=self.decoder_dim, num_layers=self.decoder_layer_num, dtype=self.dtype
            )
            cls_in = 2 * self.decoder_dim
        elif self.decoder == "no":
            self.decoder_module = None
            cls_in = self.decoder_dim
        else:
            raise ValueError(f"invalid decoder {self.decoder!r}")

        self.classifier = nn.Dense(self.class_num)

        if self.at_adapter:
            self.at_pool = AttentionPooling(num_heads=self.at_adapter_heads, dtype=self.dtype)
            self.at_head = nn.Dense(self.class_num)

        if self.mlm:
            d = dict(self.mlm_dict or {})
            out_dim = d.pop("out_dim", self.decoder_dim)
            self.masker = MLMMasker(
                mask_rate=d.get("mask_rate", 0.75),
                mask_style=tuple(d.get("mask_style", (0.8, 0.1, 0.1))),
                strategy=d.get("strategy", "block"),
                block_width=d.get("block_width", 10),
            )
            self.mask_token = self.param("mask_token", trunc_normal_init(), (1, 1, self.decoder_dim))
            self.mlm_fc1 = nn.Dense(self.decoder_dim)
            self.mlm_fc2 = nn.Dense(out_dim)

    # -- pieces ----------------------------------------------------------------

    def _f_pool(self, backbone_out: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
        feat = backbone_out[f"layer{self.passt_feature_layer}_out"][:, 2:, :]  # [B, P, C]
        feat = self.out_norm(feat)
        b, p, c = feat.shape
        f_dim, t_dim = backbone_out["f_dim"], backbone_out["t_dim"]
        grid = feat.reshape(b, f_dim, t_dim, c)
        if self.f_pool == "mean_pool":
            return jnp.mean(grid, axis=1)  # [B, t, C]
        cols = grid.transpose(0, 2, 1, 3).reshape(b * t_dim, f_dim, c)
        pooled = self.f_pool_module(cols, deterministic=not train)
        return pooled.reshape(b, t_dim, c)

    def _encode_window(self, mel_win: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Window mel [N, F, W] -> frame embedding [N, t*ratio, C] (no 99->100 pad)."""
        out = self.backbone(mel_win[:, None], train=train)
        frames = self._f_pool(out, train)
        return interpolate_time(frames, self.decode_ratio, self.interpolate_mode)

    def _run_decoder(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.decoder_module is None:
            return x
        return self.decoder_module(x, deterministic=not train)

    # -- forward ----------------------------------------------------------------

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, F, T] normalised log-mel
        train: bool = False,
        encoder_win: bool = False,
        mix_rate: float = 0.5,
        win_param: Tuple[int, int] = (512, 49),
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,  # [B, frames] bool, True = padded
    ) -> SEDOutput:
        backbone_out = self.backbone(mel[:, None], train=train)
        x = self._f_pool(backbone_out, train)  # [B, t, C]
        x = jnp.concatenate([x, x[:, -1:, :]], axis=1)  # 99 -> 100 frames
        x = interpolate_time(x, self.decode_ratio, self.interpolate_mode)

        if encoder_win:
            x_local = slide_window_encode(
                lambda w: self._encode_window(w, train),
                mel,
                emb_len=x.shape[1],
                win_width=win_param[0],
                step=win_param[1],
            )
            x = mix_rate * x_local + (1.0 - mix_rate) * x

        frame_before_mask = x
        mask_id_seq = None
        if self.mlm:
            x, mask_id_seq = self.masker(self.make_rng("mlm"), x, self.mask_token)

        x = self._run_decoder(x, train)

        at_out = None
        if self.at_adapter:
            at_tokens = backbone_out["frame"][:, 2:, :]
            at_logit = self.at_head(self.at_pool(at_tokens, deterministic=not train))
            at_out = jax.nn.sigmoid(at_logit)

        if self.mlm:
            mlm_pred = self.mlm_fc2(fast_gelu(self.mlm_fc1(x)))
            return SEDOutput(
                mlm_pred=mlm_pred,
                frame_before_mask=frame_before_mask,
                mask_id_seq=mask_id_seq,
                at_out=at_out,
            )

        logits = self.classifier(x)  # [B, T, C]
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(
            strong=sed.transpose(0, 2, 1),  # [B, C, T]
            weak=weak,
            at_out=at_out,
            frame_before_mask=frame_before_mask,
        )
