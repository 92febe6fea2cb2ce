"""DASM: open-vocabulary SED with text/audio multi-modal queries.

Parity map (``src/models/detect_any_sound/detect_any_sound.py:18-416``
and ``at_adapter.py:7-50``):

  * PaSST backbone (+optional LoRA) -> attention f-pool -> pad ->
    x10 interpolation (+ optional CNN merge and sliding-window fusion),
    then ``norm_after_merge``;
  * query system: learnable per-class queries OR external query tensors
    through per-modality projectors (Linear+GELU); during training with
    multi-modal queries, one modality is drawn at random *per query*;
  * AT decoder: stack of cross-attention-FIRST transformer decoder
    layers (cross-attn -> self-attn -> FFN, post-norm) where queries
    attend the backbone frame tokens; ``tgt_mask`` lets novel queries
    attend only base queries (open-vocab eval);
  * SED output: ``einsum(mask_embedding(queries), sed_head(frames))``
    -> ``sigmoid(/temp_w) * at_probability`` (clip-level prior).

Deviation noted: with ``out_type='logit'`` the reference multiplies the
[B,T,Q] sigmoid map by raw [B,Q,C+1] logits, which cannot broadcast —
its shipped configs never exercise that path. Here the clip prior for
'logit' is the softmax diagonal (the same ``multi_class_to_multi_label``
transform the reference trainer applies at eval,
``recipes/audioset_strong/detect_any_sound/passt/train.py:159-162``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Literal, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.models.cnn import CNN
from transformer4sed_tpu.models.interpolate import interpolate_time, resize_time
from transformer4sed_tpu.models.mlm import MLMMasker
from transformer4sed_tpu.models.passt import PaSST
from transformer4sed_tpu.models.pooling import AttentionPooling
from transformer4sed_tpu.models.sed_model import SEDOutput
from transformer4sed_tpu.models.slide import slide_window_encode
from transformer4sed_tpu.models.vit import fast_gelu, trunc_normal_init
from transformer4sed_tpu.models.xl import (
    BiGRUDecoder,
    ConformerDecoder,
    TransformerDecoder,
    TransformerXLDecoder,
)


class MLP(nn.Module):
    """n-layer MLP with GELU between layers (reference DETR-style MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = fast_gelu(x)
        return x


class CrossAttentionFirstDecoderLayer(nn.Module):
    """Post-norm decoder layer with cross-attention BEFORE self-attention."""

    num_heads: int
    dim_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, deterministic: bool = True):
        d = tgt.shape[-1]
        mha = lambda name: nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, out_features=d, dtype=self.dtype, name=name
        )
        # inputs_v defaults to inputs_k (flax warns on square inputs_v arrays)
        h = mha("multihead_attn")(tgt, inputs_k=memory)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(tgt + h)

        attn_mask = None
        if tgt_mask is not None:
            # torch semantics: True = blocked; flax mask: True = attend
            m = ~tgt_mask
            while m.ndim < 4:
                m = m[None]
            attn_mask = m
        h = mha("self_attn")(x, inputs_k=x, mask=attn_mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(name="norm2")(x + h)

        h = nn.Dense(self.dim_ffn, name="linear1")(x)
        h = fast_gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(d, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(x + h)


class QueryBasedAudioTaggingDecoder(nn.Module):
    n_layers: int
    num_heads: int
    dim_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_encoder, queries, tgt_mask=None, deterministic: bool = True):
        x = queries
        for i in range(self.n_layers):
            x = CrossAttentionFirstDecoderLayer(
                num_heads=self.num_heads,
                dim_ffn=self.dim_ffn,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, feat_encoder, tgt_mask=tgt_mask, deterministic=deterministic)
        return x


def multi_label_to_multi_class(weak: jnp.ndarray) -> jnp.ndarray:
    """[B, C] multi-label -> [B, C, C+1] multi-class targets (per-query)."""
    b, c = weak.shape
    eye = jnp.eye(c)
    out = jnp.zeros((b, c, c + 1))
    out = out.at[:, :, :-1].set(eye[None] * weak[:, :, None])
    out = out.at[:, :, -1].set(1.0 - weak)
    return out


def multi_class_to_multi_label(mc: jnp.ndarray) -> jnp.ndarray:
    """[B, C, C+1] -> [B, C] via the class-diagonal."""
    return jnp.diagonal(mc[:, :, :-1], axis1=1, axis2=2)


class DASM(nn.Module):
    class_num: int = 10
    decoder_dim: int = 768
    num_heads: int = 12
    decoder: str = "gru"
    decoder_layer_num: int = 2
    decoder_pos_emd_len: int = 1000
    decoder_expand_rate: float = 1.0
    backbone_upsample_ratio: int = 10
    # backbone
    embed_dim: int = 768
    backbone_depth: int = 12
    backbone_num_heads: int = 12
    backbone_img_size: Tuple[int, int] = (128, 998)
    passt_feature_layer: int = 10
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = False
    # AT head
    at_decoder_layer: int = 2
    f_pool_heads: int = 6
    query_projector: bool = False
    query_dim: Union[int, Sequence[int], None] = None
    out_type: Optional[str] = "sigmoid"  # 'logit' | 'sigmoid' | None
    # branches
    cnn_param: Optional[Dict[str, Any]] = None
    mlm_dict: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = PaSST(
            embed_dim=self.embed_dim,
            depth=self.backbone_depth,
            num_heads=self.backbone_num_heads,
            img_size=tuple(self.backbone_img_size),
            tap_layers=(self.passt_feature_layer,),
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            dtype=self.dtype,
        )
        self.norm_before_pool = nn.LayerNorm(epsilon=1e-5)
        self.f_pool_module = AttentionPooling(num_heads=self.f_pool_heads, dtype=self.dtype)

        if self.cnn_param is not None:
            param = dict(self.cnn_param)
            self.cnn = CNN(dtype=self.dtype, **param)
            self.cnn_feat_dim = param.get("nb_filters", (64, 64, 64))[-1]
            self.cnn_projector = nn.Dense(self.decoder_dim)
            self.merge_weight = self.param("merge_weight", nn.initializers.constant(0.5), (1,))
        self.transformer_projector = nn.Dense(self.decoder_dim)
        self.at_projector = nn.Dense(self.decoder_dim)
        self.norm_after_merge = nn.LayerNorm(epsilon=1e-5)

        # SED decoder
        if self.decoder == "gru":
            self.sed_decoder = BiGRUDecoder(
                hidden_dim=self.decoder_dim, num_layers=self.decoder_layer_num, dtype=self.dtype
            )
            sed_in = 2 * self.decoder_dim
        elif self.decoder == "transformerXL":
            self.sed_decoder = TransformerXLDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                use_flash=self.use_flash,
                dtype=self.dtype,
            )
            sed_in = self.decoder_dim
        elif self.decoder == "conformer":
            self.sed_decoder = ConformerDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
            sed_in = self.decoder_dim
        elif self.decoder == "transformer":
            self.sed_decoder = TransformerDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
            sed_in = self.decoder_dim
        elif self.decoder == "no":
            self.sed_decoder = None
            sed_in = self.decoder_dim
        else:
            raise ValueError(f"invalid decoder {self.decoder!r}")
        del sed_in

        self.mask_embedding_layer = (
            MLP(self.decoder_dim, self.decoder_dim, 3) if self.out_type else None
        )
        self.sed_head = nn.Dense(self.decoder_dim)

        # queries
        if not self.query_projector:
            self.at_query = self.param(
                "at_query", trunc_normal_init(), (self.class_num, self.decoder_dim)
            )
        else:
            if isinstance(self.query_dim, int):
                self.query_projectors = (nn.Dense(self.decoder_dim, name="query_projector"),)
            else:
                self.query_projectors = tuple(
                    nn.Dense(self.decoder_dim, name=f"query_projector_{i}")
                    for i in range(len(self.query_dim))
                )

        self.at_decoder = QueryBasedAudioTaggingDecoder(
            n_layers=self.at_decoder_layer,
            num_heads=self.num_heads,
            dim_ffn=int(self.decoder_dim * self.decoder_expand_rate),
            dtype=self.dtype,
        )
        if self.out_type == "logit":
            self.at_head = MLP(self.decoder_dim, self.class_num + 1, 2)
        elif self.out_type == "sigmoid":
            self.at_head = MLP(self.decoder_dim, 1, 2)
        elif self.out_type is None:
            self.at_head = None
        else:
            raise RuntimeError(f"unknown out_type {self.out_type!r}")

        if self.mlm_dict is not None:
            d = dict(self.mlm_dict)
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

    # -- pieces -----------------------------------------------------------------

    def _f_pool(self, backbone_out, train: bool):
        feat = backbone_out[f"layer{self.passt_feature_layer}_out"][:, 2:, :]
        feat = self.norm_before_pool(feat)
        b, p, c = feat.shape
        f_dim, t_dim = backbone_out["f_dim"], backbone_out["t_dim"]
        grid = feat.reshape(b, f_dim, t_dim, c)
        cols = grid.transpose(0, 2, 1, 3).reshape(b * t_dim, f_dim, c)
        return self.f_pool_module(cols, deterministic=not train).reshape(b, t_dim, c)

    def _encode_window(self, mel_win, train: bool):
        out = self.backbone(mel_win[:, None], train=train)
        frames = self._f_pool(out, train)
        return interpolate_time(frames, self.backbone_upsample_ratio, "linear")

    def _project_queries(self, query, query_type, train: bool):
        if query is None:
            if self.query_projector:
                raise ValueError(
                    "query_projector=True DASM needs external query tensors "
                    "every call (dataset.text_query/audio_query banks); there "
                    "is no learnable at_query to fall back to"
                )
            return self.at_query  # learnable
        if not self.query_projector:
            # learnable-query model given an external tensor (e.g. a slice
            # of its own trained query bank for open-vocab train/eval):
            # use it directly (detect_any_sound.py:279 projects only when a
            # query_projector exists).
            return query
        # the reference projector is Sequential(Linear, GELU)
        # (detect_any_sound.py:137,144-148) — the GELU is part of it
        proj_act = lambda proj, q: fast_gelu(proj(q))  # noqa: E731
        if isinstance(query, (list, tuple)):
            projected = [proj_act(proj, q) for proj, q in zip(self.query_projectors, query)]
            stacked = jnp.stack(projected, axis=1)  # [Q, n_modal, D]
            n_q, n_modal, d = stacked.shape
            if train and n_modal > 1:
                pick = jax.random.randint(self.make_rng("query"), (n_q,), 0, n_modal)
            else:
                pick = jnp.zeros((n_q,), jnp.int32)
            return jnp.take_along_axis(stacked, pick[:, None, None], axis=1)[:, 0]
        # single tensor: choose projector by modality
        if len(self.query_projectors) > 1:
            idx = {"text": 0, "audio": 1}.get(query_type)
            if idx is None:
                raise RuntimeError("query_type must be 'text' or 'audio' with multi-modal projectors")
            return proj_act(self.query_projectors[idx], query)
        return proj_act(self.query_projectors[0], query)

    def at_branch(self, at_feat, query, query_type, tgt_mask, train: bool):
        q = self._project_queries(query, query_type, train)
        queries = jnp.tile(q[None], (at_feat.shape[0], 1, 1))
        mask_feat = self.at_decoder(
            at_feat, queries, tgt_mask=tgt_mask, deterministic=not train
        )
        at_out = None
        if self.at_head is not None:
            at_out = self.at_head(mask_feat)  # [B, Q, C+1] or [B, Q, 1]
            if at_out.shape[-1] == 1:
                at_out = jax.nn.sigmoid(at_out[..., 0])  # [B, Q]
        return at_out, mask_feat

    # -- forward ----------------------------------------------------------------

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        encoder_win: bool = False,
        mix_rate: float = 0.5,
        win_param: Tuple[int, int] = (512, 49),
        temp_w: float = 0.1,
        pad_mask: Optional[jnp.ndarray] = None,
        query=None,
        query_type: Optional[str] = None,
        tgt_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        backbone_out = self.backbone(mel[:, None], train=train)
        x = self._f_pool(backbone_out, train)
        x = jnp.concatenate([x, x[:, -1:, :]], axis=1)
        x = interpolate_time(x, self.backbone_upsample_ratio, "linear")

        if encoder_win:
            x_local = slide_window_encode(
                lambda w: self._encode_window(w, train),
                mel,
                emb_len=x.shape[1],
                win_width=win_param[0],
                step=win_param[1],
            )
            x = mix_rate * x_local + (1.0 - mix_rate) * x

        if self.cnn_param is not None:
            cnn_feat = self.cnn(jnp.transpose(mel, (0, 2, 1))[:, None], train=train)
            assert cnn_feat.shape[-1] == 1
            cnn_feat = cnn_feat[:, :, :, 0].transpose(0, 2, 1)  # [B, T', C]
            cnn_feat = resize_time(cnn_feat, x.shape[1], "linear")
            x = self.transformer_projector(x) + self.merge_weight * self.cnn_projector(cnn_feat)
        else:
            x = self.transformer_projector(x)
        x = self.norm_after_merge(x)

        # AT branch over backbone frame tokens
        at_feat = self.at_projector(backbone_out["frame"][:, 2:, :])
        at_out, mask_feat = self.at_branch(at_feat, query, query_type, tgt_mask, train)

        frame_before_mask = None
        mask_id_seq = None
        if self.mlm_dict is not None:
            frame_before_mask = x
            x, mask_id_seq = self.masker(self.make_rng("mlm"), x, self.mask_token)

        x = self.sed_decoder(x, deterministic=not train) if self.sed_decoder is not None else x

        if self.mlm_dict is not None:
            mlm_pred = self.mlm_fc2(fast_gelu(self.mlm_fc1(x)))
            return SEDOutput(
                mlm_pred=mlm_pred,
                frame_before_mask=frame_before_mask,
                mask_id_seq=mask_id_seq,
                at_out=at_out,
            )

        frames = self.sed_head(x)  # [B, T, D]
        mask_embedding = (
            self.mask_embedding_layer(mask_feat) if self.mask_embedding_layer is not None else mask_feat
        )
        logits = jnp.einsum(
            "bqc,btc->btq", mask_embedding, frames, preferred_element_type=jnp.float32
        )  # [B, T, Q]

        if at_out is None:
            prior = 1.0
        elif at_out.ndim == 3:  # 'logit': softmax diagonal as the clip prior
            prior = multi_class_to_multi_label(jax.nn.softmax(at_out, axis=-1))[:, None, :]
        else:
            prior = at_out[:, None, :]
        sed = jax.nn.sigmoid(logits / temp_w) * prior
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        sed = jnp.clip(sed, 1e-7, 1.0)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(
            strong=sed.transpose(0, 2, 1),  # [B, Q, T]
            weak=weak,
            at_out=at_out,
            frame_before_mask=frame_before_mask,
        )
