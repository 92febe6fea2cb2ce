"""HTSAT-based SED heads: HTSAT_CNN (closed-set), CLAP_SED (text-query
zero-shot style) and DASM_HTSAT (open-vocabulary queries).

Parity targets: ``src/models/htsat/htsat_cnn.py:13-209``,
``src/models/htsat/clap_sed.py:9-49``,
``src/models/detect_any_sound/detect_any_sound_htast.py:12-119``.
All consume the backbone's ``fine_grained_embedding`` ([B, 32, 768]
for the CLAP-tiny config) instead of a PaSST layer tap + f-pool.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.models.cnn import CNN
from transformer4sed_tpu.models.dasm import (
    MLP,
    QueryBasedAudioTaggingDecoder,
    multi_class_to_multi_label,
)
from transformer4sed_tpu.models.htsat import HTSAT, create_htsat_model
from transformer4sed_tpu.models.interpolate import interpolate_time, resize_time
from transformer4sed_tpu.models.mlm import MLMMasker
from transformer4sed_tpu.models.sed_model import SEDOutput
from transformer4sed_tpu.models.vit import fast_gelu, trunc_normal_init
from transformer4sed_tpu.models.xl import BiGRUDecoder, ConformerDecoder, TransformerXLDecoder


class HTSAT_CNN(nn.Module):
    """HTSAT fine-grained embedding + CNN merge + SED decoder head."""

    class_num: int = 10
    decoder_dim: int = 768
    num_heads: int = 12
    decoder: str = "transformerXL"
    decoder_layer_num: int = 2
    decoder_pos_emd_len: int = 1000
    decoder_expand_rate: float = 1.0
    backbone_upsample_ratio: int = 10
    htsat_config: str = "tiny"
    htsat_kwargs: Optional[Dict[str, Any]] = None  # create_htsat_model overrides
    cnn_param: Optional[Dict[str, Any]] = None
    mlm_dict: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = create_htsat_model(self.htsat_config, dtype=self.dtype, **(self.htsat_kwargs or {}))
        if self.cnn_param is not None:
            param = dict(self.cnn_param)
            self.cnn = CNN(dtype=self.dtype, **param)
            self.cnn_projector = nn.Dense(self.decoder_dim)
            self.merge_weight = self.param("merge_weight", nn.initializers.constant(0.5), (1,))
        self.transformer_projector = nn.Dense(self.decoder_dim)
        self.norm_after_merge = nn.LayerNorm(epsilon=1e-5)

        if self.decoder == "gru":
            self.sed_decoder = BiGRUDecoder(
                hidden_dim=self.decoder_dim, num_layers=self.decoder_layer_num, dtype=self.dtype
            )
        elif self.decoder == "transformerXL":
            self.sed_decoder = TransformerXLDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
        elif self.decoder == "conformer":
            self.sed_decoder = ConformerDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
        elif self.decoder == "no":
            self.sed_decoder = None
        else:
            raise ValueError(f"invalid decoder {self.decoder!r}")
        self.sed_head = nn.Dense(self.class_num)

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

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, 1, T, F] log-mel (HTSATFrontend output)
        train: bool = False,
        temp_w: float = 0.1,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        feat = self.backbone(mel, train=train)["fine_grained_embedding"]  # [B, T', C]
        x = interpolate_time(feat, self.backbone_upsample_ratio, "linear")

        if self.cnn_param is not None:
            cnn_feat = self.cnn(mel, train=train)  # [B, C, T'', 1]
            assert cnn_feat.shape[-1] == 1
            cnn_feat = cnn_feat[:, :, :, 0].transpose(0, 2, 1)
            # resize onto the transformer grid (the reference only sees
            # 10-s clips where the grids divide; resize_time also covers
            # non-dividing clip lengths)
            cnn_feat = resize_time(cnn_feat, x.shape[1], "linear")
            x = self.transformer_projector(x) + self.merge_weight * self.cnn_projector(cnn_feat)
        else:
            x = self.transformer_projector(x)
        x = self.norm_after_merge(x)

        frame_before_mask = None
        mask_id_seq = None
        if self.mlm_dict is not None:
            frame_before_mask = x
            x, mask_id_seq = self.masker(self.make_rng("mlm"), x, self.mask_token)

        x = self.sed_decoder(x, deterministic=not train) if self.sed_decoder is not None else x

        if self.mlm_dict is not None:
            mlm_pred = self.mlm_fc2(fast_gelu(self.mlm_fc1(x)))
            return SEDOutput(
                mlm_pred=mlm_pred, frame_before_mask=frame_before_mask, mask_id_seq=mask_id_seq
            )

        logits = self.sed_head(x)
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        sed = jnp.clip(sed, 1e-7, 1.0)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(
            strong=sed.transpose(0, 2, 1),
            weak=weak,
            extras={"logit": logits.transpose(0, 2, 1)},
        )


class CLAP_SED(nn.Module):
    """Zero-shot-style SED: CLAP audio embedding x projected text queries."""

    embed_dim: int = 768
    class_num: int = 10
    query_dim: int = 512
    htsat_config: str = "tiny"
    htsat_kwargs: Optional[Dict[str, Any]] = None  # create_htsat_model overrides
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = create_htsat_model(self.htsat_config, dtype=self.dtype, **(self.htsat_kwargs or {}))
        self.audio_projector = MLP(self.embed_dim, self.embed_dim, 2)
        self.text_projector = MLP(self.embed_dim, self.embed_dim, 2)
        # stored text-query buffer (reference registers it from a .pt file);
        # override per call with `query` for open-set eval
        self.text_query = self.param(
            "text_query", nn.initializers.normal(0.02), (self.class_num, self.query_dim)
        )

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, 1, T, F]
        query: Optional[jnp.ndarray] = None,
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> SEDOutput:
        feat = self.backbone(mel, train=train)["fine_grained_embedding"]  # [B, T, C]
        audio = self.audio_projector(feat)
        q = query if query is not None else self.text_query
        text = self.text_projector(q)
        logits = jnp.einsum("qc,btc->btq", text, audio, preferred_element_type=jnp.float32)
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(strong=sed.transpose(0, 2, 1), weak=weak, extras={"logit": logits})


class DASM_HTSAT(nn.Module):
    """DASM query machinery on the HTSAT fine-grained embedding."""

    class_num: int = 10
    decoder_dim: int = 768
    num_heads: int = 12
    decoder: str = "gru"
    decoder_layer_num: int = 2
    decoder_pos_emd_len: int = 1000
    decoder_expand_rate: float = 1.0
    backbone_upsample_ratio: int = 10
    htsat_config: str = "tiny"
    htsat_kwargs: Optional[Dict[str, Any]] = None  # create_htsat_model overrides
    htsat_embed_dim: int = 768
    at_decoder_layer: int = 2
    query_projector: bool = False
    query_dim: Union[int, Sequence[int], None] = None
    out_type: Optional[str] = "sigmoid"
    cnn_param: Optional[Dict[str, Any]] = None
    mlm_dict: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = create_htsat_model(self.htsat_config, dtype=self.dtype, **(self.htsat_kwargs or {}))
        if self.cnn_param is not None:
            param = dict(self.cnn_param)
            self.cnn = CNN(dtype=self.dtype, **param)
            self.cnn_projector = nn.Dense(self.decoder_dim)
            self.merge_weight = self.param("merge_weight", nn.initializers.constant(0.5), (1,))
        self.transformer_projector = nn.Dense(self.decoder_dim)
        self.at_projector = nn.Dense(self.decoder_dim)
        self.norm_after_merge = nn.LayerNorm(epsilon=1e-5)

        if self.decoder == "gru":
            self.sed_decoder = BiGRUDecoder(
                hidden_dim=self.decoder_dim, num_layers=self.decoder_layer_num, dtype=self.dtype
            )
        elif self.decoder == "transformerXL":
            self.sed_decoder = TransformerXLDecoder(
                decoder_layer_num=self.decoder_layer_num,
                num_heads=self.num_heads,
                mlp_ratio=self.decoder_expand_rate,
                seq_len=self.decoder_pos_emd_len,
                dtype=self.dtype,
            )
        elif self.decoder == "no":
            self.sed_decoder = None
        else:
            raise ValueError(f"invalid decoder {self.decoder!r}")

        self.mask_embedding_layer = (
            MLP(self.decoder_dim, self.decoder_dim, 3) if self.out_type else None
        )
        self.sed_head = nn.Dense(self.decoder_dim)

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
        else:
            self.at_head = None

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

    def _project_queries(self, query, query_type, train: bool):
        # the reference projector is Sequential(Linear, GELU)
        # (detect_any_sound.py:137,144-148) — this variant's first cut
        # dropped the GELU, caught by the live-oracle DASM_HTSAT forward
        # (tests/test_reference_live_models.py)
        proj_act = lambda proj, q: fast_gelu(proj(q))  # noqa: E731
        if query is None:
            if self.query_projector:
                raise ValueError(
                    "query_projector=True DASM_HTSAT needs external query "
                    "tensors every call; there is no learnable at_query"
                )
            return self.at_query
        if isinstance(query, (list, tuple)):
            projected = [proj_act(proj, q) for proj, q in zip(self.query_projectors, query)]
            stacked = jnp.stack(projected, axis=1)
            n_q, n_modal, _ = stacked.shape
            if train and n_modal > 1:
                pick = jax.random.randint(self.make_rng("query"), (n_q,), 0, n_modal)
            else:
                pick = jnp.zeros((n_q,), jnp.int32)
            return jnp.take_along_axis(stacked, pick[:, None, None], axis=1)[:, 0]
        if len(self.query_projectors) > 1:
            idx = {"text": 0, "audio": 1}.get(query_type)
            if idx is None:
                raise RuntimeError("query_type required with multi-modal projectors")
            return proj_act(self.query_projectors[idx], query)
        return proj_act(self.query_projectors[0], query)

    def _encode_window(self, mel_tf: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[N, F, W] mel window -> [N, t*ratio, C] (HtsatSlideWindow parity)."""
        mel_win = jnp.transpose(mel_tf, (0, 2, 1))[:, None]  # -> [N, 1, W, F]
        feat = self.backbone(mel_win, train=train)["fine_grained_embedding"]
        return interpolate_time(feat, self.backbone_upsample_ratio, "linear")

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, 1, T, F]
        train: bool = False,
        encoder_win: bool = False,
        mix_rate: float = 0.5,
        win_param: Tuple[int, int] = (256, 64),
        temp_w: float = 0.1,
        pad_mask: Optional[jnp.ndarray] = None,
        query=None,
        query_type: Optional[str] = None,
        tgt_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        feat = self.backbone(mel, train=train)["fine_grained_embedding"]  # [B, T', C]
        x = interpolate_time(feat, self.backbone_upsample_ratio, "linear")

        if encoder_win:
            from transformer4sed_tpu.models.slide import slide_window_encode

            mel_tf = jnp.transpose(mel[:, 0], (0, 2, 1))  # [B, F, T]
            x_local = slide_window_encode(
                lambda w: self._encode_window(w, train),
                mel_tf,
                emb_len=x.shape[1],
                win_width=win_param[0],
                step=win_param[1],
            )
            x = mix_rate * x_local + (1.0 - mix_rate) * x

        if self.cnn_param is not None:
            cnn_feat = self.cnn(mel, train=train)
            assert cnn_feat.shape[-1] == 1
            cnn_feat = cnn_feat[:, :, :, 0].transpose(0, 2, 1)
            cnn_feat = resize_time(cnn_feat, x.shape[1], "linear")
            x = self.transformer_projector(x) + self.merge_weight * self.cnn_projector(cnn_feat)
        else:
            x = self.transformer_projector(x)
        x = self.norm_after_merge(x)

        at_feat = self.at_projector(feat)
        q = self._project_queries(query, query_type, train)
        queries = jnp.tile(q[None], (at_feat.shape[0], 1, 1))
        mask_feat = self.at_decoder(at_feat, queries, tgt_mask=tgt_mask, deterministic=not train)
        at_out = None
        if self.at_head is not None:
            at_out = self.at_head(mask_feat)
            if at_out.shape[-1] == 1:
                at_out = jax.nn.sigmoid(at_out[..., 0])

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

        frames = self.sed_head(x)
        mask_embedding = (
            self.mask_embedding_layer(mask_feat) if self.mask_embedding_layer is not None else mask_feat
        )
        logits = jnp.einsum("bqc,btc->btq", mask_embedding, frames, preferred_element_type=jnp.float32)
        if at_out is None:
            prior = 1.0
        elif at_out.ndim == 3:
            prior = multi_class_to_multi_label(jax.nn.softmax(at_out, axis=-1))[:, None, :]
        else:
            prior = at_out[:, None, :]
        sed = jnp.clip(jax.nn.sigmoid(logits / temp_w) * prior, 1e-7, 1.0)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(strong=sed.transpose(0, 2, 1), weak=weak, at_out=at_out)
