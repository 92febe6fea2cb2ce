"""PaSST_CNN: PaSST_SED with a parallel CNN branch merged before the
decoder — the PMAM network.

Parity target (``src/models/cnn_transformer/passt_cnn.py:9-92``): the
transformer frame embedding and the CNN feature (interpolated to the
same length) are merged as ``transformer_projector(x) + merge_weight *
cnn_projector(cnn_feat)``, with the scalar ``merge_weight`` trainable
only in MLM mode. The CNN sees the raw mel as [B, 1, T, F].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.models.vit import fast_gelu

from transformer4sed_tpu.core.pooling_math import linear_softmax_pool
from transformer4sed_tpu.models.cnn import CNN, FDY_CNN, ResNet
from transformer4sed_tpu.models.interpolate import interpolate_time, resize_time
from transformer4sed_tpu.models.passt_sed import PaSST_SED
from transformer4sed_tpu.models.sed_model import SEDOutput
from transformer4sed_tpu.models.slide import slide_window_encode


class PaSST_CNN(PaSST_SED):
    cnn_name: str = "base"
    cnn_param: Optional[Dict[str, Any]] = None

    def setup(self):
        super().setup()
        if self.cnn_param is not None:
            param = dict(self.cnn_param)
            if self.cnn_name == "base":
                self.cnn = CNN(dtype=self.dtype, **param)
                self.cnn_feat_dim = param.get("nb_filters", (64, 64, 64))[-1]
            elif self.cnn_name == "FDY-CNN":
                self.cnn = FDY_CNN(dtype=self.dtype, **param)
                self.cnn_feat_dim = param.get("nb_filters", (64, 64, 64))[-1]
            elif self.cnn_name == "resnet":
                self.cnn = ResNet(dtype=self.dtype, **param)
                self.cnn_feat_dim = (
                    param["cnn_1d_dict"]["filters"][-1]
                    if param.get("cnn_1d_dict")
                    else param.get("nb_filters", (64, 64, 64, 64))[-1]
                )
            else:
                raise NotImplementedError(f"unknown cnn encoder {self.cnn_name!r}")
            self.cnn_projector = nn.Dense(self.decoder_dim)
            # trainable only in MLM mode (reference passt_cnn.py:18); in
            # fine-tune stages route it to the 'frozen' optimizer group.
            self.merge_weight = self.param("merge_weight", nn.initializers.constant(0.5), (1,))
        self.transformer_projector = nn.Dense(self.decoder_dim)

    # -- shared pieces (used by PaSST_CNN and PasstComplexCNN) ------------

    def _encode_frames(self, mel, train, encoder_win, mix_rate, win_param):
        """Backbone -> f_pool -> pad+interp (-> window fusion): [B, T, D]."""
        backbone_out = self.backbone(mel[:, None], train=train)
        x = self._f_pool(backbone_out, train)
        x = jnp.concatenate([x, x[:, -1:, :]], axis=1)
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
        return x, backbone_out

    def _cnn_features(self, mel_cnn, train):
        """CNN branch on [B, F, T] mel -> [B, T', C] frame features."""
        cnn_in = jnp.transpose(mel_cnn, (0, 2, 1))[:, None]  # [B, 1, T, F]
        cnn_feat = self.cnn(cnn_in, train=train)  # [B, C, T', F']
        assert cnn_feat.shape[1] == self.cnn_feat_dim
        assert cnn_feat.shape[3] == 1, "CNN branch must pool frequency to 1"
        return cnn_feat[:, :, :, 0].transpose(0, 2, 1)  # [B, T', C]

    def _finish(self, x, backbone_out, train, temp_w, pad_mask) -> SEDOutput:
        """MLM mask -> decoder -> AT branch -> classifier/pools."""
        frame_before_mask = x
        mask_id_seq = None
        if self.mlm:
            x, mask_id_seq = self.masker(self.make_rng("mlm"), x, self.mask_token)

        x = self._run_decoder(x, train)

        at_out = None
        if self.at_adapter:
            at_tokens = backbone_out["frame"][:, 2:, :]
            at_out = jax.nn.sigmoid(self.at_head(self.at_pool(at_tokens, deterministic=not train)))

        if self.mlm:
            mlm_pred = self.mlm_fc2(fast_gelu(self.mlm_fc1(x)))
            return SEDOutput(
                mlm_pred=mlm_pred,
                frame_before_mask=frame_before_mask,
                mask_id_seq=mask_id_seq,
                at_out=at_out,
            )

        logits = self.classifier(x)
        sed = jax.nn.sigmoid(logits / temp_w)
        if pad_mask is not None:
            sed = jnp.where(pad_mask[:, :, None], 0.0, sed)
        weak = linear_softmax_pool(sed, axis=1)
        return SEDOutput(
            strong=sed.transpose(0, 2, 1),
            weak=weak,
            at_out=at_out,
            frame_before_mask=frame_before_mask,
        )

    def __call__(
        self,
        mel: jnp.ndarray,  # [B, F, T]
        train: bool = False,
        encoder_win: bool = False,
        mix_rate: float = 0.5,
        win_param: Tuple[int, int] = (512, 49),
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        x, backbone_out = self._encode_frames(mel, train, encoder_win, mix_rate, win_param)

        if self.cnn_param is not None:
            cnn_feat = self._cnn_features(mel, train)
            # resize the CNN grid onto the decoder grid (handles the
            # reference's integer x-N upsample and non-dividing lengths)
            cnn_feat = resize_time(cnn_feat, x.shape[1], self.interpolate_mode)
            x = self.transformer_projector(x) + self.merge_weight * self.cnn_projector(cnn_feat)
        else:
            x = self.transformer_projector(x)

        return self._finish(x, backbone_out, train, temp_w, pad_mask)


class PasstComplexCNN(PaSST_CNN):
    """Dual-spectrogram PaSST+CNN (``src/models/cnn_transformer/
    passt_complex_spec_cnn.py:9-107``): the transformer branch and the
    CNN branch consume *separate* spectrograms (``input['trans']`` /
    ``input['cnn']``), and the CNN feature is upsampled by a fixed x4
    before the merge (vs. the computed ratio in ``PaSST_CNN``).

    The reference class is dead code — it imports a
    ``PasstCNNFeatureExtractor`` that does not exist (SURVEY.md §7.4) —
    so this is the repaired behavior: callers pass the two mel tensors
    directly (any two frontends from ``transformer4sed_tpu.frontend``).
    Config plumbing treats it as "PaSST_CNN", like the reference's
    ``get_model_name`` does (``passt_complex_spec_cnn.py:106-107``).
    """

    def __call__(  # type: ignore[override]
        self,
        mel: jnp.ndarray,  # transformer-branch mel [B, F, T]
        mel_cnn: Optional[jnp.ndarray] = None,  # CNN-branch mel [B, F', T']
        train: bool = False,
        encoder_win: bool = False,
        mix_rate: float = 0.5,
        win_param: Tuple[int, int] = (512, 49),
        temp_w: float = 1.0,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> SEDOutput:
        if mel_cnn is None:
            mel_cnn = mel
        assert self.cnn_param is not None, "PasstComplexCNN requires cnn_param"

        x, backbone_out = self._encode_frames(mel, train, encoder_win, mix_rate, win_param)

        cnn_feat = self._cnn_features(mel_cnn, train)
        # fixed x4 upsample (reference passt_complex_spec_cnn.py:62-63)
        cnn_feat = interpolate_time(cnn_feat, 4, self.interpolate_mode)
        assert cnn_feat.shape[1] == x.shape[1], (
            f"CNN branch length {cnn_feat.shape[1]} != decoder length {x.shape[1]}"
        )
        x = self.transformer_projector(x) + self.merge_weight * self.cnn_projector(cnn_feat)

        return self._finish(x, backbone_out, train, temp_w, pad_mask)
