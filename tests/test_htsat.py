"""HTSAT backbone + heads tests (small Swin configs for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.models.htsat import (
    HTSAT,
    HTSATFrontend,
    _relative_position_index,
    slaney_mel_banks,
    window_partition,
    window_reverse,
)
from transformer4sed_tpu.models.htsat_heads import CLAP_SED, DASM_HTSAT, HTSAT_CNN

KEY = jax.random.PRNGKey(0)


def tiny_htsat(**kw):
    cfg = dict(
        spec_size=64,
        patch_size=4,
        patch_stride=(4, 4),
        num_classes=7,
        embed_dim=16,
        depths=(1, 1),
        num_heads=(2, 4),
        window_size=4,
        mel_bins=16,
    )
    cfg.update(kw)
    return HTSAT(**cfg)


class TestSlaneyMel:
    def test_banks_shape_and_norm(self):
        banks = slaney_mel_banks(64, 1024, 32000, 50.0, 14000.0)
        assert banks.shape == (64, 513)
        assert (banks >= 0).all()
        # slaney norm: filters are area-normalised, peak < 1
        assert banks.max() < 0.1


class TestWindowOps:
    def test_partition_reverse_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))
        win = window_partition(x, 4)
        assert win.shape == (2 * 4, 16, 3)
        back = window_reverse(win, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = _relative_position_index(2)
        assert idx.shape == (4, 4)
        assert idx.max() < 9  # (2*2-1)^2


class TestHTSATFrontend:
    def test_shapes(self):
        fe = HTSATFrontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 32000).astype(np.float32))
        mel = fe(wav)
        assert mel.shape == (2, 1, 101, 64)
        assert bool(jnp.isfinite(mel).all())


class TestHTSATBackbone:
    def test_forward_shapes(self):
        model = tiny_htsat()
        # freq_ratio = 64/16 = 4; input mel [B, 1, T<=256, F<=16]
        mel = jnp.asarray(np.random.RandomState(1).randn(2, 1, 200, 16).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out, _ = model.apply(variables, mel, train=True, mutable=["batch_stats"])
        # grid 16x16 -> after 1 merge 8x8; sf = 64/2/4 = 8, st = 8
        # c_freq_bin = 8/4 = 2 -> fine grained T = 4*8/... : [B, C, 2, 32/...]
        fg = out["fine_grained_embedding"]
        assert fg.shape[0] == 2 and fg.shape[2] == model.num_features
        assert out["clipwise_output"].shape == (2, 7)
        assert out["framewise_output"].shape[2] == 7
        c = np.asarray(out["clipwise_output"])
        assert (c >= 0).all() and (c <= 1).all()

    def test_eval_deterministic(self):
        model = tiny_htsat()
        mel = jnp.asarray(np.random.RandomState(2).randn(1, 1, 100, 16).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        a = model.apply(variables, mel)["clipwise_output"]
        b = model.apply(variables, mel)["clipwise_output"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHTSATHeads:
    def head_cfg(self):
        return dict(
            class_num=5,
            decoder_dim=32,
            num_heads=4,
            decoder="transformerXL",
            decoder_layer_num=1,
            decoder_pos_emd_len=400,
            backbone_upsample_ratio=4,
        )

    def htsat_kwargs(self):
        return dict(
            htsat_config="tiny",
        )

    def test_htsat_cnn(self):
        model = HTSAT_CNN(
            **self.head_cfg(),
            cnn_param={
                "nb_filters": (8, 8),
                "pooling": ((1, 8), (1, 8)),
                "normalization": "layer",
                "activation": "glu",
            },
        )
        # override the backbone to the tiny config via monkey config:
        object.__setattr__(model, "__dict__", model.__dict__)
        mel = jnp.asarray(np.random.RandomState(3).randn(1, 1, 128, 16).astype(np.float32))
        # use a tiny backbone by constructing HTSAT_CNN with custom create:
        # simpler: skip full-size; small mel with default config would fail
        # (mel_bins=64), so build with the real 64-bin mel but short T.
        mel = jnp.asarray(np.random.RandomState(3).randn(1, 1, 64, 64).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out, _ = model.apply(variables, mel, train=True, mutable=["batch_stats"])
        t_frames = 32 * 4  # latent 32 x upsample 4
        assert out.strong.shape == (1, 5, t_frames)
        assert out.weak.shape == (1, 5)

    def test_clap_sed(self):
        model = CLAP_SED(embed_dim=768, class_num=5, query_dim=768)
        mel = jnp.asarray(np.random.RandomState(4).randn(1, 1, 64, 64).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out = model.apply(variables, mel)
        assert out.strong.shape[1] == 5
        # external queries override the stored buffer
        q = jnp.asarray(np.random.RandomState(5).randn(8, 768).astype(np.float32))
        out2 = model.apply(variables, mel, query=q)
        assert out2.strong.shape[1] == 8

    def test_dasm_htsat(self):
        model = DASM_HTSAT(
            **self.head_cfg(),
            at_decoder_layer=1,
            out_type="sigmoid",
        )
        mel = jnp.asarray(np.random.RandomState(6).randn(1, 1, 64, 64).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out = model.apply(variables, mel)
        assert out.strong.shape == (1, 5, 128)
        assert out.at_out.shape == (1, 5)


class TestHTSATSlideWindow:
    def test_dasm_htsat_encoder_win(self):
        model = DASM_HTSAT(
            class_num=5,
            decoder_dim=32,
            num_heads=4,
            decoder="transformerXL",
            decoder_layer_num=1,
            decoder_pos_emd_len=400,
            backbone_upsample_ratio=4,
            at_decoder_layer=1,
            out_type="sigmoid",
        )
        mel = jnp.asarray(np.random.RandomState(7).randn(1, 1, 64, 64).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out_global = model.apply(variables, mel, temp_w=1.0)
        out_fused = model.apply(variables, mel, encoder_win=True, win_param=(48, 16), temp_w=1.0)
        assert out_fused.strong.shape == out_global.strong.shape
        assert not np.allclose(np.asarray(out_fused.strong), np.asarray(out_global.strong))
