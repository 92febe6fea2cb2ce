"""DASM tests: query machinery, AT decoder, open-vocab masks, outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.models.dasm import (
    DASM,
    CrossAttentionFirstDecoderLayer,
    QueryBasedAudioTaggingDecoder,
    multi_class_to_multi_label,
    multi_label_to_multi_class,
)

KEY = jax.random.PRNGKey(0)


def tiny_dasm(**kw):
    cfg = dict(
        class_num=4,
        decoder_dim=32,
        num_heads=4,
        decoder="transformerXL",
        decoder_layer_num=1,
        decoder_pos_emd_len=200,
        embed_dim=32,
        backbone_depth=2,
        backbone_num_heads=4,
        passt_feature_layer=2,
        at_decoder_layer=1,
        f_pool_heads=4,
        out_type="sigmoid",
        cnn_param=None,
    )
    cfg.update(kw)
    return DASM(**cfg)


MEL = jnp.asarray(np.random.RandomState(0).randn(2, 128, 200).astype(np.float32))


class TestLabelTransforms:
    def test_roundtrip(self):
        weak = jnp.asarray([[1.0, 0.0, 1.0]])
        mc = multi_label_to_multi_class(weak)
        assert mc.shape == (1, 3, 4)
        np.testing.assert_array_equal(np.asarray(multi_class_to_multi_label(mc)), np.asarray(weak))
        # absent class puts mass on the void bucket
        assert mc[0, 1, -1] == 1.0


class TestATDecoder:
    def test_cross_attention_first_layer(self):
        layer = CrossAttentionFirstDecoderLayer(num_heads=4, dim_ffn=64)
        q = jnp.asarray(np.random.RandomState(1).randn(2, 5, 32).astype(np.float32))
        mem = jnp.asarray(np.random.RandomState(2).randn(2, 20, 32).astype(np.float32))
        params = layer.init(KEY, q, mem)
        out = layer.apply(params, q, mem)
        assert out.shape == q.shape

    def test_tgt_mask_blocks_queries(self):
        dec = QueryBasedAudioTaggingDecoder(n_layers=1, num_heads=4, dim_ffn=64)
        q = jnp.asarray(np.random.RandomState(3).randn(1, 4, 32).astype(np.float32))
        mem = jnp.asarray(np.random.RandomState(4).randn(1, 10, 32).astype(np.float32))
        params = dec.init(KEY, mem, q)
        free = dec.apply(params, mem, q)
        # block query 3 from seeing anything but itself
        mask = np.zeros((4, 4), dtype=bool)
        mask[3, :3] = True
        masked = dec.apply(params, mem, q, tgt_mask=jnp.asarray(mask))
        # queries 0-2 unchanged, query 3 differs
        np.testing.assert_allclose(np.asarray(free[:, :3]), np.asarray(masked[:, :3]), atol=1e-5)
        assert not np.allclose(np.asarray(free[:, 3]), np.asarray(masked[:, 3]))


class TestDASM:
    def test_learnable_queries_forward(self):
        model = tiny_dasm()
        params = model.init({"params": KEY}, MEL)
        out = model.apply(params, MEL)
        assert out.strong.shape == (2, 4, 200)
        assert out.weak.shape == (2, 4)
        assert out.at_out.shape == (2, 4)
        s = np.asarray(out.strong)
        assert (s >= 0).all() and (s <= 1).all()

    def test_external_query_projector(self):
        model = tiny_dasm(query_projector=True, query_dim=16)
        query = jnp.asarray(np.random.RandomState(5).randn(4, 16).astype(np.float32))
        params = model.init({"params": KEY}, MEL, query=query)
        out = model.apply(params, MEL, query=query)
        assert out.strong.shape == (2, 4, 200)
        # different queries -> different predictions
        out2 = model.apply(params, MEL, query=query * 2.0)
        assert not np.allclose(np.asarray(out.strong), np.asarray(out2.strong))

    def test_multimodal_queries_random_selection(self):
        model = tiny_dasm(query_projector=True, query_dim=(16, 8))
        q_text = jnp.asarray(np.random.RandomState(6).randn(4, 16).astype(np.float32))
        q_audio = jnp.asarray(np.random.RandomState(7).randn(4, 8).astype(np.float32))
        params = model.init(
            {"params": KEY, "query": KEY}, MEL, query=[q_text, q_audio], train=True
        )
        rngs = lambda s: {"query": jax.random.PRNGKey(s), "patchout": jax.random.PRNGKey(s + 1),
                          "dropout": jax.random.PRNGKey(s + 2)}
        out1 = model.apply(params, MEL, query=[q_text, q_audio], train=True, rngs=rngs(0))
        out2 = model.apply(params, MEL, query=[q_text, q_audio], train=True, rngs=rngs(1))
        # different modality draws -> different outputs (with high prob)
        assert not np.allclose(np.asarray(out1.strong), np.asarray(out2.strong))
        # eval: deterministic (modality 0)
        e1 = model.apply(params, MEL, query=[q_text, q_audio], query_type="text")
        e2 = model.apply(params, MEL, query=[q_text, q_audio], query_type="text")
        np.testing.assert_array_equal(np.asarray(e1.strong), np.asarray(e2.strong))

    def test_logit_out_type(self):
        model = tiny_dasm(out_type="logit")
        params = model.init({"params": KEY}, MEL)
        out = model.apply(params, MEL)
        assert out.at_out.shape == (2, 4, 5)  # [B, Q, C+1]
        assert out.strong.shape == (2, 4, 200)

    def test_mlm_mode(self):
        model = tiny_dasm(mlm_dict={"mask_rate": 0.5, "block_width": 10, "out_dim": 32})
        params = model.init({"params": KEY, "mlm": KEY}, MEL)
        out = model.apply(params, MEL, rngs={"mlm": jax.random.PRNGKey(3)})
        assert out.mlm_pred.shape == (2, 200, 32)
        assert out.mask_id_seq.shape == (2, 200)

    def test_cnn_merge(self):
        model = tiny_dasm(
            cnn_param={
                "nb_filters": (8, 8, 16),
                "pooling": ((1, 4), (1, 4), (1, 8)),
                "normalization": "layer",
                "activation": "glu",
            }
        )
        params = model.init({"params": KEY}, MEL)
        out = model.apply(params, MEL)
        assert out.strong.shape == (2, 4, 200)
