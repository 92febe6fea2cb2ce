"""Tests for the CNN branch library, PaSST_CNN merge, and LoRA."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer4sed_tpu.models.cnn import CNN, FDY_CNN, ResNet
from transformer4sed_tpu.models.lora import (
    LoRADense,
    lora_label_fn,
    lora_params,
    merge_lora,
)
from transformer4sed_tpu.models.passt import PaSST
from transformer4sed_tpu.models.passt_cnn import PaSST_CNN

KEY = jax.random.PRNGKey(0)


class TestCNN:
    def test_base_cnn_shapes(self):
        cnn = CNN(
            nb_filters=(16, 16, 16),
            pooling=((1, 4), (1, 4), (1, 4)),
            activation="glu",
            normalization="layer",
        )
        x = jnp.zeros((2, 1, 100, 64))  # [B, 1, T, F]
        params = cnn.init(KEY, x)
        out = cnn.apply(params, x)
        assert out.shape == (2, 16, 100, 1)

    def test_base_cnn_batchnorm_mutable(self):
        cnn = CNN(nb_filters=(8,), pooling=((1, 2),), normalization="batch")
        x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 10, 8).astype(np.float32))
        variables = cnn.init(KEY, x)
        out, updated = cnn.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 8, 10, 4)
        assert "batch_stats" in updated

    def test_fdy_cnn(self):
        cnn = FDY_CNN(
            nb_filters=(8, 8),
            kernel=(3, 3),
            pad=(1, 1),
            stride=(1, 1),
            pooling=((1, 2), (1, 2)),
            DY_layers=(0, 1),
            normalization="layer",
        )
        x = jnp.asarray(np.random.RandomState(1).randn(2, 1, 20, 16).astype(np.float32))
        variables = cnn.init(KEY, x)
        out, _ = cnn.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 8, 20, 4)

    def test_dynamic_conv_attention_sums_to_one(self):
        from transformer4sed_tpu.models.cnn import DynamicConv2d

        m = DynamicConv2d(out_planes=4, n_basis_kernels=3)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 10, 8, 4).astype(np.float32))
        variables = m.init(KEY, x)
        out = m.apply(variables, x)
        assert out.shape == (1, 10, 8, 4)

    def test_resnet(self):
        # pair-wise filters (mid, out) x2, v2 pre-conv eats 2 from T and F
        net = ResNet(nb_filters=(8, 8, 8, 8), pooling=((1, 1), (1, 4), (1, 1), (1, 4)),
                     res_block_type="resnetv2")
        x = jnp.zeros((1, 1, 34, 18))
        variables = net.init(KEY, x)
        out, _ = net.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (1, 8, 32, 1)

    def test_resnet_strided_blocks(self):
        """stride != 1 must run: the residual is avg-pooled by the
        block's total reduction (the reference's unstrided downsample
        crashes here — documented deviation)."""
        net = ResNet(nb_filters=(8, 16, 16, 16), stride=(2, 1, 2, 1, 1),
                     pooling=((1, 1),) * 4)
        x = jnp.ones((2, 1, 64, 32))
        variables = net.init(KEY, x)
        out = net.apply(variables, x, train=False)
        # two stride-2 blocks, each striding both convs: 64/16, 32/16
        assert out.shape == (2, 16, 4, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_resnet_deep_drop_block_widths(self):
        """A 5-pair stack with the default 4-entry drop_block_width must
        not IndexError (reference resnet.py:205 would)."""
        net = ResNet(nb_filters=(8,) * 10, stride=(1,) * 11,
                     pooling=((1, 1),) * 10, drop_block=0.1)
        x = jnp.ones((2, 1, 16, 8))
        variables = net.init(KEY, x)
        out, _ = net.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.key(2)},
                           mutable=["batch_stats"])
        assert out.shape == (2, 8, 16, 8)

    def test_resnet_cnn1d_head(self):
        net = ResNet(
            nb_filters=(8, 8),
            pooling=((1, 1), (1, 64)),
            cnn_1d_dict={"filters": (12,), "kernel_size": (3,)},
        )
        x = jnp.zeros((1, 1, 16, 64))
        variables = net.init(KEY, x)
        out, _ = net.apply(variables, x, train=True, mutable=["batch_stats"])
        # unpadded conv1d (reference CNN1d) shrinks T by k-1
        assert out.shape == (1, 12, 14, 1)


class TestPaSSTCNN:
    def test_merge_forward(self):
        model = PaSST_CNN(
            class_num=4,
            embed_dim=32,
            decoder_dim=32,
            backbone_depth=2,
            backbone_num_heads=4,
            decoder_num_heads=4,
            at_adapter_heads=4,
            passt_feature_layer=2,
            decoder="transformerXL",
            decoder_layer_num=1,
            decoder_pos_emd_len=200,
            at_adapter=True,
            cnn_name="base",
            cnn_param={
                "nb_filters": (8, 8, 16),
                "pooling": ((1, 4), (1, 4), (1, 8)),
                "normalization": "layer",
                "activation": "glu",
            },
        )
        mel = jnp.asarray(np.random.RandomState(0).randn(2, 128, 200).astype(np.float32))
        variables = model.init({"params": KEY}, mel)
        out = model.apply(variables, mel)
        assert out.strong.shape == (2, 4, 200)
        assert out.weak.shape == (2, 4)
        # merge_weight exists and CNN branch contributes
        assert "merge_weight" in variables["params"]

    def test_without_cnn_param(self):
        model = PaSST_CNN(
            class_num=3,
            embed_dim=32,
            decoder_dim=32,
            backbone_depth=2,
            backbone_num_heads=4,
            decoder_num_heads=4,
            passt_feature_layer=2,
            decoder="no",
            decoder_pos_emd_len=200,
            cnn_param=None,
        )
        mel = jnp.zeros((1, 128, 200))
        variables = model.init({"params": KEY}, mel)
        out = model.apply(variables, mel)
        assert out.strong.shape == (1, 3, 200)


class TestLoRA:
    def test_identity_at_init(self):
        dense = LoRADense(features=8, rank=4, alpha=8.0)
        x = jnp.asarray(np.random.RandomState(0).randn(3, 6).astype(np.float32))
        params = dense.init(KEY, x)
        # B initialised to zero -> output equals base dense
        base = x @ params["params"]["kernel"] + params["params"]["bias"]
        np.testing.assert_allclose(np.asarray(dense.apply(params, x)), np.asarray(base), atol=1e-6)

    def test_merge_lora_equivalence(self):
        dense = LoRADense(features=8, rank=2, alpha=4.0)
        x = jnp.asarray(np.random.RandomState(1).randn(3, 6).astype(np.float32))
        params = dense.init(KEY, x)["params"]
        # give B nonzero values
        params = dict(params)
        params["lora_B"] = jnp.asarray(np.random.RandomState(2).randn(2, 8).astype(np.float32))
        out_lora = dense.apply({"params": params}, x)
        merged = merge_lora({"params": params}, alpha_over_rank=4.0 / 2)["params"]
        assert "lora_A" not in merged
        out_merged = x @ merged["kernel"] + merged["bias"]
        np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_merged), atol=1e-5)

    def test_passt_lora_params_exist(self):
        model = PaSST(
            embed_dim=32, depth=2, num_heads=4, img_size=(32, 100), tap_layers=(2,), lora_rank=2
        )
        x = jnp.zeros((1, 1, 32, 100))
        params = model.init({"params": KEY}, x)["params"]
        flat = flax.traverse_util.flatten_dict(params, sep="/")
        assert "blocks_0/attn/qkv/lora_A" in flat
        assert "blocks_0/attn/proj/lora_B" in flat

    def test_lora_label_fn(self):
        model = PaSST(
            embed_dim=32, depth=1, num_heads=4, img_size=(32, 100), tap_layers=(1,), lora_rank=2
        )
        params = model.init({"params": KEY}, jnp.zeros((1, 1, 32, 100)))["params"]
        labels = lora_label_fn(params)
        flat = flax.traverse_util.flatten_dict(labels, sep="/")
        assert flat["blocks_0/attn/qkv/lora_A"] == "lora"
        assert flat["blocks_0/attn/qkv/kernel"] == "frozen"
        # optimizer integration: frozen params get zero updates
        tx = optax.multi_transform(
            {"lora": optax.sgd(1.0), "frozen": optax.set_to_zero()}, labels
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, tx.init(params), params)
        uflat = flax.traverse_util.flatten_dict(updates, sep="/")
        assert float(jnp.abs(uflat["blocks_0/attn/qkv/kernel"]).max()) == 0
        assert float(jnp.abs(uflat["blocks_0/attn/qkv/lora_A"]).max()) > 0

    def test_lora_params_filter(self):
        dense = LoRADense(features=4, rank=2)
        params = dense.init(KEY, jnp.zeros((1, 3)))["params"]
        only = lora_params(params)
        flat = flax.traverse_util.flatten_dict(only, sep="/")
        assert set(flat) == {"lora_A", "lora_B"}


class TestLoRAVariants:
    """MergedLinear / Embedding / ConvLoRA equivalents
    (``src/models/lora/layers.py:61-330`` — vendored, unused by the
    reference recipes, implemented for inventory completeness)."""

    def test_merged_dense_partial_groups(self):
        from transformer4sed_tpu.models.lora import LoRAMergedDense

        m = LoRAMergedDense(features=12, enable_lora=(True, False, True), rank=2, alpha=2.0)
        x = jnp.asarray(np.random.RandomState(0).randn(3, 5).astype(np.float32))
        params = dict(m.init(KEY, x)["params"])
        assert set(k for k in params if k.startswith("lora")) == {
            "lora_A_g0", "lora_B_g0", "lora_A_g2", "lora_B_g2"
        }
        # zero-B init -> identity with base
        base = x @ params["kernel"] + params["bias"]
        np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)), np.asarray(base), atol=1e-6)
        # nonzero B: delta lands only in the enabled slices
        rng = np.random.RandomState(1)
        params["lora_B_g0"] = jnp.asarray(rng.randn(2, 4).astype(np.float32))
        params["lora_B_g2"] = jnp.asarray(rng.randn(2, 4).astype(np.float32))
        out = np.asarray(m.apply({"params": params}, x))
        np.testing.assert_allclose(out[:, 4:8], np.asarray(base)[:, 4:8], atol=1e-6)
        assert np.abs(out[:, :4] - np.asarray(base)[:, :4]).max() > 1e-4

        # merge folds each group into its kernel slice
        merged = merge_lora({"params": params}, alpha_over_rank=2.0 / 2)["params"]
        assert not any(k.startswith("lora") for k in merged)
        out_merged = x @ merged["kernel"] + merged["bias"]
        np.testing.assert_allclose(out, np.asarray(out_merged), atol=1e-5)

    def test_embedding(self):
        from transformer4sed_tpu.models.lora import LoRAEmbedding

        emb = LoRAEmbedding(num_embeddings=7, features=6, rank=2, alpha=4.0)
        ids = jnp.asarray([0, 3, 6, 3])
        params = dict(emb.init(KEY, ids)["params"])
        # reference zeroes A (not B) for Embedding -> identity at init
        base = jnp.take(params["embedding"], ids, axis=0)
        np.testing.assert_allclose(np.asarray(emb.apply({"params": params}, ids)), np.asarray(base), atol=1e-6)
        params["lora_A"] = jnp.asarray(np.random.RandomState(2).randn(7, 2).astype(np.float32))
        out = np.asarray(emb.apply({"params": params}, ids))
        merged = merge_lora({"params": params}, alpha_over_rank=4.0 / 2)["params"]
        np.testing.assert_allclose(out, np.asarray(jnp.take(merged["embedding"], ids, axis=0)), atol=1e-5)

    def test_conv(self):
        from transformer4sed_tpu.models.lora import LoRAConv

        conv = LoRAConv(features=5, kernel_size=(3, 3), rank=2, alpha=2.0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))
        params = dict(conv.init(KEY, x)["params"])
        out0 = np.asarray(conv.apply({"params": params}, x))
        params["lora_B"] = jnp.asarray(np.random.RandomState(3).randn(2, 5).astype(np.float32))
        out = np.asarray(conv.apply({"params": params}, x))
        assert np.abs(out - out0).max() > 1e-4
        merged = merge_lora({"params": params}, alpha_over_rank=2.0 / 2)["params"]
        assert "lora_A" not in merged
        out_merged = np.asarray(
            LoRAConv(features=5, kernel_size=(3, 3), rank=0).apply({"params": merged}, x)
        )
        np.testing.assert_allclose(out, out_merged, atol=1e-4)

    def test_grouped_label_and_filter(self):
        from transformer4sed_tpu.models.lora import LoRAMergedDense

        m = LoRAMergedDense(features=6, enable_lora=(True, True), rank=1)
        params = m.init(KEY, jnp.zeros((1, 4)))["params"]
        labels = flax.traverse_util.flatten_dict(lora_label_fn(params), sep="/")
        assert labels["lora_A_g0"] == "lora" and labels["kernel"] == "frozen"
        only = flax.traverse_util.flatten_dict(lora_params(params), sep="/")
        assert set(only) == {"lora_A_g0", "lora_B_g0", "lora_A_g1", "lora_B_g1"}


class TestDropBlock:
    def test_identity_eval(self):
        from transformer4sed_tpu.models.cnn import DropBlock2D

        m = DropBlock2D(rate=0.5)
        x = jnp.ones((1, 8, 8, 2))
        out = m.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_drops_blocks_training(self):
        from transformer4sed_tpu.models.cnn import DropBlock2D

        m = DropBlock2D(rate=0.3, block_size=3)
        x = jnp.ones((2, 16, 16, 1))
        out = np.asarray(m.apply({}, x, deterministic=False, rngs={"dropout": KEY}))
        assert (out == 0).any()
        # kept values are rescaled
        assert out.max() > 1.0


class TestLoRATrainableGroups:
    def test_lora_leaves_train_in_frozen_backbone(self):
        """PMAM policy (pmam/main.py:107): encoder lr 0 freezes the
        backbone but LoRA adapters keep training at the decoder LR."""
        from transformer4sed_tpu.train.optim import (
            GroupSpec,
            ParamGroupConfig,
            label_params,
        )

        model = PaSST(
            embed_dim=32, depth=2, num_heads=4, img_size=(32, 100), tap_layers=(2,), lora_rank=2
        )
        params = {"backbone": model.init({"params": KEY}, jnp.zeros((1, 1, 32, 100)))["params"]}
        cfg = ParamGroupConfig(
            encoder=GroupSpec(lr=0.0), decoder=GroupSpec(lr=1e-3), head=GroupSpec(lr=1e-3),
            backbone_depth=2, lora_trainable=True,
        )
        labels = label_params(params, cfg)
        flat = flax.traverse_util.flatten_dict(labels, sep="/")
        assert flat["backbone/blocks_0/attn/qkv/lora_A"] == "decoder"
        assert flat["backbone/blocks_0/attn/qkv/kernel"] == "frozen"
        # without the flag, lora freezes with the backbone
        labels0 = label_params(params, ParamGroupConfig(
            encoder=GroupSpec(lr=0.0), backbone_depth=2))
        flat0 = flax.traverse_util.flatten_dict(labels0, sep="/")
        assert flat0["backbone/blocks_0/attn/qkv/lora_A"] == "frozen"


class TestPasstComplexCNN:
    def test_dual_spectrogram_forward(self):
        from transformer4sed_tpu.models.passt_cnn import PasstComplexCNN

        model = PasstComplexCNN(
            class_num=4,
            embed_dim=32,
            decoder_dim=32,
            backbone_depth=2,
            backbone_num_heads=4,
            decoder_num_heads=4,
            at_adapter_heads=4,
            passt_feature_layer=2,
            decoder="transformerXL",
            decoder_layer_num=1,
            decoder_pos_emd_len=200,
            at_adapter=True,
            cnn_name="base",
            cnn_param={
                "nb_filters": (8, 8, 16),
                # time pool x4 so the fixed x4 upsample lands back on the
                # decoder grid (reference passt_complex_spec_cnn.py:62-63)
                "pooling": ((2, 4), (2, 4), (1, 8)),
                "normalization": "layer",
                "activation": "glu",
            },
        )
        rng = np.random.RandomState(0)
        mel_trans = jnp.asarray(rng.randn(2, 128, 200).astype(np.float32))
        mel_cnn = jnp.asarray(rng.randn(2, 128, 200).astype(np.float32))
        variables = model.init({"params": KEY}, mel_trans, mel_cnn)
        out = model.apply(variables, mel_trans, mel_cnn)
        assert out.strong.shape == (2, 4, 200)
        assert out.weak.shape == (2, 4)
        assert out.at_out.shape == (2, 4)
        # the CNN spectrogram actually matters: different mel_cnn -> different output
        out2 = model.apply(variables, mel_trans, mel_cnn + 1.0)
        assert not np.allclose(np.asarray(out.strong), np.asarray(out2.strong))
