"""AST legacy family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.models.ast import AST, AST_AT, AST_SED, ASTFrontend

KEY = jax.random.PRNGKey(0)


class TestASTFrontend:
    def test_shapes_and_padding(self):
        fe = ASTFrontend(target_length=256)
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32))  # 1 s
        fbank = fe(wav)
        assert fbank.shape == (2, 128, 256)
        # 1 s -> 98 frames; rest zero-padded then normalised
        raw = np.asarray(fbank)
        pad_region = raw[:, :, 120:]
        np.testing.assert_allclose(
            pad_region, (0 - fe.audioset_mean) / (fe.audioset_std * 2), atol=1e-5
        )

    def test_finite(self):
        fe = ASTFrontend(target_length=128)
        fbank = fe(jnp.zeros((1, 16000)))
        assert bool(jnp.isfinite(fbank).all())


class TestASTBackbone:
    def make(self):
        return AST(
            embed_dim=32, depth=2, num_heads=4, input_fdim=32, input_tdim=128, tap_layers=(2,)
        )

    def test_shapes(self):
        model = self.make()
        x = jnp.zeros((2, 1, 32, 128))
        params = model.init({"params": KEY}, x)
        out = model.apply(params, x)
        f, t = (32 - 16) // 10 + 1, (128 - 16) // 10 + 1
        assert out["f_dim"] == f and out["t_dim"] == t
        assert out["layer2_out"].shape == (2, 2 + f * t, 32)
        assert out["globals"].shape == (2, 527)


class TestASTSED:
    def test_forward_gru(self):
        # plain 'gru' context decodes at patch-time resolution (the
        # reference interpolates ONLY for local_gru_decoder)
        model = AST_SED(
            class_num=3,
            embed_dim=32,
            depth=2,
            num_heads=4,
            ast_feature_layer=2,
            input_fdim=32,
            input_tdim=128,
            context_block="gru",
        )
        fbank = jnp.asarray(np.random.RandomState(0).randn(2, 32, 128).astype(np.float32))
        params = model.init({"params": KEY}, fbank)
        out = model.apply(params, fbank)
        t_dim = (128 - 16) // 10 + 1
        assert out.strong.shape == (2, 3, t_dim)
        assert out.weak.shape == (2, 3)

    def test_forward_local_gru(self):
        model = AST_SED(
            class_num=3,
            embed_dim=32,
            depth=2,
            num_heads=4,
            ast_feature_layer=2,
            input_fdim=32,
            input_tdim=128,
            context_block="local_gru_decoder",
        )
        fbank = jnp.asarray(np.random.RandomState(0).randn(2, 32, 128).astype(np.float32))
        params = model.init({"params": KEY}, fbank)
        out = model.apply(params, fbank)
        t_out = ((128 - 16) // 10 + 1) * 10
        assert out.strong.shape == (2, 3, t_out)
        assert out.weak.shape == (2, 3)

    def test_transformer_context(self):
        model = AST_SED(
            class_num=3, embed_dim=32, depth=1, num_heads=4, ast_feature_layer=1,
            input_fdim=32, input_tdim=128, context_block="transformer",
        )
        fbank = jnp.zeros((1, 32, 128))
        out = model.apply(model.init({"params": KEY}, fbank), fbank)
        assert out.strong.shape[1] == 3


class TestASTAT:
    def test_tagging(self):
        model = AST_AT(class_num=7, embed_dim=32, depth=1, num_heads=4, input_fdim=32, input_tdim=128)
        fbank = jnp.zeros((1, 32, 128))
        out = model.apply(model.init({"params": KEY}, fbank), fbank)
        assert out.shape == (1, 7)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


class TestASTWithSlide:
    def test_forward(self):
        from transformer4sed_tpu.models.ast import ASTWithSlide

        # scale chosen so the 3 windows (t_w=5 patches each at starts
        # 0/32/64) fully cover the round(128*scale)=10-row grid
        model = ASTWithSlide(
            class_num=3, embed_dim=32, depth=1, num_heads=4, ast_feature_layer=1,
            input_fdim=32, input_tdim=128, win_width=64, step=32, decode_ratio=10,
            scale=5.0 / 64.0,
        )
        fbank = jnp.asarray(np.random.RandomState(0).randn(1, 32, 128).astype(np.float32))
        out = model.apply(model.init({"params": KEY}, fbank), fbank)
        # grid 10 -> crop min(100, 10) -> x10 nearest = 100 frames
        assert out.strong.shape == (1, 3, 100)
        assert out.weak.shape == (1, 3)
        assert bool(jnp.isfinite(out.strong).all())
