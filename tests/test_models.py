"""Model zoo tests: block math parity vs torch, backbone/decoder shapes,
interpolation parity, MLM mask statistics, sliding-window overlap-add."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.models.interpolate import interpolate_time
from transformer4sed_tpu.models.mlm import MLMMasker
from transformer4sed_tpu.models.passt import PaSST
from transformer4sed_tpu.models.passt_sed import PaSST_SED
from transformer4sed_tpu.models.slide import slide_window_encode, window_layout
from transformer4sed_tpu.models.vit import Attention, Block
from transformer4sed_tpu.models.xl import (
    TransformerXLDecoder,
    ConformerDecoder,
    BiGRUDecoder,
    _rel_shift,
    diagonal_mask,
    rel_positional_encoding,
)

KEY = jax.random.PRNGKey(0)


class TestVitBlocks:
    def test_attention_matches_torch_math(self):
        """Validate attention against an explicit torch computation with shared weights."""
        torch = pytest.importorskip("torch")
        d, h, n, b = 16, 4, 6, 2
        x = np.random.RandomState(0).randn(b, n, d).astype(np.float32)

        attn = Attention(num_heads=h, qkv_bias=True)
        params = attn.init(KEY, jnp.asarray(x))
        ours = np.asarray(attn.apply(params, jnp.asarray(x)))

        wqkv = np.asarray(params["params"]["qkv"]["kernel"])  # [d, 3d]
        bqkv = np.asarray(params["params"]["qkv"]["bias"])
        wproj = np.asarray(params["params"]["proj"]["kernel"])
        bproj = np.asarray(params["params"]["proj"]["bias"])

        tx = torch.tensor(x)
        qkv = tx @ torch.tensor(wqkv) + torch.tensor(bqkv)
        qkv = qkv.reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (d // h) ** -0.5
        a = a.softmax(dim=-1)
        ref = (a @ v).transpose(1, 2).reshape(b, n, d)
        ref = ref @ torch.tensor(wproj) + torch.tensor(bproj)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_block_shapes_and_mask(self):
        block = Block(num_heads=4)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 10, 32).astype(np.float32))
        params = block.init(KEY, x)
        out = block.apply(params, x)
        assert out.shape == x.shape
        # full block mask on off-diagonal must change output
        mask = ~jnp.eye(10, dtype=bool)
        out_masked = block.apply(params, x, mask)
        assert not np.allclose(np.asarray(out), np.asarray(out_masked))


class TestPaSST:
    def make(self, **kw):
        cfg = dict(
            embed_dim=32,
            depth=3,
            num_heads=4,
            img_size=(32, 200),
            patch_size=(16, 16),
            stride=(10, 10),
            tap_layers=(2,),
        )
        cfg.update(kw)
        return PaSST(**cfg)

    def test_shapes_and_taps(self):
        model = self.make()
        x = jnp.zeros((2, 1, 32, 200))
        params = model.init({"params": KEY}, x)
        out = model.apply(params, x)
        f, t = 2, 19  # (32-16)//10+1, (200-16)//10+1
        assert out["f_dim"] == f and out["t_dim"] == t
        assert out["layer2_out"].shape == (2, f * t + 2, 32)
        assert out["frame"].shape == (2, f * t + 2, 32)

    def test_training_patchout_shapes(self):
        model = self.make(s_patchout_f=1, u_patchout=3)
        x = jnp.zeros((2, 1, 32, 150))  # t' = 14 < nominal 19 -> random pos crop
        params = model.init({"params": KEY}, x)
        out = model.apply(
            model.init({"params": KEY}, x),
            x,
            train=True,
            rngs={"patchout": jax.random.PRNGKey(7)},
        )
        f, t = 1, 14
        assert out["f_dim"] == f and out["t_dim"] == t
        assert out["layer2_out"].shape == (2, f * t + 2 - 3, 32)

    def test_deterministic_eval(self):
        model = self.make()
        x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 32, 200).astype(np.float32))
        params = model.init({"params": KEY}, x)
        a = model.apply(params, x)["frame"]
        b = model.apply(params, x)["frame"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_variant_registry(self):
        """The reference's ~15 factory functions as a registry
        (passt.py:1073-1232): every variant builds with its stride/grid
        and records a checkpoint URL."""
        from transformer4sed_tpu.models.passt import PASST_VARIANTS, create_passt

        assert len(PASST_VARIANTS) >= 13
        for name, cfg in PASST_VARIANTS.items():
            assert cfg["url"].startswith("https://") and cfg["num_classes"] == 527
        m = create_passt("passt_s_p16_s12_128_ap470")
        assert m.stride == (12, 12) and m.img_size == (128, 998)
        m30 = create_passt("passt_s_f128_30sec_p16_s10_ap473_swa")
        assert m30.img_size == (128, 3000)
        with pytest.raises(ValueError):
            create_passt("nope")


class TestRelShift:
    def test_matches_naive(self):
        b, h, t = 2, 3, 7
        x = np.random.RandomState(0).randn(b, h, t, 2 * t - 1).astype(np.float32)
        out = np.asarray(_rel_shift(jnp.asarray(x)))
        ref = np.zeros((b, h, t, t), dtype=np.float32)
        for i in range(t):
            for j in range(t):
                ref[:, :, i, j] = x[:, :, i, (t - 1) - i + j]
        np.testing.assert_array_equal(out, ref)

    def test_pos_encoding_center_is_zero_offset(self):
        pe = rel_positional_encoding(5, 8)
        assert pe.shape == (1, 9, 8)
        # offset-0 entry (index T-1=4): sin(0)=0, cos(0)=1
        np.testing.assert_allclose(pe[0, 4, 0::2], 0.0, atol=1e-6)
        np.testing.assert_allclose(pe[0, 4, 1::2], 1.0, atol=1e-6)


class TestDiagonalMask:
    def test_matches_reference_loop(self):
        for w in [3, 4, 31]:
            ours = diagonal_mask(20, w)
            ref = np.ones((20, 20), dtype=bool)
            for i in range(20):
                ref[i, max(0, i - w // 2) : i + w // 2] = False
            np.testing.assert_array_equal(ours, ref)


class TestDecoders:
    def test_xl_decoder_shapes(self):
        dec = TransformerXLDecoder(decoder_layer_num=2, num_heads=4, seq_len=50)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 50, 32).astype(np.float32))
        params = dec.init(KEY, x)
        out = dec.apply(params, x)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())

    def test_xl_band_mask_limits_context(self):
        dec_full = TransformerXLDecoder(decoder_layer_num=1, num_heads=2, seq_len=40)
        dec_band = TransformerXLDecoder(decoder_layer_num=1, num_heads=2, seq_len=40, window_len=5)
        x = jnp.asarray(np.random.RandomState(4).randn(1, 40, 16).astype(np.float32))
        params = dec_full.init(KEY, x)
        out_full = dec_full.apply(params, x)
        out_band = dec_band.apply(params, x)
        assert not np.allclose(np.asarray(out_full), np.asarray(out_band))

    def test_xl_per_head_widths(self):
        dec = TransformerXLDecoder(decoder_layer_num=1, num_heads=2, seq_len=30, window_len=[3, 7])
        x = jnp.zeros((1, 30, 16))
        out = dec.apply(dec.init(KEY, x), x)
        assert out.shape == x.shape

    def test_conformer_shapes(self):
        dec = ConformerDecoder(decoder_layer_num=1, num_heads=4, seq_len=40)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 40, 32).astype(np.float32))
        out = dec.apply(dec.init(KEY, x), x)
        assert out.shape == x.shape

    def test_gru_shapes(self):
        dec = BiGRUDecoder(hidden_dim=16, num_layers=2)
        x = jnp.asarray(np.random.RandomState(6).randn(2, 20, 16).astype(np.float32))
        out = dec.apply(dec.init(KEY, x), x)
        assert out.shape == (2, 20, 32)


class TestInterpolate:
    def test_matches_torch_linear(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).randn(2, 10, 4).astype(np.float32)
        ours = np.asarray(interpolate_time(jnp.asarray(x), 10))
        ref = (
            torch.nn.functional.interpolate(
                torch.tensor(x).transpose(1, 2), scale_factor=10, mode="linear"
            )
            .transpose(1, 2)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_ratio_one_identity(self):
        x = jnp.ones((1, 5, 2))
        assert interpolate_time(x, 1) is x

    def test_resize_time_matches_torch_arbitrary_length(self):
        """Non-integer ratios (e.g. CNN grid 120 -> decoder grid 320)
        must match F.interpolate(mode='linear', align_corners=False),
        including the edge-clamped (not extrapolated) first/last frames."""
        torch = pytest.importorskip("torch")
        from transformer4sed_tpu.models.interpolate import resize_time

        x = np.random.RandomState(1).randn(2, 120, 4).astype(np.float32)
        for t_out in (320, 100, 37):
            ours = np.asarray(resize_time(jnp.asarray(x), t_out))
            ref = (
                torch.nn.functional.interpolate(
                    torch.tensor(x).transpose(1, 2), size=t_out, mode="linear"
                )
                .transpose(1, 2)
                .numpy()
            )
            # torch computes the blend weights in float32 (inexact 1.2
            # scale accumulates ~1e-5 by i~100); semantics are identical
            np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=f"t_out={t_out}")
        # upsampling edge frames replicate the boundary inputs
        up = np.asarray(resize_time(jnp.asarray(x), 320))
        np.testing.assert_allclose(up[:, 0], x[:, 0], atol=1e-6)
        np.testing.assert_allclose(up[:, -1], x[:, -1], atol=1e-6)


class TestMLM:
    def test_block_mask_rate(self):
        masker = MLMMasker(mask_rate=0.75, strategy="block", block_width=10)
        ids = masker.mask_ids(KEY, 8, 1000)
        assert ids.shape == (8, 1000)
        rate = float(jnp.mean(ids.astype(jnp.float32)))
        # sorted-threshold construction masks kth+1 segments = 75+1 of 100
        assert abs(rate - 0.76) < 0.001

    def test_block_structure(self):
        masker = MLMMasker(mask_rate=0.5, strategy="block", block_width=10)
        ids = np.asarray(masker.mask_ids(KEY, 2, 100))
        blocks = ids.reshape(2, 10, 10)
        assert ((blocks.sum(-1) == 0) | (blocks.sum(-1) == 10)).all()

    def test_random_mask_rate(self):
        masker = MLMMasker(mask_rate=0.15, strategy="random")
        ids = masker.mask_ids(KEY, 64, 1000)
        rate = float(jnp.mean(ids.astype(jnp.float32)))
        assert abs(rate - 0.15) < 0.02

    def test_sentence_mask_styles(self):
        masker = MLMMasker(mask_rate=0.5, mask_style=(1.0, 0.0, 0.0), strategy="random")
        seq = jnp.asarray(np.random.RandomState(0).randn(4, 100, 8).astype(np.float32))
        token = jnp.full((1, 1, 8), 99.0)
        masked, ids = masker(KEY, seq, token)
        ids = np.asarray(ids)
        masked = np.asarray(masked)
        # all masked positions replaced by the token
        np.testing.assert_allclose(masked[ids], 99.0)
        np.testing.assert_allclose(masked[~ids], np.asarray(seq)[~ids])


class TestSlideWindow:
    def test_layout_matches_reference_loop(self):
        for t, w, s in [(1000, 512, 49), (1000, 512, 31), (100, 30, 7)]:
            ours = window_layout(t, w, s)
            ref = []
            for left in range(0, t + s - w, s):
                right = min(left + w, t)
                ref.append((left, right - left))
            assert ours == ref

    def test_overlap_add_mean(self):
        # encode_fn = identity on the mean-free axis: output t equals input width
        def encode(x):  # [N, F, W] -> [N, W, F]
            return x.transpose(0, 2, 1)

        mel = jnp.asarray(np.random.RandomState(1).randn(2, 3, 100).astype(np.float32))
        out = np.asarray(slide_window_encode(encode, mel, emb_len=100, win_width=30, step=7))
        # naive reference overlap-add
        ref = np.zeros((2, 100, 3))
        cnt = np.zeros((2, 100, 1))
        for left in range(0, 100 + 7 - 30, 7):
            right = min(left + 30, 100)
            seg = np.asarray(mel)[:, :, left:right].transpose(0, 2, 1)
            ref[:, left:right] += seg
            cnt[:, left:right] += 1
        ref = np.where(cnt > 0, ref / np.maximum(cnt, 1), 0.0)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestPaSSTSED:
    def make(self, **kw):
        cfg = dict(
            class_num=5,
            embed_dim=32,
            decoder_dim=32,
            backbone_depth=2,
            backbone_num_heads=4,
            passt_feature_layer=2,
            decoder="transformerXL",
            decoder_num_heads=4,
            at_adapter_heads=4,
            decoder_layer_num=1,
            decoder_pos_emd_len=200,
            at_adapter=True,
        )
        cfg.update(kw)
        return PaSST_SED(**cfg)

    def mel(self, b=2, f=128, t=200):
        return jnp.asarray(np.random.RandomState(0).randn(b, f, t).astype(np.float32))

    def test_forward_contract(self):
        model = self.make()
        mel = self.mel()
        params = model.init({"params": KEY}, mel)
        out = model.apply(params, mel)
        t_frames = ((200 - 16) // 10 + 1 + 1) * 10  # (19 + pad) * ratio = 200
        assert out.strong.shape == (2, 5, t_frames)
        assert out.weak.shape == (2, 5)
        assert out.at_out.shape == (2, 5)
        s = np.asarray(out.strong)
        assert (s >= 0).all() and (s <= 1).all()

    def test_pad_mask_zeroes(self):
        model = self.make()
        mel = self.mel()
        params = model.init({"params": KEY}, mel)
        pad = jnp.zeros((2, 200), dtype=bool).at[:, 150:].set(True)
        out = model.apply(params, mel, pad_mask=pad)
        s = np.asarray(out.strong)
        assert (s[:, :, 150:] == 0).all()
        assert (s[:, :, :150] > 0).any()

    def test_temp_w_sharpens(self):
        model = self.make()
        mel = self.mel()
        params = model.init({"params": KEY}, mel)
        out1 = np.asarray(model.apply(params, mel, temp_w=1.0).strong)
        out05 = np.asarray(model.apply(params, mel, temp_w=0.5).strong)
        assert not np.allclose(out1, out05)

    def test_mlm_mode(self):
        model = self.make(mlm=True, mlm_dict={"mask_rate": 0.5, "strategy": "block", "block_width": 10, "out_dim": 32})
        mel = self.mel()
        params = model.init({"params": KEY, "mlm": KEY}, mel)
        out = model.apply(params, mel, rngs={"mlm": jax.random.PRNGKey(1)})
        assert out.mlm_pred.shape == (2, 200, 32)
        assert out.frame_before_mask.shape == (2, 200, 32)
        assert out.mask_id_seq.shape == (2, 200)

    def test_encoder_win_fusion(self):
        model = self.make()
        mel = self.mel()
        params = model.init({"params": KEY}, mel)
        out_global = model.apply(params, mel)
        out_fused = model.apply(params, mel, encoder_win=True, win_param=(100, 37), mix_rate=0.5)
        assert out_fused.strong.shape == out_global.strong.shape
        assert not np.allclose(np.asarray(out_fused.strong), np.asarray(out_global.strong))


class TestRemat:
    def test_remat_matches_plain(self):
        cfg = dict(embed_dim=32, depth=2, num_heads=4, img_size=(32, 200), tap_layers=(2,))
        plain = PaSST(**cfg)
        remat = PaSST(**cfg, remat=True)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 32, 200).astype(np.float32))
        params = plain.init({"params": KEY}, x)
        a = plain.apply(params, x)["frame"]
        b = remat.apply(params, x)["frame"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        # gradients also agree
        def loss(fn):
            def inner(p):
                return jnp.sum(fn.apply(p, x)["frame"] ** 2)
            return inner

        ga = jax.grad(loss(plain))(params)
        gb = jax.grad(loss(remat))(params)
        for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


class TestPaSSTSEDDecoderVariants:
    def _run(self, decoder, **extra):
        cfg = dict(
            class_num=3,
            embed_dim=32,
            decoder_dim=32,
            backbone_depth=2,
            backbone_num_heads=4,
            decoder_num_heads=4,
            at_adapter_heads=4,
            passt_feature_layer=2,
            decoder=decoder,
            decoder_layer_num=1,
            decoder_pos_emd_len=200,
        )
        cfg.update(extra)
        model = PaSST_SED(**cfg)
        mel = jnp.asarray(np.random.RandomState(0).randn(1, 128, 200).astype(np.float32))
        out = model.apply(model.init({"params": KEY}, mel), mel)
        assert out.strong.shape == (1, 3, 200)
        return out

    def test_conformer(self):
        self._run("conformer")

    def test_gru(self):
        self._run("gru")

    def test_no_decoder(self):
        self._run("no")

    def test_transformer(self):
        self._run("transformer")

    def test_band_window(self):
        self._run("transformerXL", decoder_win_len=31)


class TestPoolingLib:
    """Frequency-pooling module inventory (reference src/models/pooling.py)."""

    def test_shapes_all_variants(self):
        import numpy as np

        from transformer4sed_tpu.models.pooling import (
            ActivateAttentionPooling,
            AttentionPooling,
            FrequencyWiseTransformerPooling,
            MeanPool,
        )

        x = jnp.asarray(np.random.RandomState(0).randn(3, 8, 32).astype(np.float32))
        for mod in (
            MeanPool(),
            AttentionPooling(num_heads=4),
            FrequencyWiseTransformerPooling(num_heads=4),
            ActivateAttentionPooling(num_heads=4),
        ):
            variables = mod.init(jax.random.PRNGKey(0), x)
            out = mod.apply(variables, x)
            assert out.shape == (3, 32), type(mod).__name__

    def test_mean_pool_value(self):
        import numpy as np

        from transformer4sed_tpu.models.pooling import MeanPool

        x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 4).astype(np.float32))
        out = MeanPool().apply({}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean(1), atol=1e-6)
