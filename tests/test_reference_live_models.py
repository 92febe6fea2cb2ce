"""Live-oracle forwards for the REST of the model zoo.

Companion to ``test_reference_live.py`` (see its header): the actual
reference models — PaSST_CNN, HTSAT_CNN, CLAP_SED, DASM_HTSAT, the
sliding-window encoder, PaSST-LoRA, FDY-CNN, ResNet — imported from
``/root/reference`` and compared against ours with converter-shared
weights.

The HTSAT-family constructors hard-code ``create_htsat_model(CLAPAudioCfp)``
+ ``torch.load(pretrain_model_path)`` (htsat_cnn.py:108-109); tests
monkeypatch the factory to a small HTSAT_Swin_Transformer geometry
(identical structure; full-stack parity of the real geometry is pinned
by TestHTSATLiveFullStack) and save a real state_dict to a tmp ``.pt``
for the hard-coded load.
"""

from __future__ import annotations

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import load


def t(x):
    return torch.as_tensor(np.asarray(x, dtype=np.float32))


def _perturb(model, scale=0.05, buffers=True):
    """Randomise affine/bn params + running stats so identity-init values
    cannot mask conversion bugs."""
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * scale)
        if buffers:
            for name, buf in model.named_buffers():
                if name.endswith("running_mean"):
                    buf.add_(torch.randn_like(buf) * 0.2)
                elif name.endswith("running_var"):
                    buf.mul_(torch.rand_like(buf) * 0.5 + 0.75)


SMALL_HTSAT = dict(spec_size=64, patch_size=4, patch_stride=(4, 4), num_classes=5,
                   embed_dim=32, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4),
                   window_size=2, mel_bins=32)


def _small_htsat_factory(ref_htsat_mod):
    cfg = types.SimpleNamespace(mel_bins=32, sample_rate=32000, window_size=1024,
                                hop_size=320, fmin=50, fmax=14000)

    def factory(_cfg):
        kw = dict(SMALL_HTSAT)
        kw.pop("mel_bins")
        return ref_htsat_mod.HTSAT_Swin_Transformer(
            drop_path_rate=0.0, config=cfg,
            **{**kw, "depths": list(SMALL_HTSAT["depths"]),
               "num_heads": list(SMALL_HTSAT["num_heads"])})

    return factory


def _backbone_ckpt(tmp_path, ref_htsat_mod):
    torch.manual_seed(30)
    bb = _small_htsat_factory(ref_htsat_mod)(None)
    _perturb(bb, 0.02)
    path = str(tmp_path / "backbone.pt")
    torch.save(bb.state_dict(), path)
    return path


CNN_PARAM = {
    "n_in_channel": 1,
    "nb_filters": [8, 8, 8, 8],
    "kernel_size": [3, 3, 3, 3], "padding": [1, 1, 1, 1], "stride": [1, 1, 1, 1],
    "pooling": [(1, 4), (1, 4), (1, 4), (1, 2)],  # F: 128 -> 1
    "activation": "glu", "normalization": "batch",
}


class TestPaSSTCNNLive:
    """Full PaSST_CNN (passt_cnn.py:9-92): PaSST_SED spine + parallel CNN
    branch merged as transformer_projector(x) + w*cnn_projector(cnn)."""

    def test_forward_matches(self):
        ref_mod = load("src.models.cnn_transformer.passt_cnn")
        from transformer4sed_tpu.models.passt_cnn import PaSST_CNN
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(31)
        d, C = 192, 10
        ref = ref_mod.PaSST_CNN(
            passt_sed_param=dict(
                embed_dim=d, decoder_dim=d, passt_feature_layer=10,
                decoder="transformerXL", decoder_layer_num=1,
                decoder_pos_emd_len=1000, load_pretrained_model=False,
                class_num=C, at_adapter=False),
            cnn_param=dict(CNN_PARAM, nb_filters=list(CNN_PARAM["nb_filters"])),
        ).eval()
        _perturb(ref.cnn, 0.05)

        rng = np.random.RandomState(32)
        mel = rng.randn(2, 128, 998).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, at_ref, _ = ref(t(mel), temp_w=0.5)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=12,
            backbone_num_heads=12, decoder_num_heads=12, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, at_adapter=False,
            cnn_param={k: v for k, v in CNN_PARAM.items()},
        )
        params, state = convert_torch_checkpoint(sd, "PaSST_CNN", init_kwargs=init_kwargs)
        model = PaSST_CNN(**init_kwargs)
        out = model.apply({"params": params, **state}, jnp.asarray(mel), temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), at_ref.numpy(), atol=2e-4)


class TestSlidingWindowLive:
    """encoder_win=True: the reference's overlap-add sliding-window fusion
    (encoder_slide_window.py:16-36 + passt_win.py) vs models/slide.py,
    through full live PaSST_SED forwards. Must run at embed 768: the
    reference hardcodes the overlap-add buffer width
    (EncoderSlideWindow.__init__ out_dim=768) — any other width crashes
    its own code."""

    def test_forward_matches(self):
        ref_mod = load("src.models.passt.passt_sed")
        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(33)
        d, C = 768, 10
        ref = ref_mod.PaSST_SED(
            embed_dim=d, decoder_dim=d, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, load_pretrained_model=False,
            class_num=C, at_adapter=False).eval()
        rng = np.random.RandomState(34)
        mel = rng.randn(1, 128, 998).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, at_ref, _ = ref(t(mel), encoder_win=True, mix_rate=0.5,
                                     win_param=[512, 49], temp_w=0.5)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=12,
            backbone_num_heads=12, decoder_num_heads=12, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, at_adapter=False)
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        model = PaSST_SED(**init_kwargs)
        out = model.apply({"params": params}, jnp.asarray(mel),
                          encoder_win=True, mix_rate=0.5, win_param=(512, 49),
                          temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out.weak), at_ref.numpy(), atol=3e-4)


class TestPaSSTLoRALive:
    """PaSST-LoRA (passt_lora.py): UNMERGED adapters on qkv/proj/fc1/fc2,
    live vs ours with lora_rank>0 and the lora-aware converter."""

    def test_forward_matches(self):
        ref_mod = load("src.models.passt.passt_sed")
        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(35)
        d, C, r, alpha = 192, 10, 4, 8
        ref = ref_mod.PaSST_SED(
            embed_dim=d, decoder_dim=d, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, load_pretrained_model=False,
            class_num=C, at_adapter=False,
            lora_config={"r": r, "lora_alpha": alpha})
        # lora_B inits to zero -> randomise so the low-rank path matters;
        # stay in train() mode = UNMERGED weights (eval() merges in place)
        with torch.no_grad():
            for name, p in ref.named_parameters():
                if "lora_" in name:
                    p.add_(torch.randn_like(p) * 0.2)
        ref.train()

        rng = np.random.RandomState(36)
        mel = rng.randn(1, 128, 998).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, at_ref, _ = ref(t(mel), temp_w=0.5)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        assert any(".lora_A" in k for k in sd), "expected unmerged lora keys"
        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=12,
            backbone_num_heads=12, decoder_num_heads=12, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, at_adapter=False,
            lora_rank=r, lora_alpha=float(alpha))
        # the dict came from a train()-mode net (BestModels mid-training
        # convention, src/utils/log.py:47-89) -> state the UNMERGED policy
        params, _ = convert_torch_checkpoint(
            sd, "PaSST_SED", init_kwargs=init_kwargs, lora_merged=False)
        model = PaSST_SED(**init_kwargs)
        out = model.apply({"params": params}, jnp.asarray(mel), temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), at_ref.numpy(), atol=2e-4)


class TestHTSATCNNLive:
    def test_forward_matches(self, tmp_path, monkeypatch):
        ref_htsat = load("src.models.htsat.htsat")
        ref_mod = load("src.models.htsat.htsat_cnn")
        from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
        from transformer4sed_tpu.utils.torch_import import convert_htsat_cnn

        monkeypatch.setattr(ref_mod, "create_htsat_model", _small_htsat_factory(ref_htsat))
        ckpt = _backbone_ckpt(tmp_path, ref_htsat)

        torch.manual_seed(37)
        emb = 32 * 8  # backbone num_features
        ref = ref_mod.HTSAT_CNN(
            cnn_param=None,
            backbone_param={"embed_dim": emb, "passt_feature_layer": 10,
                            "lora_config": None, "pretrain_model_path": ckpt},
            decoder_dim=64, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=1000, class_num=5).eval()

        rng = np.random.RandomState(38)
        wav = rng.randn(2, 320 * 120).astype(np.float32) * 0.1
        with torch.no_grad():
            mel_pre = ref.backbone.logmel_extractor(
                ref.backbone.spectrogram_extractor(t(wav)))
            mel_in = ref.backbone.wav2mel(t(wav), None)
            sed_ref, weak_ref, _ = ref(mel_in, temp_w=0.5)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        tree = convert_htsat_cnn(sd)
        model = HTSAT_CNN(class_num=5, decoder_dim=64, num_heads=4,
                          decoder="transformerXL", decoder_layer_num=1,
                          decoder_pos_emd_len=1000, htsat_kwargs=dict(SMALL_HTSAT),
                          cnn_param=None)
        out = model.apply(tree, jnp.asarray(mel_pre.numpy()), temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), weak_ref.numpy(), atol=2e-4)


class TestCLAPSEDLive:
    def test_forward_matches(self, tmp_path, monkeypatch):
        ref_htsat = load("src.models.htsat.htsat")
        ref_cnn_mod = load("src.models.htsat.htsat_cnn")
        ref_mod = load("src.models.htsat.clap_sed")
        from transformer4sed_tpu.models.htsat_heads import CLAP_SED
        from transformer4sed_tpu.utils.torch_import import convert_clap_sed

        # clap_sed imports create_htsat_model from htsat_cnn's namespace
        monkeypatch.setattr(ref_mod, "create_htsat_model", _small_htsat_factory(ref_htsat))
        ckpt = _backbone_ckpt(tmp_path, ref_htsat)
        torch.manual_seed(39)
        Q, qdim, emb = 4, 128, 32 * 8
        query = torch.randn(Q, qdim)
        qpath = str(tmp_path / "text_query.pt")
        torch.save(query, qpath)

        ref = ref_mod.CLAP_SED(embed_dim=emb, pretrain_model_path=ckpt,
                               text_query_path=qpath).eval()
        rng = np.random.RandomState(40)
        wav = rng.randn(2, 320 * 120).astype(np.float32) * 0.1
        with torch.no_grad():
            mel_pre = ref.backbone.logmel_extractor(
                ref.backbone.spectrogram_extractor(t(wav)))
            mel_in = ref.backbone.wav2mel(t(wav), None)
            sed_ref, weak_ref, _ = ref(mel_in, temp_w=0.5)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        tree = convert_clap_sed(sd)
        model = CLAP_SED(embed_dim=emb, class_num=Q, query_dim=qdim,
                         htsat_kwargs=dict(SMALL_HTSAT))
        out = model.apply(tree, jnp.asarray(mel_pre.numpy()), temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), weak_ref.numpy(), atol=2e-4)


class TestDASMHTSATLive:
    def test_forward_matches(self, tmp_path, monkeypatch):
        ref_htsat = load("src.models.htsat.htsat")
        ref_mod = load("src.models.detect_any_sound.detect_any_sound_htast")
        from transformer4sed_tpu.models.htsat_heads import DASM_HTSAT
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        monkeypatch.setattr(ref_mod, "create_htsat_model", _small_htsat_factory(ref_htsat))
        ckpt = _backbone_ckpt(tmp_path, ref_htsat)
        torch.manual_seed(41)
        Q, qdim, emb = 4, 64, 32 * 8
        ref = ref_mod.DASM_HTSAT(
            cnn_param=None,
            backbone_param={"embed_dim": emb, "passt_feature_layer": 10,
                            "lora_config": None, "pretrain_model_path": ckpt},
            at_param={"at_decoder_layer": 1, "query_projector": True,
                      "query_dim": qdim, "out_type": "sigmoid", "query": None},
            decoder_dim=64, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=1000, class_num=Q).eval()

        rng = np.random.RandomState(42)
        wav = rng.randn(2, 320 * 120).astype(np.float32) * 0.1
        query = rng.randn(Q, qdim).astype(np.float32)
        with torch.no_grad():
            mel_pre = ref.backbone.logmel_extractor(
                ref.backbone.spectrogram_extractor(t(wav)))
            mel_in = ref.backbone.wav2mel(t(wav), None)
            sed_ref, weak_ref, other_ref = ref(
                mel_in, temp_w=0.5, query=t(query), query_type="text")

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        init_kwargs = dict(
            class_num=Q, decoder_dim=64, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=1000,
            at_decoder_layer=1, out_type="sigmoid", cnn_param=None,
            query_projector=True, query_dim=qdim, htsat_embed_dim=emb,
            htsat_kwargs=dict(SMALL_HTSAT))
        params, state = convert_torch_checkpoint(sd, "DASM_HTSAT", init_kwargs=init_kwargs)
        model = DASM_HTSAT(**init_kwargs)
        out = model.apply({"params": params, **state}, jnp.asarray(mel_pre.numpy()),
                          query=jnp.asarray(query), query_type="text", temp_w=0.5)
        np.testing.assert_allclose(np.asarray(out.at_out),
                                   other_ref["at_out"].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), weak_ref.numpy(), atol=2e-4)


class TestASTSEDLive:
    """Full AST_SED live forwards (``ast_models.py:395-559``): deit
    base384 ASTModel (stub ``timm.create_model``, imagenet_pretrain=False)
    + frequency-wise transformer pooling + context net, converter-shared
    weights. The reference hardcodes ``.cuda()`` for the freq-pool tag
    token (ast_models.py:515) — ``torch.Tensor.cuda`` is monkeypatched to
    identity — and its sincos helper uses the removed ``np.float`` alias
    (pos_embed.py:57) — shimmed to ``float``."""

    def _make_ref(self, monkeypatch, **kw):
        ref_mod = load("src.models.ast.ast_models")
        monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                            raising=False)
        monkeypatch.setattr(np, "float", float, raising=False)
        torch.manual_seed(50)
        return ref_mod.AST_SED(load_pretrained_model=False, class_num=10, **kw)

    @staticmethod
    def _perturb_params(ref, scale=0.02, skip=("decoder_pos_embed",)):
        # randomise away identity-init LN affines etc; keep the fixed
        # sincos decoder_pos_embed buffer (ours is recomputed at trace)
        with torch.no_grad():
            for name, p in ref.named_parameters():
                if not any(s in name for s in skip):
                    p.add_(torch.randn_like(p) * scale)

    def _ours(self, ref, **init_kwargs):
        from transformer4sed_tpu.models.ast import AST_SED
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, _ = convert_torch_checkpoint(sd, "AST_SED", init_kwargs=init_kwargs)
        return AST_SED(class_num=10, **init_kwargs), params

    def test_local_gru_forward_matches(self, monkeypatch):
        ref = self._make_ref(monkeypatch)  # defaults: freq-pool + local_gru_decoder
        self._perturb_params(ref)
        ref.eval()
        rng = np.random.RandomState(51)
        mel = rng.randn(1, 128, 1024).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, at_ref, _ = ref(t(mel))

        model, params = self._ours(ref)
        out = model.apply({"params": params}, jnp.asarray(mel))
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.weak), at_ref.numpy(), atol=5e-4)

    def test_transformer_context_matches(self, monkeypatch):
        ref = self._make_ref(monkeypatch, context_block="transformer")
        self._perturb_params(ref)
        ref.eval()
        # the reference's fixed pos table spans init t_dim - 1 = 100 rows
        # (ast_models.py:468) -> feed T giving t_dim == 100
        rng = np.random.RandomState(52)
        mel = rng.randn(1, 128, 1006).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, at_ref, _ = ref(t(mel))

        model, params = self._ours(ref, context_block="transformer")
        out = model.apply({"params": params}, jnp.asarray(mel))
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out.weak), at_ref.numpy(), atol=3e-4)


class TestASTWithSlideLive:
    """ASTWithSlide live forward (``ast_models.py:562-658``): windowed
    backbone+f-pool encodes overlap-added at patch resolution, averaged,
    cropped to 100 rows, nearest-interpolated x10 and GRU-decoded. T=512
    keeps it to 17 full-width windows (the reference's own 1024/256/16
    layout scaled down; (T-win)%step==0 so torch takes no ragged tail)."""

    def test_forward_matches(self, monkeypatch):
        ref_mod = load("src.models.ast.ast_models")
        from transformer4sed_tpu.models.ast import ASTWithSlide
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                            raising=False)
        torch.manual_seed(53)
        ref = ref_mod.ASTWithSlide(load_pretrained_model=False, class_num=10)
        TestASTSEDLive._perturb_params(ref)
        ref.eval()
        rng = np.random.RandomState(54)
        mel = rng.randn(1, 128, 512).astype(np.float32) * 0.5
        with torch.no_grad():
            sed_ref, weak_ref = ref(t(mel), win_width=256, step=16)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, _ = convert_torch_checkpoint(sd, "ASTWithSlide")
        model = ASTWithSlide(class_num=10, win_width=256, step=16)
        out = model.apply({"params": params}, jnp.asarray(mel))
        np.testing.assert_allclose(np.asarray(out.strong), sed_ref.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.weak), weak_ref.numpy(), atol=5e-4)


class TestCNNFamilyLive:
    def test_fdy_cnn_matches(self):
        ref_mod = load("src.models.cnn")
        from transformer4sed_tpu.models.cnn import FDY_CNN
        from transformer4sed_tpu.utils.torch_import import convert_cnn

        torch.manual_seed(43)
        ref = ref_mod.FDY_CNN(
            n_input_ch=1, activation="glu", kernel=[3, 3, 3], pad=[1, 1, 1],
            stride=[1, 1, 1], nb_filters=[8, 8, 8],
            pooling=[(1, 4), (1, 4), (1, 4)], normalization="batch",
            n_basis_kernels=4, DY_layers=[0, 1, 1], temperature=31,
            pool_dim="freq").eval()
        _perturb(ref, 0.05)
        rng = np.random.RandomState(44)
        x = rng.randn(2, 1, 60, 64).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(t(x)).numpy()

        # FDY_CNN registers its Sequential as self.cnn -> keys already
        # carry the "cnn." prefix the converter expects
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, stats = convert_cnn(sd)
        model = FDY_CNN(n_input_ch=1, activation="glu", kernel=(3, 3, 3),
                        pad=(1, 1, 1), stride=(1, 1, 1), nb_filters=(8, 8, 8),
                        pooling=((1, 4), (1, 4), (1, 4)), normalization="batch",
                        n_basis_kernels=4, DY_layers=(0, 1, 1), temperature=31.0,
                        pool_dim="freq")
        out = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=3e-5)

    def test_resnet_matches(self):
        ref_mod = load("src.models.cnn")
        from transformer4sed_tpu.models.cnn import ResNet
        from transformer4sed_tpu.utils.torch_import import convert_resnet

        torch.manual_seed(45)
        ref = ref_mod.ResNet(
            n_in_channel=1, kernel_size=[3, 3, 3, 3], padding=[1, 1, 1, 1],
            stride=[1, 1, 1, 1], nb_filters=[8, 16, 16, 16],
            pooling=[(1, 4), (1, 4), (1, 4), (1, 4)],
            res_block_type="basic").eval()
        _perturb(ref, 0.05)
        rng = np.random.RandomState(46)
        x = rng.randn(2, 1, 60, 64).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(t(x)).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, stats = convert_resnet(sd)
        model = ResNet(n_in_channel=1, nb_filters=(8, 16, 16, 16),
                       stride=(1, 1, 1, 1),
                       pooling=((1, 4), (1, 4), (1, 4), (1, 4)),
                       res_block_type="basic")
        out = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=3e-5)
