"""Numerical parity: torch reference semantics -> importer -> flax model.

Builds a minimal torch implementation of the PaSST backbone semantics
(conv patch embed, disentangled pos embeds, cls/dist tokens, pre-norm
ViT blocks, final LN) *in the test*, exports its state_dict with the
reference's key naming, imports it with ``convert_passt_backbone`` and
checks the flax forward reproduces the torch activations. This is the
checkpoint-import fidelity test that real published weights would get.

SUPERSEDED (r3) as the primary parity oracle by the LIVE-reference
suites ``test_reference_live.py`` / ``test_reference_live_models.py``,
which import the actual /root/reference modules instead of transcribing
their math (a transcription here carried a wrong LayerNorm eps for the
XL/Conformer blocks until the live oracle caught it). These tests stay
as fast, tiny-shape regressions of the converter path and of semantics
the live oracle can't reach (train-step loops, BN trajectories,
frontend library math for libs absent from the image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from transformer4sed_tpu.models.passt import PaSST  # noqa: E402
from transformer4sed_tpu.utils.torch_import import convert_passt_backbone  # noqa: E402

D, DEPTH, HEADS = 32, 2, 4
IMG = (32, 200)  # grid (2, 19)


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(D, eps=1e-6)
        self.attn_qkv = tnn.Linear(D, 3 * D)
        self.attn_proj = tnn.Linear(D, D)
        self.norm2 = tnn.LayerNorm(D, eps=1e-6)
        self.mlp_fc1 = tnn.Linear(D, 4 * D)
        self.mlp_fc2 = tnn.Linear(4 * D, D)

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(b, n, 3, HEADS, c // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (c // HEADS) ** -0.5
        a = a.softmax(dim=-1)
        h = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn_proj(h)
        h = self.norm2(x)
        h = self.mlp_fc2(tnn.functional.gelu(self.mlp_fc1(h)))
        return x + h


class TorchMiniPaSST(tnn.Module):
    def __init__(self):
        super().__init__()
        grid = ((IMG[0] - 16) // 10 + 1, (IMG[1] - 16) // 10 + 1)
        self.proj = tnn.Conv2d(1, D, kernel_size=16, stride=10)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.dist_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.new_pos_embed = tnn.Parameter(torch.randn(1, 2, D) * 0.02)
        self.freq_pos = tnn.Parameter(torch.randn(1, D, grid[0], 1) * 0.02)
        self.time_pos = tnn.Parameter(torch.randn(1, D, 1, grid[1]) * 0.02)
        self.blocks = tnn.ModuleList(TorchBlock() for _ in range(DEPTH))
        self.norm = tnn.LayerNorm(D, eps=1e-6)

    def forward(self, x):
        p = self.proj(x)  # [B, D, F', T']
        p = p + self.time_pos + self.freq_pos
        b, d, f, t = p.shape
        seq = p.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1) + self.new_pos_embed[:, :1]
        dist = self.dist_token.expand(b, -1, -1) + self.new_pos_embed[:, 1:]
        h = torch.cat([cls, dist, seq], dim=1)
        taps = {}
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            taps[i + 1] = h
        return self.norm(h), taps

    def reference_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.proj.weight.detach(),
            "patch_embed.proj.bias": self.proj.bias.detach(),
            "cls_token": self.cls_token.detach(),
            "dist_token": self.dist_token.detach(),
            "new_pos_embed": self.new_pos_embed.detach(),
            "freq_new_pos_embed": self.freq_pos.detach(),
            "time_new_pos_embed": self.time_pos.detach(),
            "norm.weight": self.norm.weight.detach(),
            "norm.bias": self.norm.bias.detach(),
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd.update(
                {
                    f"{p}.norm1.weight": blk.norm1.weight.detach(),
                    f"{p}.norm1.bias": blk.norm1.bias.detach(),
                    f"{p}.attn.qkv.weight": blk.attn_qkv.weight.detach(),
                    f"{p}.attn.qkv.bias": blk.attn_qkv.bias.detach(),
                    f"{p}.attn.proj.weight": blk.attn_proj.weight.detach(),
                    f"{p}.attn.proj.bias": blk.attn_proj.bias.detach(),
                    f"{p}.norm2.weight": blk.norm2.weight.detach(),
                    f"{p}.norm2.bias": blk.norm2.bias.detach(),
                    f"{p}.mlp.fc1.weight": blk.mlp_fc1.weight.detach(),
                    f"{p}.mlp.fc1.bias": blk.mlp_fc1.bias.detach(),
                    f"{p}.mlp.fc2.weight": blk.mlp_fc2.weight.detach(),
                    f"{p}.mlp.fc2.bias": blk.mlp_fc2.bias.detach(),
                }
            )
        return {k: v.numpy() for k, v in sd.items()}


class TestTorchParity:
    def test_backbone_logit_parity(self):
        torch.manual_seed(0)
        tmodel = TorchMiniPaSST().eval()
        x = torch.randn(2, 1, *IMG)
        with torch.no_grad():
            t_frame, t_taps = tmodel(x)

        params = convert_passt_backbone(tmodel.reference_state_dict(), depth=DEPTH)
        fmodel = PaSST(
            embed_dim=D, depth=DEPTH, num_heads=HEADS, img_size=IMG, tap_layers=(1, 2)
        )
        out = fmodel.apply({"params": params}, jnp.asarray(x.numpy()))

        np.testing.assert_allclose(
            np.asarray(out["layer1_out"]), t_taps[1].numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["layer2_out"]), t_taps[2].numpy(), atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(out["frame"]), t_frame.numpy(), atol=2e-5)


class TestNativePtReader:
    """The torch-free checkpoint reader must reproduce torch.load bit-for-bit
    on real torch.save output (VERDICT r1: make the importer exercisable
    without torch)."""

    def _roundtrip(self, tmp_path, obj):
        from transformer4sed_tpu.utils.torch_import import read_pt_file

        p = str(tmp_path / "ckpt.pt")
        torch.save(obj, p)
        return read_pt_file(p)

    def test_dtypes_and_shapes(self, tmp_path):
        torch.manual_seed(0)
        sd = {
            "f32": torch.randn(3, 5),
            "f64": torch.randn(2, 2, dtype=torch.float64),
            "f16": torch.randn(4, dtype=torch.float16),
            "i64": torch.arange(6).reshape(2, 3),
            "i32": torch.arange(4, dtype=torch.int32),
            "u8": torch.arange(5, dtype=torch.uint8),
            "bool": torch.tensor([True, False, True]),
            "scalar": torch.tensor(3.25),
        }
        out = self._roundtrip(tmp_path, sd)
        assert list(out) == list(sd)
        for k, t in sd.items():
            np.testing.assert_array_equal(np.asarray(out[k]), t.numpy())

    def test_bfloat16(self, tmp_path):
        t = torch.randn(7, dtype=torch.bfloat16)
        out = self._roundtrip(tmp_path, {"x": t})
        np.testing.assert_array_equal(
            np.asarray(out["x"]).astype(np.float32), t.float().numpy()
        )

    def test_noncontiguous_and_shared_storage(self, tmp_path):
        base = torch.randn(4, 6)
        sd = {
            "strided": base[:, ::2],
            "transposed": base.t(),
            "offset": base.flatten()[5:11],
        }
        out = self._roundtrip(tmp_path, sd)
        for k, t in sd.items():
            np.testing.assert_array_equal(np.asarray(out[k]), t.numpy())

    def test_refuses_arbitrary_classes(self, tmp_path):
        import pickle

        from transformer4sed_tpu.utils.torch_import import read_pt_file

        p = str(tmp_path / "evil.pt")
        torch.save({"x": torch.randn(2)}, p)
        # splice an arbitrary-global pickle into the same container shape
        import zipfile

        with zipfile.ZipFile(p) as z:
            names = {n: z.read(n) for n in z.namelist()}
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        names[pkl_name] = pickle.dumps({"boom": __import__("os").getcwd})
        with zipfile.ZipFile(p, "w") as z:
            for n, data in names.items():
                z.writestr(n, data)
        with pytest.raises(Exception, match="refusing to unpickle"):
            read_pt_file(p)

    def test_load_state_dict_paths_agree(self, tmp_path):
        """load_torch_state_dict via torch and via the native reader give
        identical trees, including the 'state_dict' wrapper convention."""
        from transformer4sed_tpu.utils.torch_import import load_torch_state_dict

        torch.manual_seed(1)
        tmodel = TorchMiniPaSST().eval()
        sd = {k: torch.from_numpy(v) for k, v in tmodel.reference_state_dict().items()}
        p = str(tmp_path / "model.pt")
        torch.save({"state_dict": sd, "epoch": torch.tensor(3)}, p)
        a = load_torch_state_dict(p, use_torch=True)
        b = load_torch_state_dict(p, use_torch=False)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_native_reader_feeds_converter(self, tmp_path):
        """Full import chain without torch.load: .pt -> native reader ->
        convert_passt_backbone -> flax forward matches torch."""
        from transformer4sed_tpu.utils.torch_import import load_torch_state_dict

        torch.manual_seed(2)
        tmodel = TorchMiniPaSST().eval()
        x = torch.randn(1, 1, *IMG)
        with torch.no_grad():
            t_frame, _ = tmodel(x)
        sd = {k: torch.from_numpy(v) for k, v in tmodel.reference_state_dict().items()}
        p = str(tmp_path / "backbone.pt")
        torch.save(sd, p)
        params = convert_passt_backbone(load_torch_state_dict(p, use_torch=False), depth=DEPTH)
        fmodel = PaSST(
            embed_dim=D, depth=DEPTH, num_heads=HEADS, img_size=IMG, tap_layers=(1, 2)
        )
        out = fmodel.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out["frame"]), t_frame.numpy(), atol=2e-5)


class TestCheckpointFetch:
    """URL-fetch machinery for pretrained variants (reference
    vit_helpers.py:227-261) — driven via file:// URLs offline."""

    def test_fetch_and_cache(self, tmp_path, monkeypatch):
        from transformer4sed_tpu.models import passt as passt_mod

        src = tmp_path / "weights.pt"
        src.write_bytes(b"fake-checkpoint")
        monkeypatch.setitem(
            passt_mod.PASST_VARIANTS["passt_s_swa_p16_128_ap476"],
            "url", f"file://{src}",
        )
        cache = tmp_path / "cache"
        p1 = passt_mod.fetch_passt_checkpoint(
            "passt_s_swa_p16_128_ap476", cache_dir=str(cache)
        )
        assert open(p1, "rb").read() == b"fake-checkpoint"
        src.unlink()  # second fetch must hit the cache, not the URL
        p2 = passt_mod.fetch_passt_checkpoint(
            "passt_s_swa_p16_128_ap476", cache_dir=str(cache)
        )
        assert p2 == p1

    def test_unknown_variant_raises(self):
        from transformer4sed_tpu.models.passt import fetch_passt_checkpoint

        with pytest.raises(ValueError, match="unknown PaSST variant"):
            fetch_passt_checkpoint("nope")

    def test_load_pretrained_params_from_path(self, tmp_path):
        """checkpoint file -> load_pretrained_passt_params -> forward parity
        (the passt_sed.py:108-115 load path, end to end)."""
        from transformer4sed_tpu.models.passt import load_pretrained_passt_params

        torch.manual_seed(3)
        tmodel = TorchMiniPaSST().eval()
        x = torch.randn(1, 1, *IMG)
        with torch.no_grad():
            t_frame, _ = tmodel(x)
        sd = {k: torch.from_numpy(v) for k, v in tmodel.reference_state_dict().items()}
        p = str(tmp_path / "variant.pt")
        torch.save(sd, p)
        params = load_pretrained_passt_params(path=p, depth=DEPTH)
        fmodel = PaSST(
            embed_dim=D, depth=DEPTH, num_heads=HEADS, img_size=IMG, tap_layers=(1, 2)
        )
        out = fmodel.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out["frame"]), t_frame.numpy(), atol=2e-5)


class TestDASMConverter:
    def test_cross_attn_layer_numerical_parity(self):
        """convert a real torch CrossAttentionFirstDecoderLayer state dict
        (at_adapter.py:7-33 semantics: post-norm, cross-attn before
        self-attn) and check the flax layer reproduces the torch forward."""
        from transformer4sed_tpu.models.dasm import CrossAttentionFirstDecoderLayer
        from transformer4sed_tpu.utils.torch_import import _cross_attn_layer

        class TorchXLayer(tnn.TransformerDecoderLayer):
            def forward(self, tgt, memory):
                x = tgt
                x = self.norm1(x + self._mha_block(x, memory, None, None, False))
                x = self.norm2(x + self._sa_block(x, None, None, False))
                x = self.norm3(x + self._ff_block(x))
                return x

        torch.manual_seed(0)
        d, heads, ffn = 32, 4, 64
        tlayer = TorchXLayer(
            d_model=d, nhead=heads, dim_feedforward=ffn, activation="gelu",
            batch_first=True, dropout=0.0,
        ).eval()
        queries = torch.randn(2, 5, d)
        memory = torch.randn(2, 11, d)
        with torch.no_grad():
            t_out = tlayer(queries, memory)

        sd = {f"L.{k}": v.numpy() for k, v in tlayer.state_dict().items()}
        params = _cross_attn_layer(sd, "L", heads)
        flayer = CrossAttentionFirstDecoderLayer(num_heads=heads, dim_ffn=ffn)
        f_out = flayer.apply(
            {"params": params}, jnp.asarray(queries.numpy()), jnp.asarray(memory.numpy())
        )
        np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=2e-5)

    def test_full_dasm_tree_compatible(self):
        """convert_dasm maps every reference-named leaf onto the flax DASM
        init tree (shapes compared leaf-by-leaf; backbone covered by the
        PaSST parity tests above)."""
        import flax

        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.utils.torch_import import check_tree_compatible, convert_dasm

        dasm_kwargs = dict(
            class_num=4, decoder_dim=32, num_heads=4, decoder="transformerXL",
            decoder_layer_num=2, decoder_pos_emd_len=120, embed_dim=32,
            backbone_depth=2, backbone_num_heads=4, passt_feature_layer=2,
            at_decoder_layer=2, f_pool_heads=4, out_type="sigmoid", cnn_param=None,
            query_projector=True, query_dim=16,
        )
        model = tiny_dasm(**dasm_kwargs)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, 38400))))
        template = model.init(
            {"params": jax.random.PRNGKey(0)}, mel,
            query=jnp.zeros((4, 16)), query_type="text",
        )["params"]
        template = {k: v for k, v in template.items() if k != "backbone"}

        # build a torch-style state dict with the reference key naming
        torch.manual_seed(1)
        d, ffn, heads = 32, 32, 4
        sd = {}

        def put_dense(prefix, din, dout):
            sd[f"{prefix}.weight"] = torch.randn(dout, din).numpy()
            sd[f"{prefix}.bias"] = torch.randn(dout).numpy()

        def put_ln(prefix, dim=d):
            sd[f"{prefix}.weight"] = torch.ones(dim).numpy()
            sd[f"{prefix}.bias"] = torch.zeros(dim).numpy()

        def put_mha(prefix, dim=d):
            sd[f"{prefix}.in_proj_weight"] = torch.randn(3 * dim, dim).numpy()
            sd[f"{prefix}.in_proj_bias"] = torch.randn(3 * dim).numpy()
            put_dense(f"{prefix}.out_proj", dim, dim)

        sd["f_pool_module.f_att_token"] = torch.zeros(1, 1, d).numpy()
        put_mha("f_pool_module.frequency_att")
        put_ln("norm_before_pool")
        put_ln("norm_after_merge")
        put_dense("transformer_projector", d, d)
        put_dense("at_projector", d, d)
        put_dense("sed_head", d, d)
        for i in range(2):  # XL sed_decoder blocks
            p = f"sed_decoder.encoder_blocks.{i}"
            put_ln(f"{p}.norm1"); put_ln(f"{p}.norm2")
            put_dense(f"{p}.attn.in_proj", d, 3 * d)
            put_dense(f"{p}.attn.out_proj", d, d)
            sd[f"{p}.attn.linear_pos.weight"] = torch.randn(d, d).numpy()
            sd[f"{p}.attn.pos_bias_u"] = torch.randn(heads, d // heads).numpy()
            sd[f"{p}.attn.pos_bias_v"] = torch.randn(heads, d // heads).numpy()
            put_dense(f"{p}.mlp.fc1", d, ffn)
            put_dense(f"{p}.mlp.fc2", ffn, d)
        for i in range(3):  # mask_embedding MLP (3 layers)
            put_dense(f"mask_embedding_layer.layers.{i}", d, d)
        put_dense("at_head.layers.0", d, d)
        put_dense("at_head.layers.1", d, 1)
        put_dense("query_projector.0", 16, d)  # Sequential(Linear, GELU)
        for i in range(2):  # at_decoder cross-attn layers
            p = f"at_decoder.decoder.layers.{i}"
            put_mha(f"{p}.self_attn")
            put_mha(f"{p}.multihead_attn")
            put_ln(f"{p}.norm1"); put_ln(f"{p}.norm2"); put_ln(f"{p}.norm3")
            put_dense(f"{p}.linear1", d, d)
            put_dense(f"{p}.linear2", d, d)

        tree = convert_dasm(sd, num_heads=heads, f_pool_heads=heads)
        problems = check_tree_compatible(template, tree["params"])
        assert problems == {}, problems
        # and nothing extraneous was invented
        extra = set(flax.traverse_util.flatten_dict(tree["params"], sep="/")) - set(
            flax.traverse_util.flatten_dict(template, sep="/")
        )
        assert extra == set(), extra


class TestHTSATFamilyConverters:
    def _htsat_cnn_template(self):
        from transformer4sed_tpu.models.htsat import HTSATFrontend
        from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN

        model = HTSAT_CNN(
            class_num=3, decoder_dim=32, num_heads=4, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=512, htsat_config="tiny",
            cnn_param={"n_in_channel": 1, "nb_filters": [16, 16],
                       "kernel_size": [3, 3], "padding": [1, 1], "stride": [1, 1],
                       "pooling": [(1, 8), (1, 8)], "activation": "glu",
                       "normalization": "batch"},
        )
        fe = HTSATFrontend()
        mel = fe.normalize(fe(jnp.zeros((1, 38400))))
        return model.init({"params": jax.random.PRNGKey(0)}, mel)

    def test_htsat_cnn_head_tree_compatible(self):
        """convert_htsat_cnn maps the CNN branch (conv/batchnorm/GLU),
        projectors, XL decoder, and head onto the flax tree leaf-for-leaf
        (backbone covered by convert_htsat's own shape handling)."""
        import flax

        from transformer4sed_tpu.utils.torch_import import check_tree_compatible, convert_htsat_cnn

        variables = self._htsat_cnn_template()
        t_params = {k: v for k, v in variables["params"].items() if k != "backbone"}
        t_stats = {k: v for k, v in variables["batch_stats"].items() if k != "backbone"}

        torch.manual_seed(0)
        d = 32
        sd = {}

        def put_dense(prefix, din, dout):
            sd[f"{prefix}.weight"] = torch.randn(dout, din).numpy()
            sd[f"{prefix}.bias"] = torch.randn(dout).numpy()

        for i, (cin, cout) in enumerate([(1, 16), (16, 16)]):
            sd[f"cnn.cnn.conv{i}.weight"] = torch.randn(cout, cin, 3, 3).numpy()
            sd[f"cnn.cnn.conv{i}.bias"] = torch.randn(cout).numpy()
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[f"cnn.cnn.batchnorm{i}.{stat}"] = torch.rand(cout).numpy()
            put_dense(f"cnn.cnn.glu{i}.linear", cout, cout)
        put_dense("transformer_projector", 768, d)
        put_dense("cnn_projector", 16, d)
        sd["merge_weight"] = torch.tensor([0.5]).numpy()
        sd["norm_after_merge.weight"] = torch.ones(d).numpy()
        sd["norm_after_merge.bias"] = torch.zeros(d).numpy()
        p = "sed_decoder.encoder_blocks.0"
        for ln in ("norm1", "norm2"):
            sd[f"{p}.{ln}.weight"] = torch.ones(d).numpy()
            sd[f"{p}.{ln}.bias"] = torch.zeros(d).numpy()
        put_dense(f"{p}.attn.in_proj", d, 3 * d)
        put_dense(f"{p}.attn.out_proj", d, d)
        sd[f"{p}.attn.linear_pos.weight"] = torch.randn(d, d).numpy()
        sd[f"{p}.attn.pos_bias_u"] = torch.randn(4, d // 4).numpy()
        sd[f"{p}.attn.pos_bias_v"] = torch.randn(4, d // 4).numpy()
        put_dense(f"{p}.mlp.fc1", d, d)
        put_dense(f"{p}.mlp.fc2", d, d)
        put_dense("sed_head", d, 3)

        tree = convert_htsat_cnn(sd)
        assert check_tree_compatible(t_params, tree["params"]) == {}
        assert check_tree_compatible(t_stats, tree["batch_stats"]) == {}
        extra = set(flax.traverse_util.flatten_dict(tree["params"], sep="/")) - set(
            flax.traverse_util.flatten_dict(t_params, sep="/")
        )
        assert extra == set(), extra

    def test_clap_sed_tree_compatible(self):
        from transformer4sed_tpu.models.htsat import HTSATFrontend
        from transformer4sed_tpu.models.htsat_heads import CLAP_SED
        from transformer4sed_tpu.utils.torch_import import check_tree_compatible, convert_clap_sed

        model = CLAP_SED(htsat_config="tiny", embed_dim=768, query_dim=16, class_num=3)
        fe = HTSATFrontend()
        mel = fe.normalize(fe(jnp.zeros((1, 38400))))
        template = {
            k: v
            for k, v in model.init({"params": jax.random.PRNGKey(0)}, mel)["params"].items()
            if k != "backbone"
        }
        torch.manual_seed(1)
        sd = {"text_query": torch.randn(3, 16).numpy()}
        for proj, din in (("audio_projector", 768), ("text_projector", 16)):
            sd[f"{proj}.layers.0.weight"] = torch.randn(768, din).numpy()
            sd[f"{proj}.layers.0.bias"] = torch.randn(768).numpy()
            sd[f"{proj}.layers.1.weight"] = torch.randn(768, 768).numpy()
            sd[f"{proj}.layers.1.bias"] = torch.randn(768).numpy()
        tree = convert_clap_sed(sd)
        assert check_tree_compatible(template, tree["params"]) == {}


class TestServeFromTorchCheckpoint:
    def test_serve_passt_sed_pt(self, tmp_path):
        """serve.main --ckpt <reference-named .pt>: the torch checkpoint is
        converted by model family and served directly — the 'bring your
        reference checkpoints' path, end to end."""
        import json
        import os

        import yaml
        from scipy.io import wavfile

        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.recipes import serve
        from transformer4sed_tpu.utils.torch_import import (
            check_tree_compatible,
            convert_torch_checkpoint,
        )

        torch.manual_seed(0)
        d, heads, depth, C = 32, 4, 2, 2
        sd = {}

        def dense(prefix, din, dout, bias=True):
            sd[f"{prefix}.weight"] = torch.randn(dout, din).numpy() * 0.05
            if bias:
                sd[f"{prefix}.bias"] = torch.zeros(dout).numpy()

        def ln(prefix, dim=d):
            sd[f"{prefix}.weight"] = torch.ones(dim).numpy()
            sd[f"{prefix}.bias"] = torch.zeros(dim).numpy()

        def mha(prefix, dim=d):
            sd[f"{prefix}.in_proj_weight"] = (torch.randn(3 * dim, dim) * 0.05).numpy()
            sd[f"{prefix}.in_proj_bias"] = torch.zeros(3 * dim).numpy()
            dense(f"{prefix}.out_proj", dim, dim)

        # backbone (reference PaSST naming; pos grids for the default
        # (128, 998) img: freq 12, time 99 — cropped to the mel at apply)
        sd["backbone.patch_embed.proj.weight"] = (torch.randn(d, 1, 16, 16) * 0.05).numpy()
        sd["backbone.patch_embed.proj.bias"] = torch.zeros(d).numpy()
        sd["backbone.cls_token"] = (torch.randn(1, 1, d) * 0.02).numpy()
        sd["backbone.dist_token"] = (torch.randn(1, 1, d) * 0.02).numpy()
        sd["backbone.new_pos_embed"] = (torch.randn(1, 2, d) * 0.02).numpy()
        sd["backbone.freq_new_pos_embed"] = (torch.randn(1, d, 12, 1) * 0.02).numpy()
        sd["backbone.time_new_pos_embed"] = (torch.randn(1, d, 1, 99) * 0.02).numpy()
        ln("backbone.norm")
        for i in range(depth):
            p = f"backbone.blocks.{i}"
            ln(f"{p}.norm1"); ln(f"{p}.norm2")
            dense(f"{p}.attn.qkv", d, 3 * d)
            dense(f"{p}.attn.proj", d, d)
            dense(f"{p}.mlp.fc1", d, 4 * d)
            dense(f"{p}.mlp.fc2", 4 * d, d)
        # head: out_norm + XL decoder + classifier + AT adapter
        ln("out_norm")
        p = "decoder.encoder_blocks.0"
        ln(f"{p}.norm1"); ln(f"{p}.norm2")
        dense(f"{p}.attn.in_proj", d, 3 * d)
        dense(f"{p}.attn.out_proj", d, d)
        sd[f"{p}.attn.linear_pos.weight"] = (torch.randn(d, d) * 0.05).numpy()
        sd[f"{p}.attn.pos_bias_u"] = (torch.randn(heads, d // heads) * 0.02).numpy()
        sd[f"{p}.attn.pos_bias_v"] = (torch.randn(heads, d // heads) * 0.02).numpy()
        dense(f"{p}.mlp.fc1", d, d)
        dense(f"{p}.mlp.fc2", d, d)
        dense("classifier", d, C)
        sd["at_adpater.0.f_att_token"] = torch.zeros(1, 1, d).numpy()
        mha("at_adpater.0.frequency_att")
        dense("at_adpater.1", d, C)

        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=depth,
            backbone_num_heads=heads, decoder_num_heads=heads,
            at_adapter_heads=heads, passt_feature_layer=depth,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=120, at_adapter=True,
        )
        # the converted tree must cover the flax init leaf-for-leaf,
        # else serving would fail on a missing param
        model = PaSST_SED(**init_kwargs)
        fe = PasstFrontend()
        mel = fe.normalize(fe(jnp.zeros((1, 38400))))
        template = model.init({"params": jax.random.PRNGKey(0)}, mel)["params"]
        np_sd = {k: np.asarray(v) for k, v in sd.items()}
        params, state = convert_torch_checkpoint(np_sd, "PaSST_SED",
                                                 backbone_depth=depth,
                                                 decoder_layer_num=1,
                                                 at_adapter_heads=heads)
        assert check_tree_compatible(template, params) == {}
        assert state == {}

        ckpt = tmp_path / "reference_model.pt"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in np_sd.items()}, str(ckpt))

        sr, dur = 32000, 1.2
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        rng = np.random.RandomState(0)
        for i in range(2):
            wav = (rng.randn(int(dur * sr)) * 0.05 * 32767).astype(np.int16)
            wavfile.write(str(wav_dir / f"p{i}.wav"), sr, wav)
        config = {
            "model_name": "PaSST_SED",
            "PaSST_SED": {"init_kwargs": init_kwargs, "test_kwargs": {"temp_w": 0.5}},
            "feature": {"pred_len": 120, "sr": sr, "hopsize": 320, "n_fft": 1024,
                        "audio_max_len": dur, "net_subsample": 1},
            "dataset": {"labels": ["a", "b"]},
            "training": {"median_window": 3},
        }
        with open(tmp_path / "cfg.yaml", "w") as f:
            yaml.safe_dump(config, f)
        out_dir = tmp_path / "scores"
        serve.main([
            "--config_dir", str(tmp_path / "cfg.yaml"), "--ckpt", str(ckpt),
            "--wav_dir", str(wav_dir), "--out_dir", str(out_dir),
            "--batch_size", "2",
        ])
        lines = [json.loads(l) for l in open(out_dir / "events.jsonl")]
        assert {l["filename"] for l in lines} == {"p0.wav", "p1.wav"}


class TestXLDecoderTorchParity:
    """Full XL context-network parity: the reference's rel-pos attention
    math (transformerXL.py:129-540 — packed in_proj, pos_bias_u/v AC+BD
    matrices, as_strided rel_shift, sqrt(d) input scaling, the unusual
    post-norm1 residual wiring) reimplemented in torch here, vs the flax
    TransformerXLDecoder with the same weights via _xl_block."""

    def _torch_pos_emb(self, t, d):
        """Reference RelPositionalEncoding table slice (:40-127):
        positive offsets reversed then negative, center = offset 0."""
        import math

        pos = torch.arange(t, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * -(math.log(10000.0) / d))
        pe_pos = torch.zeros(t, d)
        pe_neg = torch.zeros(t, d)
        pe_pos[:, 0::2] = torch.sin(pos * div)
        pe_pos[:, 1::2] = torch.cos(pos * div)
        pe_neg[:, 0::2] = torch.sin(-pos * div)
        pe_neg[:, 1::2] = torch.cos(-pos * div)
        return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], dim=0).unsqueeze(0)

    def _torch_block(self, h, w, pos, heads):
        """One reference TransformerXL block (transformerXL.py:23-35)."""
        import torch.nn.functional as F

        b, t, d = h.shape
        hd = d // heads
        hn = F.layer_norm(h, (d,), w["norm1.weight"], w["norm1.bias"], eps=1e-5)
        q, k, v = (hn @ w["attn.in_proj.weight"].t() + w["attn.in_proj.bias"]).chunk(3, -1)
        q = q.view(b, t, heads, hd)
        k = k.view(b, t, heads, hd).permute(0, 2, 3, 1)           # [B,H,dk,T]
        v = v.view(b, t, heads, hd).transpose(1, 2)               # [B,H,T,dk]
        p = (pos @ w["attn.linear_pos.weight"].t()).view(1, 2 * t - 1, heads, hd)
        p = p.permute(0, 2, 3, 1)                                  # [1,H,dk,2T-1]
        qu = (q + w["attn.pos_bias_u"]).transpose(1, 2)            # [B,H,T,dk]
        qv = (q + w["attn.pos_bias_v"]).transpose(1, 2)
        ac = qu @ k                                                # [B,H,T,T]
        bd = qv @ p                                                # [B,H,T,2T-1]
        # rel_shift (:253-297): row i takes columns (T-1-i) .. (2T-2-i)
        rows = torch.arange(t - 1, -1, -1).unsqueeze(-1) + torch.arange(t)
        bd = torch.gather(bd, 3, rows.expand(b, heads, t, t))
        attn = ((ac + bd) * hd ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, d)
        out = out @ w["attn.out_proj.weight"].t() + w["attn.out_proj.bias"]
        h = hn + out                                               # post-norm1 residual
        hn2 = F.layer_norm(h, (d,), w["norm2.weight"], w["norm2.bias"], eps=1e-5)
        mlp = F.gelu(hn2 @ w["mlp.fc1.weight"].t() + w["mlp.fc1.bias"])
        mlp = mlp @ w["mlp.fc2.weight"].t() + w["mlp.fc2.bias"]
        return h + mlp

    def test_two_layer_decoder_matches(self):
        import math

        from transformer4sed_tpu.models.xl import TransformerXLDecoder
        from transformer4sed_tpu.utils.torch_import import _xl_block

        torch.manual_seed(0)
        b, t, d, heads, layers = 2, 50, 32, 4, 2
        weights = []
        sd = {}
        for i in range(layers):
            w = {
                "norm1.weight": torch.randn(d).abs() + 0.5,
                "norm1.bias": torch.randn(d) * 0.1,
                "attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
                "attn.in_proj.bias": torch.randn(3 * d) * 0.02,
                "attn.out_proj.weight": torch.randn(d, d) * 0.1,
                "attn.out_proj.bias": torch.randn(d) * 0.02,
                "attn.linear_pos.weight": torch.randn(d, d) * 0.1,
                "attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
                "attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
                "norm2.weight": torch.randn(d).abs() + 0.5,
                "norm2.bias": torch.randn(d) * 0.1,
                "mlp.fc1.weight": torch.randn(d, d) * 0.1,
                "mlp.fc1.bias": torch.randn(d) * 0.02,
                "mlp.fc2.weight": torch.randn(d, d) * 0.1,
                "mlp.fc2.bias": torch.randn(d) * 0.02,
            }
            weights.append(w)
            sd.update({f"dec.encoder_blocks.{i}.{k}": v.numpy() for k, v in w.items()})

        x = torch.randn(b, t, d)
        with torch.no_grad():
            pos = self._torch_pos_emb(t, d)
            h = x * math.sqrt(d)
            for w in weights:
                h = self._torch_block(h, w, pos[0:1, :, :].squeeze(0).unsqueeze(0), heads)
        t_out = h.numpy()

        params = {
            f"encoder_blocks_{i}": _xl_block(sd, f"dec.encoder_blocks.{i}")
            for i in range(layers)
        }
        dec = TransformerXLDecoder(
            decoder_layer_num=layers, num_heads=heads, mlp_ratio=1.0, seq_len=t
        )
        f_out = dec.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(f_out), t_out, atol=3e-5)


class TestConformerTorchParity:
    """Conformer decoder parity: reference ConformerEncoderLayer math
    (conformer.py:10-270 — macaron FFNs with 0.5 scale, rel-pos MHA,
    GLU pointwise + depthwise conv module with inner LayerNorm, Swish,
    final norm) reimplemented in torch vs the flax ConformerDecoder with
    shared weights via _conformer_block."""

    def _block(self, h, w, pos, heads):
        import torch.nn.functional as F

        b, t, d = h.shape
        hd = d // heads

        def ln(x, name, dim=d):
            return F.layer_norm(x, (dim,), w[f"{name}.weight"], w[f"{name}.bias"], eps=1e-5)

        def ff(x, name):
            x = x @ w[f"{name}.0.weight"].t() + w[f"{name}.0.bias"]
            x = x * torch.sigmoid(x)  # Swish
            return x @ w[f"{name}.3.weight"].t() + w[f"{name}.3.bias"]

        h = h + 0.5 * ff(ln(h, "norm_ff_macaron"), "feed_forward_macaron")
        # rel-pos MHA (same math as the XL test)
        hn = ln(h, "norm_mha")
        q, k, v = (hn @ w["self_attn.in_proj.weight"].t() + w["self_attn.in_proj.bias"]).chunk(3, -1)
        q = q.view(b, t, heads, hd)
        k = k.view(b, t, heads, hd).permute(0, 2, 3, 1)
        v = v.view(b, t, heads, hd).transpose(1, 2)
        p = (pos @ w["self_attn.linear_pos.weight"].t()).view(1, 2 * t - 1, heads, hd)
        p = p.permute(0, 2, 3, 1)
        qu = (q + w["self_attn.pos_bias_u"]).transpose(1, 2)
        qv = (q + w["self_attn.pos_bias_v"]).transpose(1, 2)
        rows = torch.arange(t - 1, -1, -1).unsqueeze(-1) + torch.arange(t)
        bd = torch.gather(qv @ p, 3, rows.expand(b, heads, t, t))
        attn = (((qu @ k) + bd) * hd ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, d)
        h = h + (out @ w["self_attn.out_proj.weight"].t() + w["self_attn.out_proj.bias"])
        # conv module: GLU pointwise -> depthwise -> LN -> Swish -> pointwise
        x = ln(h, "norm_conv").transpose(1, 2)  # [B, C, T]
        x = torch.nn.functional.conv1d(x, w["conv_module.pointwise_conv1.weight"],
                                       w["conv_module.pointwise_conv1.bias"])
        x = torch.nn.functional.glu(x, dim=1)
        x = torch.nn.functional.conv1d(x, w["conv_module.depthwise_conv.weight"],
                                       w["conv_module.depthwise_conv.bias"],
                                       padding=(w["conv_module.depthwise_conv.weight"].shape[-1] - 1) // 2,
                                       groups=d)
        x = x.transpose(1, 2)
        x = F.layer_norm(x, (d,), w["conv_module.norm.weight"], w["conv_module.norm.bias"], eps=1e-5)
        x = x * torch.sigmoid(x)
        x = torch.nn.functional.conv1d(x.transpose(1, 2), w["conv_module.pointwise_conv2.weight"],
                                       w["conv_module.pointwise_conv2.bias"]).transpose(1, 2)
        h = h + x
        h = h + 0.5 * ff(ln(h, "norm_ff"), "feed_forward")
        return ln(h, "norm_final")

    def test_conformer_decoder_matches(self):
        import math

        from transformer4sed_tpu.models.xl import ConformerDecoder
        from transformer4sed_tpu.utils.torch_import import _conformer_block

        torch.manual_seed(0)
        b, t, d, heads, K = 2, 40, 32, 4, 7
        w = {
            "norm_ff_macaron.weight": torch.randn(d).abs() + 0.5,
            "norm_ff_macaron.bias": torch.randn(d) * 0.1,
            "feed_forward_macaron.0.weight": torch.randn(d, d) * 0.1,
            "feed_forward_macaron.0.bias": torch.randn(d) * 0.02,
            "feed_forward_macaron.3.weight": torch.randn(d, d) * 0.1,
            "feed_forward_macaron.3.bias": torch.randn(d) * 0.02,
            "norm_mha.weight": torch.randn(d).abs() + 0.5,
            "norm_mha.bias": torch.randn(d) * 0.1,
            "self_attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
            "self_attn.in_proj.bias": torch.randn(3 * d) * 0.02,
            "self_attn.out_proj.weight": torch.randn(d, d) * 0.1,
            "self_attn.out_proj.bias": torch.randn(d) * 0.02,
            "self_attn.linear_pos.weight": torch.randn(d, d) * 0.1,
            "self_attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
            "self_attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
            "norm_conv.weight": torch.randn(d).abs() + 0.5,
            "norm_conv.bias": torch.randn(d) * 0.1,
            "conv_module.pointwise_conv1.weight": torch.randn(2 * d, d, 1) * 0.1,
            "conv_module.pointwise_conv1.bias": torch.randn(2 * d) * 0.02,
            "conv_module.depthwise_conv.weight": torch.randn(d, 1, K) * 0.1,
            "conv_module.depthwise_conv.bias": torch.randn(d) * 0.02,
            "conv_module.norm.weight": torch.randn(d).abs() + 0.5,
            "conv_module.norm.bias": torch.randn(d) * 0.1,
            "conv_module.pointwise_conv2.weight": torch.randn(d, d, 1) * 0.1,
            "conv_module.pointwise_conv2.bias": torch.randn(d) * 0.02,
            "norm_ff.weight": torch.randn(d).abs() + 0.5,
            "norm_ff.bias": torch.randn(d) * 0.1,
            "feed_forward.0.weight": torch.randn(d, d) * 0.1,
            "feed_forward.0.bias": torch.randn(d) * 0.02,
            "feed_forward.3.weight": torch.randn(d, d) * 0.1,
            "feed_forward.3.bias": torch.randn(d) * 0.02,
            "norm_final.weight": torch.randn(d).abs() + 0.5,
            "norm_final.bias": torch.randn(d) * 0.1,
        }
        x = torch.randn(b, t, d)
        pos = TestXLDecoderTorchParity()._torch_pos_emb(t, d)
        with torch.no_grad():
            t_out = self._block(x * math.sqrt(d), w, pos, heads).numpy()

        sd = {f"dec.blocks.0.{k}": v.numpy() for k, v in w.items()}
        params = {"blocks_0": _conformer_block(sd, "dec.blocks.0")}
        dec = ConformerDecoder(
            decoder_layer_num=1, num_heads=heads, mlp_ratio=1.0, kernel_size=K, seq_len=t
        )
        f_out = dec.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(f_out), t_out, atol=3e-5)


class TestCNNTorchParity:
    def test_glu_batchnorm_stack_matches(self):
        """convert_cnn + flax CNN reproduce the reference conv pyramid
        (base.py:33-113): Conv2d -> BatchNorm(eval running stats,
        eps=1e-3) -> GLU(linear over channels-last) -> AvgPool."""
        from transformer4sed_tpu.models.cnn import CNN
        from transformer4sed_tpu.utils.torch_import import convert_cnn

        torch.manual_seed(0)
        filters = [8, 12]

        layers = []
        sd = {}
        cin = 1
        for i, cout in enumerate(filters):
            conv = tnn.Conv2d(cin, cout, 3, 1, 1)
            bn = tnn.BatchNorm2d(cout, eps=0.001, momentum=0.99).eval()
            bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
            bn.weight.data.normal_(); bn.bias.data.normal_()
            glu = tnn.Linear(cout, cout)
            layers.append((conv, bn, glu))
            sd[f"cnn.conv{i}.weight"] = conv.weight.detach().numpy()
            sd[f"cnn.conv{i}.bias"] = conv.bias.detach().numpy()
            sd[f"cnn.batchnorm{i}.weight"] = bn.weight.detach().numpy()
            sd[f"cnn.batchnorm{i}.bias"] = bn.bias.detach().numpy()
            sd[f"cnn.batchnorm{i}.running_mean"] = bn.running_mean.numpy()
            sd[f"cnn.batchnorm{i}.running_var"] = bn.running_var.numpy()
            sd[f"cnn.glu{i}.linear.weight"] = glu.weight.detach().numpy()
            sd[f"cnn.glu{i}.linear.bias"] = glu.bias.detach().numpy()
            cin = cout

        x = torch.randn(2, 1, 16, 16)
        with torch.no_grad():
            h = x
            for conv, bn, glu in layers:
                h = bn(conv(h))
                lin = glu(h.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                h = lin * torch.sigmoid(h)
                h = tnn.functional.avg_pool2d(h, (1, 2))
        t_out = h.numpy()  # [B, C, T, F]

        params, stats = convert_cnn(sd)
        model = CNN(n_in_channel=1, nb_filters=filters, kernel_size=[3, 3],
                    padding=[1, 1], stride=[1, 1], pooling=[(1, 2), (1, 2)],
                    activation="glu", normalization="batch")
        f_out = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x.numpy()), train=False
        )
        np.testing.assert_allclose(np.asarray(f_out), t_out, atol=3e-5)


class TestSwinWindowAttentionParity:
    def test_matches_torch_math(self):
        """HTSAT Swin WindowAttention (htsat.py:277-352): qkv, q-scaled
        scores, relative-position bias gathered via the pairwise index
        table, optional additive window mask, proj — torch math vs the
        flax module with converted weights."""
        from transformer4sed_tpu.models.htsat import WindowAttention

        torch.manual_seed(0)
        d, heads, w = 32, 4, 4
        n = w * w
        nw, b = 3, 2  # windows per image, batch
        qkv_w = torch.randn(3 * d, d) * 0.1
        qkv_b = torch.randn(3 * d) * 0.02
        proj_w = torch.randn(d, d) * 0.1
        proj_b = torch.randn(d) * 0.02
        bias_table = torch.randn((2 * w - 1) * (2 * w - 1), heads) * 0.1

        coords = torch.stack(torch.meshgrid(
            [torch.arange(w), torch.arange(w)], indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += w - 1
        rel[:, :, 1] += w - 1
        rel[:, :, 0] *= 2 * w - 1
        index = rel.sum(-1)

        x = torch.randn(b * nw, n, d)
        mask = torch.where(torch.rand(nw, n, n) > 0.8,
                           torch.tensor(-100.0), torch.tensor(0.0))

        def torch_forward(x, mask):
            B_, N, C = x.shape
            hd = C // heads
            qkv = (x @ qkv_w.t() + qkv_b).reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(-2, -1)
            bias = bias_table[index.view(-1)].view(N, N, heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, heads, N, N)
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
            return out @ proj_w.t() + proj_b

        params = {
            "qkv": {"kernel": qkv_w.t().numpy(), "bias": qkv_b.numpy()},
            "proj": {"kernel": proj_w.t().numpy(), "bias": proj_b.numpy()},
            "relative_position_bias_table": bias_table.numpy(),
        }
        fmod = WindowAttention(num_heads=heads, window_size=w)
        with torch.no_grad():
            for m in (None, mask):
                t_out = torch_forward(x, m).numpy()
                f_out = fmod.apply(
                    {"params": params}, jnp.asarray(x.numpy()),
                    None if m is None else jnp.asarray(m.numpy()),
                )
                np.testing.assert_allclose(np.asarray(f_out), t_out, atol=3e-5)


class TestFDYCNNTorchParity:
    def test_dynamic_conv_stack_matches(self):
        """FDY-CNN parity (FDY_cnn.py:7-180): per-frame softmax attention
        over 4 basis kernels (mean-over-freq -> conv1d -> BN -> relu ->
        conv1d -> softmax/T), basis convs aggregated as one grouped-channel
        conv, then BatchNorm + GLU + AvgPool — torch math vs the flax
        FDY_CNN with convert_cnn-imported weights."""
        import torch.nn.functional as F

        from transformer4sed_tpu.models.cnn import FDY_CNN
        from transformer4sed_tpu.utils.torch_import import convert_cnn

        torch.manual_seed(0)
        cin, cout, nk, k, temp = 1, 8, 4, 3, 31.0
        hidden = 4  # max(cin // 4, 4)
        sd = {}
        # dynamic stage 0
        wb = torch.randn(nk, cout, cin, k, k) * 0.2
        att_c1 = torch.randn(hidden, cin, k) * 0.2
        bn_w, bn_b = torch.rand(hidden) + 0.5, torch.randn(hidden) * 0.1
        bn_m, bn_v = torch.randn(hidden) * 0.1, torch.rand(hidden) + 0.5
        att_c2_w = torch.randn(nk, hidden, 1) * 0.2
        att_c2_b = torch.randn(nk) * 0.1
        sd["cnn.conv0.weight"] = wb.numpy()
        sd["cnn.conv0.attention.conv1d1.weight"] = att_c1.numpy()
        sd["cnn.conv0.attention.bn.weight"] = bn_w.numpy()
        sd["cnn.conv0.attention.bn.bias"] = bn_b.numpy()
        sd["cnn.conv0.attention.bn.running_mean"] = bn_m.numpy()
        sd["cnn.conv0.attention.bn.running_var"] = bn_v.numpy()
        sd["cnn.conv0.attention.conv1d2.weight"] = att_c2_w.numpy()
        sd["cnn.conv0.attention.conv1d2.bias"] = att_c2_b.numpy()
        st_w, st_b = torch.rand(cout) + 0.5, torch.randn(cout) * 0.1
        st_m, st_v = torch.randn(cout) * 0.1, torch.rand(cout) + 0.5
        sd["cnn.batchnorm0.weight"] = st_w.numpy()
        sd["cnn.batchnorm0.bias"] = st_b.numpy()
        sd["cnn.batchnorm0.running_mean"] = st_m.numpy()
        sd["cnn.batchnorm0.running_var"] = st_v.numpy()
        glu_w = torch.randn(cout, cout) * 0.2
        glu_b = torch.randn(cout) * 0.1
        sd["cnn.glu0.linear.weight"] = glu_w.numpy()
        sd["cnn.glu0.linear.bias"] = glu_b.numpy()

        x = torch.randn(2, cin, 12, 8)
        with torch.no_grad():
            # attention: mean over freq -> conv1d -> BN(eval) -> relu -> conv1d -> softmax/T
            a = x.mean(dim=3)
            a = F.conv1d(a, att_c1, None, 1, 1)
            a = (a - bn_m[None, :, None]) / torch.sqrt(bn_v[None, :, None] + 1e-5)
            a = a * bn_w[None, :, None] + bn_b[None, :, None]
            a = F.relu(a)
            a = F.conv1d(a, att_c2_w, att_c2_b)
            att = F.softmax(a / temp, dim=1)  # [B, nk, T]
            y = F.conv1d(x.flatten(0, 0), wb.view(nk * cout, cin, k, k)[..., :, :], None) \
                if False else F.conv2d(x, wb.view(nk * cout, cin, k, k), None, 1, 1)
            y = y.view(2, nk, cout, 12, 8)
            y = (y * att[:, :, None, :, None]).sum(1)  # [B, cout, T, F]
            # stage BN (eps=1e-3) + GLU + AvgPool(1,2)
            y = (y - st_m[None, :, None, None]) / torch.sqrt(st_v[None, :, None, None] + 1e-3)
            y = y * st_w[None, :, None, None] + st_b[None, :, None, None]
            lin = (y.permute(0, 2, 3, 1) @ glu_w.t() + glu_b).permute(0, 3, 1, 2)
            y = lin * torch.sigmoid(y)
            t_out = F.avg_pool2d(y, (1, 2)).numpy()

        params, stats = convert_cnn(sd)
        model = FDY_CNN(n_input_ch=cin, nb_filters=[cout], kernel=[k], pad=[1],
                        stride=[1], pooling=[(1, 2)], activation="glu",
                        normalization="batch", n_basis_kernels=nk,
                        DY_layers=[1], temperature=temp)
        f_out = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x.numpy()), train=False
        )
        np.testing.assert_allclose(np.asarray(f_out), t_out, atol=3e-5)


class TestHTSATFullStackParity:
    """Full HTSAT backbone parity on a mini config: the reference Swin
    forward (htsat.py:621-945 — bn0, freq-ratio folding, patch embed +
    LN, shifted-window blocks with the 9-region -100 additive mask,
    PatchMerging, final LN, freq-bin grouping, tscam conv head, nearest
    framewise upsample) reimplemented in torch here, weights shared via
    convert_htsat. Catches folding/shift/merge wiring errors that the
    per-module tests cannot."""

    CFG = dict(spec_size=64, patch_size=4, patch_stride=(4, 4), num_classes=3,
               embed_dim=8, depths=(2, 1), num_heads=(2, 2), window_size=4,
               mlp_ratio=4.0, mel_bins=16)

    def _weights(self):
        torch.manual_seed(0)
        cfg = self.CFG
        E = cfg["embed_dim"]
        sd = {}

        def dense(p, din, dout, bias=True):
            sd[f"{p}.weight"] = torch.randn(dout, din) * (1.0 / np.sqrt(din))
            if bias:
                sd[f"{p}.bias"] = torch.randn(dout) * 0.02

        def ln(p, dim):
            sd[f"{p}.weight"] = torch.rand(dim) + 0.5
            sd[f"{p}.bias"] = torch.randn(dim) * 0.05

        sd["bn0.weight"] = torch.rand(cfg["mel_bins"]) + 0.5
        sd["bn0.bias"] = torch.randn(cfg["mel_bins"]) * 0.1
        sd["bn0.running_mean"] = torch.randn(cfg["mel_bins"]) * 0.2
        sd["bn0.running_var"] = torch.rand(cfg["mel_bins"]) + 0.5
        sd["patch_embed.proj.weight"] = torch.randn(E, 1, 4, 4) * 0.2
        sd["patch_embed.proj.bias"] = torch.randn(E) * 0.02
        ln("patch_embed.norm", E)
        w = cfg["window_size"]
        for i, depth in enumerate(cfg["depths"]):
            dim = E * 2 ** i
            heads = cfg["num_heads"][i]
            for j in range(depth):
                p = f"layers.{i}.blocks.{j}"
                ln(f"{p}.norm1", dim)
                dense(f"{p}.attn.qkv", dim, 3 * dim)
                dense(f"{p}.attn.proj", dim, dim)
                sd[f"{p}.attn.relative_position_bias_table"] = (
                    torch.randn((2 * w - 1) * (2 * w - 1), heads) * 0.1
                )
                ln(f"{p}.norm2", dim)
                dense(f"{p}.mlp.fc1", dim, int(dim * cfg["mlp_ratio"]))
                dense(f"{p}.mlp.fc2", int(dim * cfg["mlp_ratio"]), dim)
            if i < len(cfg["depths"]) - 1:
                ln(f"layers.{i}.downsample.norm", 4 * dim)
                dense(f"layers.{i}.downsample.reduction", 4 * dim, 2 * dim, bias=False)
        nf = E * 2 ** (len(cfg["depths"]) - 1)
        ln("norm", nf)
        # tscam: kernel (c_freq_bin=SF/freq_ratio, 3)
        freq_ratio = cfg["spec_size"] // cfg["mel_bins"]
        sf = cfg["spec_size"] // (2 ** (len(cfg["depths"]) - 1)) // cfg["patch_stride"][0]
        cfb = sf // freq_ratio
        sd["tscam_conv.weight"] = torch.randn(cfg["num_classes"], nf, cfb, 3) * 0.1
        sd["tscam_conv.bias"] = torch.randn(cfg["num_classes"]) * 0.02
        return sd

    def _torch_forward(self, mel, sd):
        import torch.nn.functional as F

        cfg = self.CFG
        E, w = cfg["embed_dim"], cfg["window_size"]
        ratio = cfg["spec_size"] // cfg["mel_bins"]

        def ln(x, p):
            return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"], eps=1e-5)

        # bn0 over mel bins (wav2mel transpose convention)
        x = mel.transpose(1, 3)
        m, v_ = sd["bn0.running_mean"], sd["bn0.running_var"]
        x = (x - m[None, :, None, None]) / torch.sqrt(v_[None, :, None, None] + 1e-5)
        x = x * sd["bn0.weight"][None, :, None, None] + sd["bn0.bias"][None, :, None, None]
        x = x.transpose(1, 3)
        # reshape_wav2img (:846-863), exact-size path
        B, C, T, Fq = x.shape
        x = x.permute(0, 1, 3, 2).contiguous()
        x = x.reshape(B, C, Fq, ratio, T // ratio)
        x = x.permute(0, 1, 3, 2, 4).contiguous().reshape(B, C, ratio * Fq, T // ratio)
        frames_num = x.shape[2]
        # patch embed
        h = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=4)
        B, _, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        h = ln(h, "patch_embed.norm")
        res = (gh, gw)

        def window_attn(xw, p, heads):
            B_, N, Cd = xw.shape
            hd = Cd // heads
            qkv = (xw @ sd[f"{p}.qkv.weight"].t() + sd[f"{p}.qkv.bias"]).reshape(
                B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(-2, -1)
            coords = torch.stack(torch.meshgrid(
                [torch.arange(w), torch.arange(w)], indexing="ij"))
            flat = torch.flatten(coords, 1)
            rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
            rel[:, :, 0] += w - 1; rel[:, :, 1] += w - 1; rel[:, :, 0] *= 2 * w - 1
            idx = rel.sum(-1)
            bias = sd[f"{p}.relative_position_bias_table"][idx.view(-1)].view(
                N, N, heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            return attn, v

        def swin_block(x, res, heads, shift, p):
            H, Wd = res
            B, L, Cd = x.shape
            hd = Cd // heads
            h = ln(x, f"{p}.norm1").view(B, H, Wd, Cd)
            if shift:
                h = torch.roll(h, (-shift, -shift), (1, 2))
            windows = h.view(B, H // w, w, Wd // w, w, Cd).permute(
                0, 1, 3, 2, 4, 5).reshape(-1, w * w, Cd)
            attn, v = window_attn(windows, f"{p}.attn", heads)
            if shift:
                img = torch.zeros(1, H, Wd, 1)
                cnt = 0
                for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                    for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                        img[:, hs, ws, :] = cnt
                        cnt += 1
                mw = img.view(1, H // w, w, Wd // w, w, 1).permute(
                    0, 1, 3, 2, 4, 5).reshape(-1, w * w)
                am = mw.unsqueeze(1) - mw.unsqueeze(2)
                am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
                nW = am.shape[0]
                attn = attn.view(-1, nW, heads, w * w, w * w) + am.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, heads, w * w, w * w)
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(-1, w * w, Cd)
            out = out @ sd[f"{p}.attn.proj.weight"].t() + sd[f"{p}.attn.proj.bias"]
            h = out.view(B, H // w, Wd // w, w, w, Cd).permute(
                0, 1, 3, 2, 4, 5).reshape(B, H, Wd, Cd)
            if shift:
                h = torch.roll(h, (shift, shift), (1, 2))
            x = x + h.reshape(B, L, Cd)
            h2 = ln(x, f"{p}.norm2")
            h2 = F.gelu(h2 @ sd[f"{p}.mlp.fc1.weight"].t() + sd[f"{p}.mlp.fc1.bias"])
            h2 = h2 @ sd[f"{p}.mlp.fc2.weight"].t() + sd[f"{p}.mlp.fc2.bias"]
            return x + h2

        for i, depth in enumerate(cfg["depths"]):
            heads = cfg["num_heads"][i]
            for j in range(depth):
                shift = 0 if j % 2 == 0 else w // 2
                h = swin_block(h, res, heads, shift, f"layers.{i}.blocks.{j}")
            if i < len(cfg["depths"]) - 1:
                H, Wd = res
                Cd = h.shape[-1]
                hm = h.view(B, H, Wd, Cd)
                hm = torch.cat([hm[:, 0::2, 0::2], hm[:, 1::2, 0::2],
                                hm[:, 0::2, 1::2], hm[:, 1::2, 1::2]], -1)
                hm = hm.view(B, -1, 4 * Cd)
                hm = ln(hm, f"layers.{i}.downsample.norm")
                h = hm @ sd[f"layers.{i}.downsample.reduction.weight"].t()
                res = (H // 2, Wd // 2)

        h = ln(h, "norm")
        B, N, Cd = h.shape
        SF = frames_num // (2 ** (len(cfg["depths"]) - 1)) // cfg["patch_stride"][0]
        ST = frames_num // (2 ** (len(cfg["depths"]) - 1)) // cfg["patch_stride"][1]
        g = h.permute(0, 2, 1).contiguous().reshape(B, Cd, SF, ST)
        cfb = SF // ratio
        g = g.reshape(B, Cd, SF // cfb, cfb, ST)
        g = g.permute(0, 1, 3, 2, 4).contiguous().reshape(B, Cd, cfb, -1)
        fine = torch.mean(g, dim=2).transpose(1, 2)
        emb = torch.flatten(g, 2).mean(-1)
        logits = F.conv2d(g, sd["tscam_conv.weight"], sd["tscam_conv.bias"],
                          padding=(0, 1))
        logits = torch.flatten(logits, 2)  # [B, classes, T]
        frame = torch.sigmoid(logits).permute(0, 2, 1).repeat_interleave(
            8 * cfg["patch_stride"][1], dim=1)
        clip = torch.sigmoid(logits.mean(-1))
        return frame, clip, fine, emb

    def test_full_stack_matches(self):
        from transformer4sed_tpu.models.htsat import HTSAT
        from transformer4sed_tpu.utils.torch_import import convert_htsat

        sd = self._weights()
        mel = torch.randn(2, 1, 256, 16)
        with torch.no_grad():
            t_frame, t_clip, t_fine, t_emb = self._torch_forward(mel, sd)

        tree = convert_htsat({k: v.numpy() for k, v in sd.items()},
                             depths=self.CFG["depths"])
        model = HTSAT(**self.CFG)
        out = model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            jnp.asarray(mel.numpy()), train=False,
        )
        np.testing.assert_allclose(np.asarray(out["fine_grained_embedding"]),
                                   t_fine.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["embedding"]),
                                   t_emb.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                                   t_clip.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["framewise_output"]),
                                   t_frame.numpy(), atol=5e-5)


class TestPaSSTSEDFullModelParity:
    """Full MAT-SED assembly parity (passt_sed.py:240-298): backbone tap
    -> drop cls/dist tokens -> out_norm -> (B, f, t, C) freq mean-pool ->
    last-frame pad -> x10 linear interpolate -> XL decoder -> classifier
    -> sigmoid(/temp) strong + linear-softmax weak (clamped 1e-7), plus
    the AT branch (attention pooling over the backbone frame tokens).
    Everything reimplemented with torch ops; weights shared through
    convert_torch_checkpoint."""

    def test_forward_matches(self):
        import torch.nn.functional as F

        from transformer4sed_tpu.frontend import PasstFrontend  # noqa: F401
        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(0)
        d, heads, C = D, HEADS, 3
        temp_w = 0.5
        tmodel = TorchMiniPaSST().eval()

        xl = {
            "norm1.weight": torch.rand(d) + 0.5,
            "norm1.bias": torch.randn(d) * 0.05,
            "attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
            "attn.in_proj.bias": torch.randn(3 * d) * 0.02,
            "attn.out_proj.weight": torch.randn(d, d) * 0.1,
            "attn.out_proj.bias": torch.randn(d) * 0.02,
            "attn.linear_pos.weight": torch.randn(d, d) * 0.1,
            "attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
            "attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
            "norm2.weight": torch.rand(d) + 0.5,
            "norm2.bias": torch.randn(d) * 0.05,
            "mlp.fc1.weight": torch.randn(d, d) * 0.1,
            "mlp.fc1.bias": torch.randn(d) * 0.02,
            "mlp.fc2.weight": torch.randn(d, d) * 0.1,
            "mlp.fc2.bias": torch.randn(d) * 0.02,
        }
        out_norm_w, out_norm_b = torch.rand(d) + 0.5, torch.randn(d) * 0.05
        cls_w, cls_b = torch.randn(C, d) * 0.1, torch.randn(C) * 0.02
        at_pool = tnn.MultiheadAttention(d, heads, batch_first=True).eval()
        at_token = torch.randn(1, 1, d) * 0.02
        at_w, at_b = torch.randn(C, d) * 0.1, torch.randn(C) * 0.02

        mel = torch.randn(2, *IMG) * 0.5  # [B, F=32, T=200]
        with torch.no_grad():
            frame, taps = tmodel(mel.unsqueeze(1))
            tap = taps[DEPTH]  # layer{DEPTH}_out, [B, P+2, C]
            h = tap[:, 2:, :]
            h = F.layer_norm(h, (d,), out_norm_w, out_norm_b, eps=1e-5)
            f_dim, t_dim = 2, 19
            h = h.reshape(2, f_dim, t_dim, d).mean(dim=1)  # [B, t, C]
            h = torch.cat((h, h[:, -1, :].unsqueeze(1)), dim=1)  # pad to 20
            h = F.interpolate(h.transpose(1, 2), scale_factor=10, mode="linear").transpose(1, 2)
            pos = TestXLDecoderTorchParity()._torch_pos_emb(h.shape[1], d)
            h = TestXLDecoderTorchParity()._torch_block(
                h * np.sqrt(d), xl, pos, heads
            )
            logits = h @ cls_w.t() + cls_b
            sed = torch.sigmoid(logits / temp_w)  # [B, T, C]
            weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)
            at_emb = frame[:, 2:, :]
            pooled, _ = at_pool(at_token.repeat(2, 1, 1), at_emb, at_emb)
            at_out = torch.sigmoid(pooled.squeeze(1) @ at_w.t() + at_b)

        sd = {f"backbone.{k}": v for k, v in tmodel.reference_state_dict().items()}
        sd.update({f"decoder.encoder_blocks.0.{k}": v.numpy() for k, v in xl.items()})
        sd["out_norm.weight"] = out_norm_w.numpy()
        sd["out_norm.bias"] = out_norm_b.numpy()
        sd["classifier.weight"] = cls_w.numpy()
        sd["classifier.bias"] = cls_b.numpy()
        sd["at_adpater.0.f_att_token"] = at_token.numpy()
        for k, v in at_pool.state_dict().items():
            sd[f"at_adpater.0.frequency_att.{k}"] = v.numpy()
        sd["at_adpater.1.weight"] = at_w.numpy()
        sd["at_adpater.1.bias"] = at_b.numpy()

        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=DEPTH,
            backbone_num_heads=heads, decoder_num_heads=heads,
            at_adapter_heads=heads, passt_feature_layer=DEPTH,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=200, at_adapter=True,
            backbone_img_size=IMG,
        )
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        model = PaSST_SED(**init_kwargs)
        out = model.apply({"params": params}, jnp.asarray(mel.numpy()), temp_w=temp_w)

        np.testing.assert_allclose(np.asarray(out.strong), sed.transpose(1, 2).numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.weak), weak.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.at_out), at_out.numpy(), atol=5e-5)


class TestDASMFullModelParity:
    """Full DASM assembly parity (detect_any_sound.py:266-389): attention
    f_pool, pad + x10 interp, projector + norm, at_projector over frame
    tokens, query projection (Linear+GELU), cross-attention-first AT
    decoder, at_head sigmoid, XL sed branch, sed_head, mask-embedding
    MLP einsum, sigmoid(/temp)*at_out with double clamped linear-softmax
    weak pool — torch ops vs the flax DASM via convert_torch_checkpoint."""

    def test_forward_matches(self):
        import torch.nn.functional as F

        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(1)
        d, heads, Q, qdim, temp_w = D, HEADS, 4, 16, 0.5
        tmodel = TorchMiniPaSST().eval()

        f_pool_att = tnn.MultiheadAttention(d, heads, batch_first=True).eval()
        f_token = torch.randn(1, 1, d) * 0.02

        class TorchXLayer(tnn.TransformerDecoderLayer):
            def forward(self, tgt, memory):
                x = tgt
                x = self.norm1(x + self._mha_block(x, memory, None, None, False))
                x = self.norm2(x + self._sa_block(x, None, None, False))
                x = self.norm3(x + self._ff_block(x))
                return x

        at_layer = TorchXLayer(d_model=d, nhead=heads, dim_feedforward=d,
                               activation="gelu", batch_first=True, dropout=0.0).eval()
        tproj = tnn.Linear(d, d)
        atproj = tnn.Linear(d, d)
        qproj = tnn.Linear(qdim, d)
        nbp_w, nbp_b = torch.rand(d) + 0.5, torch.randn(d) * 0.05
        nam_w, nam_b = torch.rand(d) + 0.5, torch.randn(d) * 0.05
        sed_head = tnn.Linear(d, d)
        me = [tnn.Linear(d, d) for _ in range(3)]
        ah = [tnn.Linear(d, d), tnn.Linear(d, 1)]
        xl = {
            "norm1.weight": torch.rand(d) + 0.5, "norm1.bias": torch.randn(d) * 0.05,
            "attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
            "attn.in_proj.bias": torch.randn(3 * d) * 0.02,
            "attn.out_proj.weight": torch.randn(d, d) * 0.1,
            "attn.out_proj.bias": torch.randn(d) * 0.02,
            "attn.linear_pos.weight": torch.randn(d, d) * 0.1,
            "attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
            "attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
            "norm2.weight": torch.rand(d) + 0.5, "norm2.bias": torch.randn(d) * 0.05,
            "mlp.fc1.weight": torch.randn(d, d) * 0.1,
            "mlp.fc1.bias": torch.randn(d) * 0.02,
            "mlp.fc2.weight": torch.randn(d, d) * 0.1,
            "mlp.fc2.bias": torch.randn(d) * 0.02,
        }
        query = torch.randn(Q, qdim)
        mel = torch.randn(2, *IMG) * 0.5

        with torch.no_grad():
            frame, taps = tmodel(mel.unsqueeze(1))
            tap = taps[DEPTH][:, 2:, :]
            h = F.layer_norm(tap, (d,), nbp_w, nbp_b, eps=1e-5)
            f_dim, t_dim = 2, 19
            B = 2
            h = h.reshape(B, f_dim, t_dim, d).transpose(1, 2).reshape(B * t_dim, f_dim, d)
            pooled, _ = f_pool_att(f_token.repeat(B * t_dim, 1, 1), h, h)
            x = pooled.squeeze(1).reshape(B, t_dim, d)
            x = torch.cat((x, x[:, -1, :].unsqueeze(1)), dim=1)
            x = F.interpolate(x.transpose(1, 2), scale_factor=10, mode="linear").transpose(1, 2)
            x = tproj(x)
            x = F.layer_norm(x, (d,), nam_w, nam_b, eps=1e-5)
            at_feat = atproj(frame[:, 2:, :])
            q = F.gelu(qproj(query))
            mask_feat = at_layer(q.expand(B, -1, -1), at_feat)
            at_out = torch.sigmoid(ah[1](F.gelu(ah[0](mask_feat))).squeeze(-1))
            pos = TestXLDecoderTorchParity()._torch_pos_emb(x.shape[1], d)
            x = TestXLDecoderTorchParity()._torch_block(x * np.sqrt(d), xl, pos, heads)
            x = sed_head(x)
            memb = me[2](F.gelu(me[1](F.gelu(me[0](mask_feat)))))
            logits = torch.einsum("bqc,bct->bqt", memb, x.transpose(1, 2)).transpose(1, 2)
            sed = torch.sigmoid(logits / temp_w) * at_out.unsqueeze(1)
            sed = torch.clamp(sed, 1e-7, 1.0)
            weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)

        sd = {f"backbone.{k}": torch.from_numpy(v) for k, v in tmodel.reference_state_dict().items()}
        sd["f_pool_module.f_att_token"] = f_token
        for k, v in f_pool_att.state_dict().items():
            sd[f"f_pool_module.frequency_att.{k}"] = v
        sd["norm_before_pool.weight"] = nbp_w; sd["norm_before_pool.bias"] = nbp_b
        sd["norm_after_merge.weight"] = nam_w; sd["norm_after_merge.bias"] = nam_b
        for name, mod in (("transformer_projector", tproj), ("at_projector", atproj),
                          ("sed_head", sed_head)):
            sd[f"{name}.weight"] = mod.weight.detach(); sd[f"{name}.bias"] = mod.bias.detach()
        sd["query_projector.0.weight"] = qproj.weight.detach()
        sd["query_projector.0.bias"] = qproj.bias.detach()
        for i, mod in enumerate(me):
            sd[f"mask_embedding_layer.layers.{i}.weight"] = mod.weight.detach()
            sd[f"mask_embedding_layer.layers.{i}.bias"] = mod.bias.detach()
        for i, mod in enumerate(ah):
            sd[f"at_head.layers.{i}.weight"] = mod.weight.detach()
            sd[f"at_head.layers.{i}.bias"] = mod.bias.detach()
        for k, v in at_layer.state_dict().items():
            sd[f"at_decoder.decoder.layers.0.{k}"] = v
        for k, v in xl.items():
            sd[f"sed_decoder.encoder_blocks.0.{k}"] = v

        init_kwargs = dict(
            class_num=Q, decoder_dim=d, num_heads=heads, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=200, embed_dim=d,
            backbone_depth=DEPTH, backbone_num_heads=heads, passt_feature_layer=DEPTH,
            at_decoder_layer=1, f_pool_heads=heads, out_type="sigmoid", cnn_param=None,
            query_projector=True, query_dim=qdim, backbone_img_size=IMG,
        )
        np_sd = {k: np.asarray(v) for k, v in sd.items()}
        params, _ = convert_torch_checkpoint(np_sd, "DASM", init_kwargs=init_kwargs)
        model = tiny_dasm(**init_kwargs)
        out = model.apply(
            {"params": params}, jnp.asarray(mel.numpy()),
            query=jnp.asarray(query.numpy()), query_type="text", temp_w=temp_w,
        )
        np.testing.assert_allclose(np.asarray(out.at_out), at_out.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.strong), sed.transpose(1, 2).numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.weak), weak.numpy(), atol=5e-5)


class TestPMAMPrototypeParity:
    def test_prediction_formula_matches_torch(self):
        """PMAM prototype posteriors (pmam/train.py:82-87): only the logit
        side normalised, leaky_relu(0.2)*2-1, sigmoid(/0.1) — torch vs jax
        on unnormalised GMM means."""
        import torch.nn.functional as F

        from transformer4sed_tpu.pmam import prototype_predictions

        torch.manual_seed(0)
        logit = torch.randn(2, 7, 16) * 2.0
        means = torch.randn(5, 16) * 3.0  # NOT unit norm — magnitudes matter

        with torch.no_grad():
            sim = F.normalize(logit, dim=-1) @ means.t()
            ref = torch.sigmoid((F.leaky_relu(sim, negative_slope=0.2) * 2 - 1) / 0.1)

        out = prototype_predictions(jnp.asarray(logit.numpy()), jnp.asarray(means.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-6)


class TestLossTorchParity:
    """Loss-library parity against torch reimplementations of the
    reference formulas (functional/loss/*)."""

    def test_asl_family(self):
        from transformer4sed_tpu.core.losses import asl, asymmetric_focal, reweighted_asl

        torch.manual_seed(0)
        pred = torch.rand(4, 6, 10) * 0.98 + 0.01
        target = (torch.rand(4, 6, 10) > 0.7).float()

        rp, rn, margin = 0.5, 2.0, 0.05
        pred_m = torch.clamp_min(pred - margin, 0.0)
        ref_asl = -(((1 - pred) ** rp) * target * torch.clamp_min(torch.log(pred), -100)
                    + (pred_m ** rn) * (1 - target) * torch.clamp_min(torch.log(1 - pred_m), -100))
        np.testing.assert_allclose(
            float(asl(jnp.asarray(pred.numpy()), jnp.asarray(target.numpy()), rp, rn, margin)),
            float(ref_asl.mean()), atol=1e-6,
        )

        weight = torch.rand(10) + 0.2
        ref_rw = (weight * ref_asl).mean()
        np.testing.assert_allclose(
            float(reweighted_asl(jnp.asarray(pred.numpy()), jnp.asarray(target.numpy()),
                                 rp, rn, margin, weight.numpy())),
            float(ref_rw), atol=1e-6,
        )

        gamma, zeta = 1.5, 0.5
        ref_af = -(((1 - pred) ** gamma) * target * torch.clamp_min(torch.log(pred), -100)
                   + (pred ** zeta) * (1 - target) * torch.clamp_min(torch.log(1 - pred), -100))
        np.testing.assert_allclose(
            float(asymmetric_focal(jnp.asarray(pred.numpy()), jnp.asarray(target.numpy()), gamma, zeta)),
            float(ref_af.mean()), atol=1e-6,
        )

    def test_info_nce_modes(self):
        import torch.nn.functional as F

        from transformer4sed_tpu.core.losses import info_nce

        torch.manual_seed(1)
        q = torch.randn(6, 8)
        pos = torch.randn(6, 8)
        neg_u = torch.randn(9, 8)
        neg_p = torch.randn(6, 4, 8)

        def ref(query, positive, negatives, mode):
            qn = F.normalize(query, dim=-1)
            pn = F.normalize(positive, dim=-1)
            if negatives is None:
                logits = qn @ pn.t()
                labels = torch.arange(len(qn))
            else:
                nn_ = F.normalize(negatives, dim=-1)
                pl = (qn * pn).sum(1, keepdim=True)
                if mode == "unpaired":
                    nl = qn @ nn_.t()
                else:
                    nl = (qn.unsqueeze(1) @ nn_.transpose(-2, -1)).squeeze(1)
                logits = torch.cat([pl, nl], dim=1)
                labels = torch.zeros(len(logits), dtype=torch.long)
            return float(F.cross_entropy(logits / 0.1, labels))

        for negatives, mode in ((None, "unpaired"), (neg_u, "unpaired"), (neg_p, "paired")):
            ours = float(info_nce(
                jnp.asarray(q.numpy()), jnp.asarray(pos.numpy()),
                None if negatives is None else jnp.asarray(negatives.numpy()),
                temperature=0.1, negative_mode=mode,
            ))
            np.testing.assert_allclose(ours, ref(q, pos, negatives, mode), atol=1e-5)

    def test_sup_con(self):
        from transformer4sed_tpu.core.losses import sup_con

        torch.manual_seed(2)
        feats = torch.nn.functional.normalize(torch.randn(5, 2, 8), dim=-1)
        labels = torch.tensor([0, 1, 0, 2, 1])

        def ref(features, labels, temperature=0.07, base_temperature=0.07, mode="all"):
            bsz = features.shape[0]
            mask = torch.eq(labels.view(-1, 1), labels.view(1, -1)).float()
            n_views = features.shape[1]
            contrast = torch.cat(torch.unbind(features, dim=1), dim=0)
            anchor = contrast if mode == "all" else features[:, 0]
            a_count = n_views if mode == "all" else 1
            adc = (anchor @ contrast.t()) / temperature
            logits = adc - adc.max(dim=1, keepdim=True).values
            mask = mask.repeat(a_count, n_views)
            lm = torch.ones_like(mask)
            lm[torch.arange(bsz * a_count), torch.arange(bsz * a_count)] = 0
            mask = mask * lm
            exp_logits = torch.exp(logits) * lm
            log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
            mlpp = (mask * log_prob).sum(1) / mask.sum(1)
            return float((-(temperature / base_temperature) * mlpp).view(a_count, bsz).mean())

        for mode in ("all", "one"):
            ours = float(sup_con(
                jnp.asarray(feats.numpy()), labels=jnp.asarray(labels.numpy()),
                contrast_mode=mode,
            ))
            np.testing.assert_allclose(ours, ref(feats, labels, mode=mode), atol=1e-5)


class TestPaSSTCNNFullModelParity:
    """PaSST_CNN (PMAM net) assembly parity (passt_cnn.py:32-92): the
    PaSST_SED path plus the CNN merge branch — CNN on [B,1,T,F] mel,
    freq pooled to 1, linearly resized to the 1000-frame grid,
    transformer_projector(x) + merge_weight * cnn_projector(cnn_feat)
    (NO norm after merge in this family)."""

    def test_forward_matches(self):
        import torch.nn.functional as F

        from transformer4sed_tpu.models.passt_cnn import PaSST_CNN
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        torch.manual_seed(3)
        d, heads, C = D, HEADS, 3
        temp_w = 0.5
        tmodel = TorchMiniPaSST().eval()

        filters = [8, 12]
        convs = []
        cnn_sd = {}
        cin = 1
        for i, cout in enumerate(filters):
            conv = tnn.Conv2d(cin, cout, 3, 1, 1)
            bn = tnn.BatchNorm2d(cout, eps=0.001).eval()
            bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
            bn.weight.data.normal_(); bn.bias.data.normal_()
            glu = tnn.Linear(cout, cout)
            convs.append((conv, bn, glu))
            cnn_sd[f"cnn.cnn.conv{i}.weight"] = conv.weight.detach()
            cnn_sd[f"cnn.cnn.conv{i}.bias"] = conv.bias.detach()
            cnn_sd[f"cnn.cnn.batchnorm{i}.weight"] = bn.weight.detach()
            cnn_sd[f"cnn.cnn.batchnorm{i}.bias"] = bn.bias.detach()
            cnn_sd[f"cnn.cnn.batchnorm{i}.running_mean"] = bn.running_mean
            cnn_sd[f"cnn.cnn.batchnorm{i}.running_var"] = bn.running_var
            cnn_sd[f"cnn.cnn.glu{i}.linear.weight"] = glu.weight.detach()
            cnn_sd[f"cnn.cnn.glu{i}.linear.bias"] = glu.bias.detach()
            cin = cout
        poolings = [(1, 8), (1, 4)]  # 32 mel bins -> 1

        xl = {
            "norm1.weight": torch.rand(d) + 0.5, "norm1.bias": torch.randn(d) * 0.05,
            "attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
            "attn.in_proj.bias": torch.randn(3 * d) * 0.02,
            "attn.out_proj.weight": torch.randn(d, d) * 0.1,
            "attn.out_proj.bias": torch.randn(d) * 0.02,
            "attn.linear_pos.weight": torch.randn(d, d) * 0.1,
            "attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
            "attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
            "norm2.weight": torch.rand(d) + 0.5, "norm2.bias": torch.randn(d) * 0.05,
            "mlp.fc1.weight": torch.randn(d, d) * 0.1,
            "mlp.fc1.bias": torch.randn(d) * 0.02,
            "mlp.fc2.weight": torch.randn(d, d) * 0.1,
            "mlp.fc2.bias": torch.randn(d) * 0.02,
        }
        out_norm_w, out_norm_b = torch.rand(d) + 0.5, torch.randn(d) * 0.05
        tproj = tnn.Linear(d, d)
        cproj = tnn.Linear(filters[-1], d)
        mw = torch.tensor([0.5])
        cls_w, cls_b = torch.randn(C, d) * 0.1, torch.randn(C) * 0.02

        mel = torch.randn(2, *IMG) * 0.5  # [B, F=32, T=200]
        with torch.no_grad():
            frame, taps = tmodel(mel.unsqueeze(1))
            h = taps[DEPTH][:, 2:, :]
            h = F.layer_norm(h, (d,), out_norm_w, out_norm_b, eps=1e-5)
            h = h.reshape(2, 2, 19, d).mean(dim=1)
            h = torch.cat((h, h[:, -1, :].unsqueeze(1)), dim=1)
            x = F.interpolate(h.transpose(1, 2), scale_factor=10, mode="linear").transpose(1, 2)
            # CNN branch on [B, 1, T, F]
            y = mel.transpose(1, 2).unsqueeze(1)
            for (conv, bn, glu), pool in zip(convs, poolings):
                y = bn(conv(y))
                lin = glu(y.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                y = lin * torch.sigmoid(y)
                y = F.avg_pool2d(y, pool)
            assert y.shape[-1] == 1
            cnn_feat = F.interpolate(y.squeeze(-1), size=x.shape[1],
                                     mode="linear").transpose(1, 2)
            x = tproj(x) + mw * cproj(cnn_feat)
            pos = TestXLDecoderTorchParity()._torch_pos_emb(x.shape[1], d)
            x = TestXLDecoderTorchParity()._torch_block(x * np.sqrt(d), xl, pos, heads)
            logits = x @ cls_w.t() + cls_b
            sed = torch.sigmoid(logits / temp_w)
            weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)

        sd = {f"backbone.{k}": torch.from_numpy(v) for k, v in tmodel.reference_state_dict().items()}
        sd.update(cnn_sd)
        sd.update({f"decoder.encoder_blocks.0.{k}": v for k, v in xl.items()})
        sd["out_norm.weight"] = out_norm_w; sd["out_norm.bias"] = out_norm_b
        sd["transformer_projector.weight"] = tproj.weight.detach()
        sd["transformer_projector.bias"] = tproj.bias.detach()
        sd["cnn_projector.weight"] = cproj.weight.detach()
        sd["cnn_projector.bias"] = cproj.bias.detach()
        sd["merge_weight"] = mw
        sd["classifier.weight"] = cls_w; sd["classifier.bias"] = cls_b

        init_kwargs = dict(
            class_num=C, embed_dim=d, decoder_dim=d, backbone_depth=DEPTH,
            backbone_num_heads=heads, decoder_num_heads=heads,
            passt_feature_layer=DEPTH, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=200, at_adapter=False,
            backbone_img_size=IMG,
            cnn_param={"n_in_channel": 1, "nb_filters": filters,
                       "kernel_size": [3, 3], "padding": [1, 1], "stride": [1, 1],
                       "pooling": poolings, "activation": "glu",
                       "normalization": "batch"},
        )
        np_sd = {k: np.asarray(v) for k, v in sd.items()}
        params, state = convert_torch_checkpoint(np_sd, "PaSST_CNN", init_kwargs=init_kwargs)
        model = PaSST_CNN(**init_kwargs)
        out = model.apply(
            {"params": params, **state}, jnp.asarray(mel.numpy()), temp_w=temp_w,
        )
        np.testing.assert_allclose(np.asarray(out.strong), sed.transpose(1, 2).numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.weak), weak.numpy(), atol=5e-5)


class TestHTSATCNNFullModelParity:
    """HTSAT_CNN assembly parity (htsat_cnn.py:127-185): fine-grained
    backbone embedding -> linear x-ratio interp -> transformer_projector
    -> norm_after_merge -> XL decoder -> sed_head -> sigmoid/temp,
    clamp, linear-softmax weak. Backbone weights/forward shared with
    TestHTSATFullStackParity's mini config."""

    def test_forward_matches(self):
        import torch.nn.functional as F

        from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
        from transformer4sed_tpu.utils.torch_import import convert_htsat_cnn

        base = TestHTSATFullStackParity()
        bsd = base._weights()
        mel = torch.randn(2, 1, 256, 16)
        with torch.no_grad():
            _, _, fine, _ = base._torch_forward(mel, bsd)  # [B, 32, 16]

        torch.manual_seed(4)
        d, heads, C, ratio = 32, 4, 3, 4
        nf = fine.shape[-1]
        xl = {
            "norm1.weight": torch.rand(d) + 0.5, "norm1.bias": torch.randn(d) * 0.05,
            "attn.in_proj.weight": torch.randn(3 * d, d) * 0.1,
            "attn.in_proj.bias": torch.randn(3 * d) * 0.02,
            "attn.out_proj.weight": torch.randn(d, d) * 0.1,
            "attn.out_proj.bias": torch.randn(d) * 0.02,
            "attn.linear_pos.weight": torch.randn(d, d) * 0.1,
            "attn.pos_bias_u": torch.randn(heads, d // heads) * 0.1,
            "attn.pos_bias_v": torch.randn(heads, d // heads) * 0.1,
            "norm2.weight": torch.rand(d) + 0.5, "norm2.bias": torch.randn(d) * 0.05,
            "mlp.fc1.weight": torch.randn(d, d) * 0.1,
            "mlp.fc1.bias": torch.randn(d) * 0.02,
            "mlp.fc2.weight": torch.randn(d, d) * 0.1,
            "mlp.fc2.bias": torch.randn(d) * 0.02,
        }
        tproj = tnn.Linear(nf, d)
        nam_w, nam_b = torch.rand(d) + 0.5, torch.randn(d) * 0.05
        head = tnn.Linear(d, C)
        temp_w = 0.5

        with torch.no_grad():
            x = F.interpolate(fine.transpose(1, 2), scale_factor=ratio,
                              mode="linear").transpose(1, 2)
            x = tproj(x)
            x = F.layer_norm(x, (d,), nam_w, nam_b, eps=1e-5)
            pos = TestXLDecoderTorchParity()._torch_pos_emb(x.shape[1], d)
            x = TestXLDecoderTorchParity()._torch_block(x * np.sqrt(d), xl, pos, heads)
            logits = head(x)
            sed = torch.clamp(torch.sigmoid(logits / temp_w), 1e-7, 1.0)
            weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)

        sd = {f"backbone.{k}": v.numpy() for k, v in bsd.items()}
        sd.update({f"sed_decoder.encoder_blocks.0.{k}": v.numpy() for k, v in xl.items()})
        sd["transformer_projector.weight"] = tproj.weight.detach().numpy()
        sd["transformer_projector.bias"] = tproj.bias.detach().numpy()
        sd["norm_after_merge.weight"] = nam_w.numpy()
        sd["norm_after_merge.bias"] = nam_b.numpy()
        sd["sed_head.weight"] = head.weight.detach().numpy()
        sd["sed_head.bias"] = head.bias.detach().numpy()

        tree = convert_htsat_cnn(sd)
        model = HTSAT_CNN(
            class_num=C, decoder_dim=d, num_heads=heads, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=128, htsat_config="tiny",
            htsat_kwargs=dict(base.CFG), backbone_upsample_ratio=ratio,
        )
        out = model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            jnp.asarray(mel.numpy()), temp_w=temp_w,
        )
        np.testing.assert_allclose(np.asarray(out.strong), sed.transpose(1, 2).numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.weak), weak.numpy(), atol=5e-5)


class TestCLAPSEDFullModelParity:
    def test_forward_matches(self):
        """CLAP_SED assembly parity (clap_sed.py:9-41): fine-grained
        embedding -> audio MLP projector x text MLP projector einsum ->
        sigmoid/temp strong + clamped linear-softmax weak."""
        import torch.nn.functional as F

        from transformer4sed_tpu.models.htsat_heads import CLAP_SED
        from transformer4sed_tpu.utils.torch_import import convert_clap_sed

        base = TestHTSATFullStackParity()
        bsd = base._weights()
        mel = torch.randn(2, 1, 256, 16)
        with torch.no_grad():
            _, _, fine, _ = base._torch_forward(mel, bsd)  # [B, 32, 16]

        torch.manual_seed(5)
        nf, qdim, C, temp_w = fine.shape[-1], 8, 3, 0.5
        ap = [tnn.Linear(nf, nf), tnn.Linear(nf, nf)]
        tp = [tnn.Linear(qdim, nf), tnn.Linear(nf, nf)]
        tq = torch.randn(C, qdim)

        with torch.no_grad():
            audio = ap[1](F.gelu(ap[0](fine)))
            text = tp[1](F.gelu(tp[0](tq))).expand(2, -1, -1)
            logit = torch.einsum("bqc,bct->bqt", text, audio.transpose(1, 2)).transpose(1, 2)
            sed = torch.sigmoid(logit / temp_w)
            weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)

        sd = {f"backbone.{k}": v.numpy() for k, v in bsd.items()}
        for name, mods in (("audio_projector", ap), ("text_projector", tp)):
            for i, mod in enumerate(mods):
                sd[f"{name}.layers.{i}.weight"] = mod.weight.detach().numpy()
                sd[f"{name}.layers.{i}.bias"] = mod.bias.detach().numpy()
        sd["text_query"] = tq.numpy()

        tree = convert_clap_sed(sd)
        model = CLAP_SED(embed_dim=nf, class_num=C, query_dim=qdim,
                         htsat_config="tiny", htsat_kwargs=dict(base.CFG))
        out = model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            jnp.asarray(mel.numpy()), temp_w=temp_w,
        )
        np.testing.assert_allclose(np.asarray(out.strong), sed.transpose(1, 2).numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out.weak), weak.numpy(), atol=5e-5)


class TestASTBackboneParity:
    def test_forward_matches(self):
        """AST backbone parity (ast_models.py:88-230): 1-channel patch
        conv, cls/dist tokens with a flat pos embed added post-concat,
        timm blocks, final norm, (cls+dist)/2 -> mlp_head LN+Linear."""
        import torch.nn.functional as F

        from transformer4sed_tpu.models.ast import AST
        from transformer4sed_tpu.utils.torch_import import convert_ast

        torch.manual_seed(6)
        fdim, tdim, label_dim = 32, 100, 5
        grid = ((fdim - 16) // 10 + 1, (tdim - 16) // 10 + 1)
        n_tok = 2 + grid[0] * grid[1]
        proj = tnn.Conv2d(1, D, 16, 10)
        cls_t = torch.randn(1, 1, D) * 0.02
        dist_t = torch.randn(1, 1, D) * 0.02
        pos = torch.randn(1, n_tok, D) * 0.02
        blocks = [TorchBlock().eval() for _ in range(DEPTH)]
        norm = tnn.LayerNorm(D, eps=1e-6)
        head_norm = tnn.LayerNorm(D, eps=1e-6)
        head = tnn.Linear(D, label_dim)

        x = torch.randn(2, 1, fdim, tdim) * 0.5
        with torch.no_grad():
            p = proj(x)  # [B, D, F', T']
            seq = p.flatten(2).transpose(1, 2)
            h = torch.cat([cls_t.expand(2, -1, -1), dist_t.expand(2, -1, -1), seq], dim=1)
            h = h + pos
            for blk in blocks:
                h = blk(h)
            h = norm(h)
            ref_globals = head(head_norm((h[:, 0] + h[:, 1]) / 2.0))

        sd = {
            "v.patch_embed.proj.weight": proj.weight.detach().numpy(),
            "v.patch_embed.proj.bias": proj.bias.detach().numpy(),
            "v.cls_token": cls_t.numpy(),
            "v.dist_token": dist_t.numpy(),
            "v.pos_embed": pos.numpy(),
            "v.norm.weight": norm.weight.detach().numpy(),
            "v.norm.bias": norm.bias.detach().numpy(),
            "mlp_head.0.weight": head_norm.weight.detach().numpy(),
            "mlp_head.0.bias": head_norm.bias.detach().numpy(),
            "mlp_head.1.weight": head.weight.detach().numpy(),
            "mlp_head.1.bias": head.bias.detach().numpy(),
        }
        for i, blk in enumerate(blocks):
            sd.update({
                f"v.blocks.{i}.norm1.weight": blk.norm1.weight.detach().numpy(),
                f"v.blocks.{i}.norm1.bias": blk.norm1.bias.detach().numpy(),
                f"v.blocks.{i}.attn.qkv.weight": blk.attn_qkv.weight.detach().numpy(),
                f"v.blocks.{i}.attn.qkv.bias": blk.attn_qkv.bias.detach().numpy(),
                f"v.blocks.{i}.attn.proj.weight": blk.attn_proj.weight.detach().numpy(),
                f"v.blocks.{i}.attn.proj.bias": blk.attn_proj.bias.detach().numpy(),
                f"v.blocks.{i}.norm2.weight": blk.norm2.weight.detach().numpy(),
                f"v.blocks.{i}.norm2.bias": blk.norm2.bias.detach().numpy(),
                f"v.blocks.{i}.mlp.fc1.weight": blk.mlp_fc1.weight.detach().numpy(),
                f"v.blocks.{i}.mlp.fc1.bias": blk.mlp_fc1.bias.detach().numpy(),
                f"v.blocks.{i}.mlp.fc2.weight": blk.mlp_fc2.weight.detach().numpy(),
                f"v.blocks.{i}.mlp.fc2.bias": blk.mlp_fc2.bias.detach().numpy(),
            })

        params = convert_ast(sd)
        model = AST(embed_dim=D, depth=DEPTH, num_heads=HEADS, input_fdim=fdim,
                    input_tdim=tdim, label_dim=label_dim, tap_layers=(DEPTH,))
        out = model.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out["frame"]), h.numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out["globals"]), ref_globals.numpy(), atol=3e-5)


class TestBiGRUDecoderParity:
    def test_matches_torch_bidirectional_gru(self):
        """BiGRUDecoder == torch nn.GRU(bidirectional, 2 layers) with
        mapped weights: torch packs gates [r; z; n] with separate
        b_ih/b_hh; flax GRUCell folds b_hh_r/z into the input bias
        (additive inside the sigmoid) and keeps b_hn on hn (applied
        before the reset gate, matching torch's n-gate form)."""
        from transformer4sed_tpu.models.xl import BiGRUDecoder

        torch.manual_seed(0)
        din, H, layers = 6, 8, 2
        gru = tnn.GRU(din, H, num_layers=layers, bidirectional=True,
                      batch_first=True).eval()
        x = torch.randn(2, 11, din)
        with torch.no_grad():
            ref, _ = gru(x)

        params = {}
        cell = 0
        for layer in range(layers):
            for direction in ("", "_reverse"):
                wih = getattr(gru, f"weight_ih_l{layer}{direction}")
                whh = getattr(gru, f"weight_hh_l{layer}{direction}")
                bih = getattr(gru, f"bias_ih_l{layer}{direction}")
                bhh = getattr(gru, f"bias_hh_l{layer}{direction}")
                (wr, wz, wn) = wih.detach().chunk(3, 0)
                (ur, uz, un) = whh.detach().chunk(3, 0)
                (br, bz, bn_) = bih.detach().chunk(3, 0)
                (cr, cz, cn) = bhh.detach().chunk(3, 0)
                params[f"GRUCell_{cell}"] = {
                    "ir": {"kernel": wr.t().numpy(), "bias": (br + cr).numpy()},
                    "iz": {"kernel": wz.t().numpy(), "bias": (bz + cz).numpy()},
                    "in": {"kernel": wn.t().numpy(), "bias": bn_.numpy()},
                    "hr": {"kernel": ur.t().numpy()},
                    "hz": {"kernel": uz.t().numpy()},
                    "hn": {"kernel": un.t().numpy(), "bias": cn.numpy()},
                }
                cell += 1

        dec = BiGRUDecoder(hidden_dim=H, num_layers=layers)
        out = dec.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


class TestResNetTorchParity:
    def test_basic_stack_with_1d_head(self):
        """Reference ResNet parity (resnet.py:26-255): pair-wise basic
        blocks (conv/bn/GELU x2, conv1x1+bn downsample on channel change,
        post-residual GELU), AvgPool between, freq squeeze + unpadded
        conv1d/BN/GELU head — via convert_resnet ('res_block {i}' keys
        with the reference's literal space)."""
        import torch.nn.functional as F

        from transformer4sed_tpu.models.cnn import ResNet
        from transformer4sed_tpu.utils.torch_import import convert_resnet

        torch.manual_seed(0)
        cin, mid, cout = 1, 6, 10
        conv1 = tnn.Conv2d(cin, mid, 3, 1, 1, bias=False)
        bn1 = tnn.BatchNorm2d(mid).eval()
        conv2 = tnn.Conv2d(mid, cout, 3, 1, 1, bias=False)
        bn2 = tnn.BatchNorm2d(cout).eval()
        ds_conv = tnn.Conv2d(cin, cout, 1, bias=False)
        ds_bn = tnn.BatchNorm2d(cout).eval()
        head = tnn.Conv1d(cout, 12, 3)
        head_bn = tnn.BatchNorm1d(12).eval()
        for bn in (bn1, bn2, ds_bn, head_bn):
            bn.running_mean.normal_(0, 0.2)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.data.normal_(1.0, 0.2)
            bn.bias.data.normal_(0, 0.1)

        x = torch.randn(2, cin, 12, 8)
        with torch.no_grad():
            h = F.gelu(bn1(conv1(x)))
            h = bn2(conv2(h))
            res = ds_bn(ds_conv(x))
            h = F.gelu(h + res)
            h = F.avg_pool2d(h, (1, 8))   # freq -> 1
            s = h.squeeze(-1)             # [B, C, T]
            s = F.gelu(head_bn(head(s)))  # unpadded: T 12 -> 10
            ref = s.unsqueeze(-1)         # [B, 12, 10, 1]

        sd = {
            "cnn.res_block 0.conv1.weight": conv1.weight.detach().numpy(),
            "cnn.res_block 0.conv2.weight": conv2.weight.detach().numpy(),
            "cnn.res_block 0.downsample.1.weight": ds_conv.weight.detach().numpy(),
            "cnn.cnn_1d_0.conv_1d.weight": head.weight.detach().numpy(),
            "cnn.cnn_1d_0.conv_1d.bias": head.bias.detach().numpy(),
        }
        for name, bn in (("cnn.res_block 0.bn1", bn1), ("cnn.res_block 0.bn2", bn2),
                         ("cnn.res_block 0.downsample.2", ds_bn),
                         ("cnn.cnn_1d_0.norm_layer", head_bn)):
            sd[f"{name}.weight"] = bn.weight.detach().numpy()
            sd[f"{name}.bias"] = bn.bias.detach().numpy()
            sd[f"{name}.running_mean"] = bn.running_mean.numpy()
            sd[f"{name}.running_var"] = bn.running_var.numpy()

        params, stats = convert_resnet(sd)
        model = ResNet(
            n_in_channel=cin, nb_filters=(mid, cout), stride=(1, 1),
            pooling=((1, 1), (1, 8)), res_block_type="basic",
            cnn_1d_dict={"filters": (12,), "kernel_size": (3,)},
        )
        out = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.numpy()), train=False,
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)


class TestSchedulerParity:
    def test_exponential_down_values(self):
        """core.schedules.exponential_down == the reference
        ExponentialDown._get_scale (scheduler.py:58-67) across all three
        regimes: linear warmup, plateau, exp(exponent * phase^2) decay."""
        from transformer4sed_tpu.core.schedules import exponential_down

        start_iter, total_iter, exponent = 50, 200, -1.5
        warmup_iter, warmup_rate = 10, 0.1
        sched = exponential_down(start_iter, total_iter, exponent, warmup_iter, warmup_rate)

        def ref(step_num):
            if step_num < warmup_iter:
                phase = step_num / warmup_iter
                return (1 - warmup_rate) * phase + warmup_rate
            if step_num > start_iter:
                phase = (step_num - start_iter) / (total_iter - start_iter)
                return float(np.exp(exponent * phase * phase))
            return 1.0

        for step in [0, 1, 5, 9, 10, 30, 50, 51, 100, 199, 200]:
            np.testing.assert_allclose(float(sched(step)), ref(step), rtol=1e-6,
                                       err_msg=f"step {step}")

    def test_update_ema_alpha_ramp(self):
        """Mean-teacher EMA alpha = min(1 - 1/step, factor)
        (scheduler.py:125-130): teacher after one update equals
        alpha*teacher + (1-alpha)*student at the reference's step count."""
        from transformer4sed_tpu.core.ema import ema_update

        t, s = {"w": jnp.asarray(2.0)}, {"w": jnp.asarray(4.0)}
        for step, alpha in ((1, 0.0), (2, 0.5), (10, 0.9), (10_000, 0.999)):
            out = ema_update(s, t, step, 0.999)
            np.testing.assert_allclose(float(out["w"]), alpha * 2.0 + (1 - alpha) * 4.0,
                                       rtol=1e-6, err_msg=f"step {step}")


class TestFrontendFullPipelineParity:
    """wav -> normalized log-mel parity against the reference frontends.

    Rebuilds ``PasstFeatureExtractor.forward``+``normalize``
    (src/models/passt/passt_feature_extraction.py:53-94) and
    ``setmelspectrogram``+``take_log``
    (src/preprocess/feats_extraction.py:41-57) in torch inside the test
    — including the Kaldi/HTK mel-bank formulas torchaudio would supply
    — and checks the jit frontends end-to-end on the same waveform.
    """

    @staticmethod
    def _torch_kaldi_banks(n_mels, n_fft, sr, fmin, fmax):
        # torchaudio.compliance.kaldi.get_mel_banks semantics at
        # vtln_warp_factor=1.0: n_fft//2 columns, centers uniform in
        # kaldi-mel between fmin and fmax.
        import math

        num_fft_bins = n_fft // 2
        fft_bin_width = sr / n_fft
        mel = lambda f: 1127.0 * math.log(1.0 + f / 700.0)
        mel_low, mel_high = mel(fmin), mel(fmax)
        mel_delta = (mel_high - mel_low) / (n_mels + 1)
        freqs = fft_bin_width * torch.arange(num_fft_bins, dtype=torch.float32)
        mels = 1127.0 * torch.log1p(freqs / 700.0)
        left = mel_low + torch.arange(n_mels, dtype=torch.float32)[:, None] * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (mels[None, :] - left) / (center - left)
        down = (right - mels[None, :]) / (right - center)
        return torch.clamp(torch.minimum(up, down), min=0.0)

    @classmethod
    def _torch_passt_forward(cls, wav, n_mels, sr, win, hop, n_fft, fmin, fmax):
        x = torch.tensor(wav, dtype=torch.float32)
        max_vals = torch.max(x, dim=1, keepdim=True)[0]
        min_vals = torch.min(x, dim=1, keepdim=True)[0]
        x = x / (torch.maximum(max_vals.abs(), min_vals.abs()) + 1e-10)
        pre = torch.as_tensor([[[-0.97, 1.0]]])
        x = torch.nn.functional.conv1d(x.unsqueeze(1), pre).squeeze(1)
        spec = torch.stft(
            x, n_fft, hop_length=hop, win_length=win, center=True,
            normalized=False, window=torch.hann_window(win, periodic=False),
            return_complex=True,
        )
        power = spec.real**2 + spec.imag**2
        banks = torch.nn.functional.pad(
            cls._torch_kaldi_banks(n_mels, n_fft, sr, fmin, fmax), (0, 1)
        )
        melspec = torch.matmul(banks, power)
        return ((melspec + 1e-5).log() + 4.5) / 5.0

    def test_passt_frontend_eval_path(self):
        from transformer4sed_tpu.frontend.mel import PasstFrontend

        rng = np.random.default_rng(11)
        wav = rng.standard_normal((2, 64000)).astype(np.float32) * 0.3
        fe = PasstFrontend(fmin_aug_range=10, fmax_aug_range=2000)
        ours = np.asarray(fe.normalize(fe(jnp.asarray(wav))))

        fmax = 32000 // 2 - 2000 // 2  # reference fmax=None default
        ref = self._torch_passt_forward(
            wav, 128, 32000, 800, 320, 1024, 0.0, float(fmax)
        ).numpy()
        assert ours.shape == ref.shape == (2, 128, 200)
        np.testing.assert_allclose(ours, ref, atol=3e-4)

    def test_passt_frontend_augmented_banks(self):
        """The in-jit traced-fmin/fmax bank equals the torch bank the
        reference would build host-side for the same drawn values."""
        from transformer4sed_tpu.frontend.mel import kaldi_mel_banks

        for fmin, fmax in [(3.0, 14700.0), (9.0, 15990.0), (0.0, 15001.0)]:
            ours = np.asarray(
                jax.jit(lambda a, b: kaldi_mel_banks(128, 1024, 32000, a, b))(
                    jnp.float32(fmin), jnp.float32(fmax)
                )
            )
            ref = torch.nn.functional.pad(
                self._torch_kaldi_banks(128, 1024, 32000, fmin, fmax), (0, 1)
            ).numpy()
            # f32 vs f64 mel-boundary round-off only (max ~3e-5)
            np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_generic_mel_frontend_pipeline(self):
        """MelFrontend == torchaudio MelSpectrogram(power=1, hamming,
        htk, norm=None) -> AmplitudeToDB(amin=1e-5).clamp(-50, 80),
        rebuilt from the formulas."""
        from transformer4sed_tpu.frontend.mel import MelFrontend

        sr, n_fft, hop, n_mels = 16000, 2048, 256, 64
        rng = np.random.default_rng(5)
        wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
        fe = MelFrontend(sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
                         fmin=0.0, fmax=8000.0)
        ours = np.asarray(fe(jnp.asarray(wav)))

        x = torch.tensor(wav)
        spec = torch.stft(
            x, n_fft, hop_length=hop, win_length=n_fft, center=True,
            normalized=False, window=torch.hamming_window(n_fft, periodic=False),
            return_complex=True,
        ).abs()
        # htk melscale_fbanks, norm=None, [n_freqs, n_mels]
        freqs = torch.linspace(0.0, sr / 2, n_fft // 2 + 1)
        hmel = lambda f: 2595.0 * torch.log10(1.0 + f / 700.0)
        m_pts = torch.linspace(hmel(torch.tensor(0.0)), hmel(torch.tensor(8000.0)), n_mels + 2)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts[None, :] - freqs[:, None]
        fb = torch.clamp(
            torch.minimum(-slopes[:, :-2] / f_diff[:-1], slopes[:, 2:] / f_diff[1:]),
            min=0.0,
        )
        mel = torch.einsum("fm,bft->bmt", fb, spec)
        db = 20.0 * torch.log10(torch.clamp(mel, min=1e-5))
        ref = db.clamp(min=-50.0, max=80.0).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=3e-4)


class TestMeanTeacherTrainStepTorchParity:
    """End-to-end TRAINING parity: the reference mean-teacher loop
    (finetune/train.py:129-213) rebuilt literally in torch — loss
    assembly over the [strong | weak | unlabeled] masks, w_cons ramp
    read from scheduler.step_num (completed steps + 1, scheduler.py:49),
    AdamW, and update_ema with the post-step step_num
    (scheduler.py:125-130) — stepped four times on a tiny PaSST_SED
    against ``make_mean_teacher_step`` with identical initial weights
    (shared via convert_torch_checkpoint) and augmentation disabled.
    Per-step total losses and the final student AND teacher forwards
    must agree, pinning the whole grad -> AdamW -> EMA chain, not just
    the forward math."""

    S, W, U = 2, 2, 2
    N_STEPS = 4
    WARMUP = 3  # crosses the ramp -> plateau boundary inside the run
    LR, WD = 1e-3, 1e-2
    W_WEAK, W_WEAK_CONS, W_AT, W_CONS_MAX = 0.5, 1.0, 0.2, 2.0
    TEMP_W = 1.0

    def _build_torch_weights(self, seed):
        """One full tiny-MAT-SED weight set: (ordered param list for the
        optimizer/EMA, parts dict for the forward)."""
        torch.manual_seed(seed)
        d, heads = D, HEADS
        model = TorchMiniPaSST()
        xl = {
            "norm1.weight": (torch.rand(d) + 0.5).requires_grad_(),
            "norm1.bias": (torch.randn(d) * 0.05).requires_grad_(),
            "attn.in_proj.weight": (torch.randn(3 * d, d) * 0.1).requires_grad_(),
            "attn.in_proj.bias": (torch.randn(3 * d) * 0.02).requires_grad_(),
            "attn.out_proj.weight": (torch.randn(d, d) * 0.1).requires_grad_(),
            "attn.out_proj.bias": (torch.randn(d) * 0.02).requires_grad_(),
            "attn.linear_pos.weight": (torch.randn(d, d) * 0.1).requires_grad_(),
            "attn.pos_bias_u": (torch.randn(heads, d // heads) * 0.1).requires_grad_(),
            "attn.pos_bias_v": (torch.randn(heads, d // heads) * 0.1).requires_grad_(),
            "norm2.weight": (torch.rand(d) + 0.5).requires_grad_(),
            "norm2.bias": (torch.randn(d) * 0.05).requires_grad_(),
            "mlp.fc1.weight": (torch.randn(d, d) * 0.1).requires_grad_(),
            "mlp.fc1.bias": (torch.randn(d) * 0.02).requires_grad_(),
            "mlp.fc2.weight": (torch.randn(d, d) * 0.1).requires_grad_(),
            "mlp.fc2.bias": (torch.randn(d) * 0.02).requires_grad_(),
        }
        C = 3
        parts = {
            "model": model,
            "xl": xl,
            "out_norm_w": (torch.rand(d) + 0.5).requires_grad_(),
            "out_norm_b": (torch.randn(d) * 0.05).requires_grad_(),
            "cls_w": (torch.randn(C, d) * 0.1).requires_grad_(),
            "cls_b": (torch.randn(C) * 0.02).requires_grad_(),
            "at_pool": tnn.MultiheadAttention(d, heads, batch_first=True),
            "at_token": (torch.randn(1, 1, d) * 0.02).requires_grad_(),
            "at_w": (torch.randn(C, d) * 0.1).requires_grad_(),
            "at_b": (torch.randn(C) * 0.02).requires_grad_(),
        }
        plist = (
            list(model.parameters())
            + [xl[k] for k in sorted(xl)]
            + [parts[k] for k in ("out_norm_w", "out_norm_b", "cls_w", "cls_b", "at_token", "at_w", "at_b")]
            + list(parts["at_pool"].parameters())
        )
        return plist, parts

    def _torch_forward(self, parts, mel):
        """Differentiable tiny PaSST_SED forward (mirrors
        TestPaSSTSEDFullModelParity) -> (strong [B,C,T], weak, at_out)."""
        import math

        import torch.nn.functional as F

        d, heads = D, HEADS
        B = mel.shape[0]
        frame, taps = parts["model"](mel.unsqueeze(1))
        h = taps[DEPTH][:, 2:, :]
        h = F.layer_norm(h, (d,), parts["out_norm_w"], parts["out_norm_b"], eps=1e-5)
        f_dim, t_dim = 2, 19
        h = h.reshape(B, f_dim, t_dim, d).mean(dim=1)
        h = torch.cat((h, h[:, -1, :].unsqueeze(1)), dim=1)
        h = F.interpolate(h.transpose(1, 2), scale_factor=10, mode="linear").transpose(1, 2)
        xlp = TestXLDecoderTorchParity()
        pos = xlp._torch_pos_emb(h.shape[1], d)
        h = xlp._torch_block(h * math.sqrt(d), parts["xl"], pos, heads)
        logits = h @ parts["cls_w"].t() + parts["cls_b"]
        sed = torch.sigmoid(logits / self.TEMP_W)
        weak = torch.clamp((sed * sed).sum(1) / sed.sum(1), 1e-7, 1.0)
        at_emb = frame[:, 2:, :]
        pooled, _ = parts["at_pool"](parts["at_token"].repeat(B, 1, 1), at_emb, at_emb)
        at_out = torch.sigmoid(pooled.squeeze(1) @ parts["at_w"].t() + parts["at_b"])
        return sed.transpose(1, 2), weak, at_out

    def _export_sd(self, parts):
        # np.copy everywhere: .detach().numpy() VIEWS the parameter
        # storage, and the in-place AdamW steps below would silently
        # mutate the exported dict before conversion
        sd = {f"backbone.{k}": np.copy(v) for k, v in parts["model"].reference_state_dict().items()}
        sd.update({f"decoder.encoder_blocks.0.{k}": np.copy(v.detach().numpy()) for k, v in parts["xl"].items()})
        sd["out_norm.weight"] = np.copy(parts["out_norm_w"].detach().numpy())
        sd["out_norm.bias"] = np.copy(parts["out_norm_b"].detach().numpy())
        sd["classifier.weight"] = np.copy(parts["cls_w"].detach().numpy())
        sd["classifier.bias"] = np.copy(parts["cls_b"].detach().numpy())
        sd["at_adpater.0.f_att_token"] = np.copy(parts["at_token"].detach().numpy())
        for k, v in parts["at_pool"].state_dict().items():
            sd[f"at_adpater.0.frequency_att.{k}"] = np.copy(v.numpy())
        sd["at_adpater.1.weight"] = np.copy(parts["at_w"].detach().numpy())
        sd["at_adpater.1.bias"] = np.copy(parts["at_b"].detach().numpy())
        return sd

    def _ref_w_cons(self, completed_steps):
        """get_self_weight + w_cons (train.py:96-115,181-182): step_num is
        read BEFORE scheduler.step(), i.e. completed + 1."""
        step_num = completed_steps + 1
        if step_num < self.WARMUP:
            warm = step_num / self.WARMUP
            warm = 1.0 / (1.0 + np.exp(-10.0 * (warm - 0.5)))
        else:
            warm = 1.0
        return max(self.W_CONS_MAX * warm, 0.0)

    def test_four_steps_match(self):
        import copy

        import optax
        import torch.nn.functional as F

        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            create_mean_teacher_state,
            make_mean_teacher_step,
        )
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        s, w, u = self.S, self.W, self.U
        B, C, T = s + w + u, 3, 200
        stu_list, stu_parts = self._build_torch_weights(seed=3)
        sd = self._export_sd(stu_parts)

        rng = np.random.RandomState(0)
        mel_np = (rng.randn(B, *IMG) * 0.5).astype(np.float32)
        labels_np = np.zeros((B, C, T), np.float32)
        labels_np[:s] = (rng.rand(s, C, T) > 0.85).astype(np.float32)
        labels_np[s : s + w, :, 0] = (rng.rand(w, C) > 0.5).astype(np.float32)

        # ---------------- torch: the reference loop, literally ----------------
        mel = torch.tensor(mel_np)
        labels = torch.tensor(labels_np)
        tch_parts = copy.deepcopy(stu_parts)
        tch_list = (
            list(tch_parts["model"].parameters())
            + [tch_parts["xl"][k] for k in sorted(tch_parts["xl"])]
            + [tch_parts[k] for k in ("out_norm_w", "out_norm_b", "cls_w", "cls_b", "at_token", "at_w", "at_b")]
            + list(tch_parts["at_pool"].parameters())
        )
        opt = torch.optim.AdamW(stu_list, lr=self.LR, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=self.WD)
        labels_weak = labels[s : s + w].sum(-1)
        torch_losses = []
        for i in range(self.N_STEPS):
            opt.zero_grad()
            t_strong, t_weak, t_at = self._torch_forward(stu_parts, mel)
            with torch.no_grad():
                e_strong, e_weak, e_at = self._torch_forward(tch_parts, mel)
            loss_class_at = F.binary_cross_entropy(t_at[s : s + w], labels_weak)
            loss_cons_at = F.mse_loss(t_at, e_at)
            loss_class_strong = F.binary_cross_entropy(t_strong[:s], labels[:s])
            loss_class_weak = F.binary_cross_entropy(t_weak[s : s + w], labels_weak)
            loss_cons_strong = F.mse_loss(t_strong, e_strong)
            loss_cons_weak = F.mse_loss(t_weak, e_at)
            w_cons = self._ref_w_cons(i)
            total = (
                loss_class_strong
                + self.W_WEAK * loss_class_weak
                + w_cons * (loss_cons_strong + self.W_WEAK_CONS * loss_cons_weak
                            + self.W_AT * loss_cons_at)
                + self.W_AT * loss_class_at
            )
            total.backward()
            opt.step()
            # scheduler.step() has now run -> step_num = i + 2 (scheduler.py:76)
            alpha = min(1.0 - 1.0 / (i + 2), 0.999)
            with torch.no_grad():
                for ep, p in zip(tch_list, stu_list):
                    ep.mul_(alpha).add_(p, alpha=1.0 - alpha)
            torch_losses.append(float(total.detach()))

        # ---------------- jax: make_mean_teacher_step ----------------
        init_kwargs = dict(
            class_num=C, embed_dim=D, decoder_dim=D, backbone_depth=DEPTH,
            backbone_num_heads=HEADS, decoder_num_heads=HEADS,
            at_adapter_heads=HEADS, passt_feature_layer=DEPTH,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=T, at_adapter=True, backbone_img_size=IMG,
        )
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        model = PaSST_SED(**init_kwargs)

        class _IdentityFrontend:
            def __call__(self, wav, key=None, training=False):
                return wav

            def normalize(self, mel):
                return mel

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            # deterministic forwards: the stochastic pieces (patchout,
            # dropout, pos-embed crop) are covered by their own tests
            return model.apply({"params": p}, mel_in, **kw)

        cfg = MeanTeacherConfig(
            strong_num=s, weak_num=w, unlabel_num=u, net_pooling=1,
            w_weak=self.W_WEAK, w_weak_cons=self.W_WEAK_CONS, w_at=self.W_AT,
            w_cons_max=self.W_CONS_MAX, w_cons_min=0.0,
            self_loss_warmup_steps=self.WARMUP, cons_scheduler="Sigmoid",
            mixup_prob=0.0, max_shift_frame=0, n_transform=0,
            stu_kwargs=dict(temp_w=self.TEMP_W), tch_kwargs=dict(temp_w=self.TEMP_W),
        )
        tx = optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.WD)
        step_fn = jax.jit(make_mean_teacher_step(model_apply, _IdentityFrontend(), tx, cfg))
        state = create_mean_teacher_state(params, tx)
        batch = {"wav": jnp.asarray(mel_np), "labels": jnp.asarray(labels_np)}
        jax_losses = []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            jax_losses.append(float(metrics["loss_total"]))

        np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-5, rtol=2e-5)

        # final forwards: student (trained params) and teacher (EMA chain)
        out = model.apply({"params": state.params}, jnp.asarray(mel_np), temp_w=self.TEMP_W)
        with torch.no_grad():
            t_strong, t_weak, t_at = self._torch_forward(stu_parts, mel)
        np.testing.assert_allclose(np.asarray(out.strong), t_strong.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.weak), t_weak.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.at_out), t_at.numpy(), atol=2e-4)

        tout = model.apply({"params": state.teacher_params}, jnp.asarray(mel_np),
                           temp_w=self.TEMP_W)
        with torch.no_grad():
            e_strong, e_weak, e_at = self._torch_forward(tch_parts, mel)
        np.testing.assert_allclose(np.asarray(tout.strong), e_strong.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(tout.weak), e_weak.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(tout.at_out), e_at.numpy(), atol=2e-4)


class TestMLMTrainStepTorchParity:
    """MLM pretraining-step parity: the reference loop
    (mlm_passt/train.py:16-49 — MSE between the pre-mask frames and the
    reconstruction at masked ids, AdamW) rebuilt in torch and stepped
    three times against ``make_mlm_step`` with shared weights. Masking
    is made deterministic (mask_rate=1, style=(1,0,0): every frame
    becomes the mask token), so the trajectories must agree exactly.
    Notably this pins the no-stop-gradient semantics on
    frame_before_mask: the reference backpropagates through the target
    branch too (train.py:38), so backbone/f_pool receive grads even
    though the all-masked decoder input carries none."""

    N_STEPS = 3
    LR, WD = 1e-3, 1e-2

    def test_three_steps_match(self):
        import copy
        import math

        import optax
        import torch.nn.functional as F

        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.train.mlm import MLMConfig, create_mlm_state, make_mlm_step
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        d, heads, T = D, HEADS, 200
        B = 3
        mt = TestMeanTeacherTrainStepTorchParity()
        _, base = mt._build_torch_weights(seed=7)
        model, xl = base["model"], base["xl"]
        parts = {
            "model": model,
            "xl": xl,
            "out_norm_w": base["out_norm_w"],
            "out_norm_b": base["out_norm_b"],
            "mask_token": (torch.randn(1, 1, d) * 0.02).requires_grad_(),
            "fc1_w": (torch.randn(d, d) * 0.1).requires_grad_(),
            "fc1_b": (torch.randn(d) * 0.02).requires_grad_(),
            "fc2_w": (torch.randn(d, d) * 0.1).requires_grad_(),
            "fc2_b": (torch.randn(d) * 0.02).requires_grad_(),
        }

        def plist(p):
            return (
                list(p["model"].parameters())
                + [p["xl"][k] for k in sorted(p["xl"])]
                + [p[k] for k in ("out_norm_w", "out_norm_b", "mask_token",
                                  "fc1_w", "fc1_b", "fc2_w", "fc2_b")]
            )

        sd = {f"backbone.{k}": np.copy(v) for k, v in model.reference_state_dict().items()}
        sd.update({f"decoder.encoder_blocks.0.{k}": np.copy(v.detach().numpy())
                   for k, v in xl.items()})
        sd["out_norm.weight"] = np.copy(parts["out_norm_w"].detach().numpy())
        sd["out_norm.bias"] = np.copy(parts["out_norm_b"].detach().numpy())
        sd["mask_token"] = np.copy(parts["mask_token"].detach().numpy())
        sd["mlm_mlp.0.weight"] = np.copy(parts["fc1_w"].detach().numpy())
        sd["mlm_mlp.0.bias"] = np.copy(parts["fc1_b"].detach().numpy())
        sd["mlm_mlp.2.weight"] = np.copy(parts["fc2_w"].detach().numpy())
        sd["mlm_mlp.2.bias"] = np.copy(parts["fc2_b"].detach().numpy())

        rng = np.random.RandomState(5)
        mel_np = (rng.randn(B, *IMG) * 0.5).astype(np.float32)
        mel = torch.tensor(mel_np)

        def t_forward(p):
            frame, taps = p["model"](mel.unsqueeze(1))
            h = taps[DEPTH][:, 2:, :]
            h = F.layer_norm(h, (d,), p["out_norm_w"], p["out_norm_b"], eps=1e-5)
            h = h.reshape(B, 2, 19, d).mean(dim=1)
            h = torch.cat((h, h[:, -1, :].unsqueeze(1)), dim=1)
            h = F.interpolate(h.transpose(1, 2), scale_factor=10, mode="linear").transpose(1, 2)
            frame_before_mask = h
            masked = p["mask_token"].expand(B, T, d)
            xlp = TestXLDecoderTorchParity()
            pos = xlp._torch_pos_emb(T, d)
            dec = xlp._torch_block(masked * math.sqrt(d), p["xl"], pos, heads)
            pred = F.gelu(dec @ p["fc1_w"].t() + p["fc1_b"]) @ p["fc2_w"].t() + p["fc2_b"]
            return frame_before_mask, pred

        opt = torch.optim.AdamW(plist(parts), lr=self.LR, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=self.WD)
        torch_losses = []
        for _ in range(self.N_STEPS):
            opt.zero_grad()
            target, pred = t_forward(parts)
            # mask_ids is all-True -> MSELoss over every element
            loss = F.mse_loss(target, pred)
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.detach()))

        init_kwargs = dict(
            class_num=3, embed_dim=d, decoder_dim=d, backbone_depth=DEPTH,
            backbone_num_heads=heads, decoder_num_heads=heads,
            passt_feature_layer=DEPTH, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=T, at_adapter=False,
            backbone_img_size=IMG, mlm=True,
            mlm_dict=dict(mask_rate=1.0, mask_style=(1.0, 0.0, 0.0), strategy="random"),
        )
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        flax_model = PaSST_SED(**init_kwargs)

        class _IdentityFrontend:
            def __call__(self, wav, key=None, training=False):
                return wav

            def normalize(self, m):
                return m

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return flax_model.apply({"params": p}, mel_in, rngs=rngs, **kw)

        cfg = MLMConfig(max_shift_frame=0, transform_choice=(0, 0, 0, 0))
        tx = optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.WD)
        step_fn = jax.jit(make_mlm_step(model_apply, _IdentityFrontend(), tx, cfg))
        state = create_mlm_state(params, tx)
        batch = {"wav": jnp.asarray(mel_np)}
        jax_losses = []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            jax_losses.append(float(metrics["loss_mlm"]))

        np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-5, rtol=2e-5)


class TestRefBatchNormTorchParity:
    """RefBatchNorm vs torch.nn.BatchNorm2d: train-mode outputs, the
    running-statistics trajectory over several steps (torch momentum
    convention + Bessel-corrected running var — semantics flax's
    nn.BatchNorm does NOT have), and the eval-mode forward that
    consumes the accumulated stats."""

    @pytest.mark.parametrize("momentum", [0.99, 0.1])
    def test_stats_trajectory_and_eval(self, momentum):
        from transformer4sed_tpu.models.norm import RefBatchNorm

        C, steps = 5, 4
        tbn = tnn.BatchNorm2d(C, eps=1e-3, momentum=momentum)
        with torch.no_grad():
            tbn.weight.copy_(torch.rand(C) + 0.5)
            tbn.bias.copy_(torch.randn(C) * 0.1)
        train_bn = RefBatchNorm(use_running_average=False, momentum=momentum, epsilon=1e-3)
        eval_bn = RefBatchNorm(use_running_average=True, momentum=momentum, epsilon=1e-3)

        rng = np.random.RandomState(0)
        variables = {
            "params": {
                "scale": jnp.asarray(tbn.weight.detach().numpy()),
                "bias": jnp.asarray(tbn.bias.detach().numpy()),
            },
            "batch_stats": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
        }
        tbn.train()
        for i in range(steps):
            x = (rng.randn(2, C, 4, 6) * (1.0 + i) + i).astype(np.float32)
            t_out = tbn(torch.tensor(x))
            # flax layout: channels last
            xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
            j_out, mutated = train_bn.apply(variables, xj, mutable=["batch_stats"])
            variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
            np.testing.assert_allclose(
                np.transpose(np.asarray(j_out), (0, 3, 1, 2)),
                t_out.detach().numpy(), atol=1e-5,
            )
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-6,
        )

        tbn.eval()
        x = rng.randn(2, C, 4, 6).astype(np.float32)
        t_out = tbn(torch.tensor(x))
        j_out = eval_bn.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.transpose(np.asarray(j_out), (0, 3, 1, 2)),
            t_out.detach().numpy(), atol=1e-5,
        )


class TestSupervisedTrainStepTorchParity:
    """AudioSet-strong supervised step parity with a BatchNorm model:
    the reference loop (base/passt_cnn/train.py — ASL on strong frames,
    AdamW, train-mode BN updating running stats each forward) rebuilt in
    torch on a GLU+BN conv stack, vs ``make_supervised_step`` threading
    ``batch_stats`` through ``model_state``. Pins RefBatchNorm *inside a
    jitted step*: per-step losses, the final running statistics, and the
    eval-mode forward that consumes them must all match torch."""

    N_STEPS = 3
    LR = 1e-2
    RP, RN, MARGIN = 0.5, 2.0, 0.05
    # plain SGD, not AdamW: Adam normalizes the update by |grad|, so
    # noise-level fp32 gradient differences become O(lr) parameter
    # differences on flat directions and the BN running stats drift past
    # tight tolerances. The AdamW chain is pinned by the mean-teacher
    # and MLM step-parity tests; THIS test pins BN-in-step semantics.

    def test_three_steps_match(self):
        import flax.linen as fnn
        import optax
        import torch.nn.functional as F

        from transformer4sed_tpu.models.cnn import CNN
        from transformer4sed_tpu.models.sed_model import SEDOutput
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState
        from transformer4sed_tpu.utils.torch_import import convert_cnn

        torch.manual_seed(11)
        filters, C, Fdim, T = [8, 12], 3, 16, 16
        B = 4

        layers, sd = [], {}
        cin = 1
        for i, cout in enumerate(filters):
            conv = tnn.Conv2d(cin, cout, 3, 1, 1)
            # reference CNN stack BN: eps=0.001, torch momentum=0.99 (base.py:75)
            bn = tnn.BatchNorm2d(cout, eps=0.001, momentum=0.99)
            glu = tnn.Linear(cout, cout)
            layers.append((conv, bn, glu))
            sd[f"cnn.conv{i}.weight"] = np.copy(conv.weight.detach().numpy())
            sd[f"cnn.conv{i}.bias"] = np.copy(conv.bias.detach().numpy())
            sd[f"cnn.batchnorm{i}.weight"] = np.copy(bn.weight.detach().numpy())
            sd[f"cnn.batchnorm{i}.bias"] = np.copy(bn.bias.detach().numpy())
            sd[f"cnn.batchnorm{i}.running_mean"] = np.copy(bn.running_mean.numpy())
            sd[f"cnn.batchnorm{i}.running_var"] = np.copy(bn.running_var.numpy())
            sd[f"cnn.glu{i}.linear.weight"] = np.copy(glu.weight.detach().numpy())
            sd[f"cnn.glu{i}.linear.bias"] = np.copy(glu.bias.detach().numpy())
            cin = cout
        head_w = (torch.randn(C, filters[-1]) * 0.1).requires_grad_()
        head_b = (torch.randn(C) * 0.02).requires_grad_()
        # snapshot BEFORE the in-place AdamW steps below
        head_w0 = np.copy(head_w.detach().numpy())
        head_b0 = np.copy(head_b.detach().numpy())

        rng = np.random.RandomState(2)
        mel_np = (rng.randn(B, Fdim, T) * 0.5).astype(np.float32)
        labels_np = (rng.rand(B, C, T) > 0.8).astype(np.float32)

        # ---------------- torch: reference loop ----------------
        def t_forward(train):
            h = torch.tensor(mel_np).permute(0, 2, 1).unsqueeze(1)  # [B,1,T,F]
            for conv, bn, glu in layers:
                bn.train(train)
                h = bn(conv(h))
                lin = glu(h.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                h = lin * torch.sigmoid(h)
                h = F.avg_pool2d(h, (1, 2))
            feat = h.mean(-1).transpose(1, 2)  # [B, T, C_feat]
            strong = torch.sigmoid(feat @ head_w.t() + head_b).transpose(1, 2)
            return strong  # [B, C, T]

        def t_asl(pred, target):
            pred_m = torch.clamp_min(pred - self.MARGIN, 0.0)
            losses = -(((1 - pred) ** self.RP) * target
                       * torch.clamp_min(torch.log(pred), -100)
                       + (pred_m ** self.RN) * (1 - target)
                       * torch.clamp_min(torch.log(1 - pred_m), -100))
            return losses.mean()

        plist = [p for conv, bn, glu in layers for p in
                 list(conv.parameters()) + list(bn.parameters()) + list(glu.parameters())]
        plist += [head_w, head_b]
        opt = torch.optim.SGD(plist, lr=self.LR)
        target = torch.tensor(labels_np)
        torch_losses = []
        for _ in range(self.N_STEPS):
            opt.zero_grad()
            loss = t_asl(t_forward(train=True), target)
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.detach()))
        with torch.no_grad():
            t_eval = t_forward(train=False)

        # ---------------- jax: make_supervised_step ----------------
        cnn_params, cnn_stats = convert_cnn(sd)

        class TinySup(fnn.Module):
            @fnn.compact
            def __call__(self, x, train=False):  # x [B, 1, T, F]
                h = CNN(n_in_channel=1, nb_filters=filters, kernel_size=[3, 3],
                        padding=[1, 1], stride=[1, 1], pooling=[(1, 2), (1, 2)],
                        activation="glu", normalization="batch", name="cnn")(x, train=train)
                feat = jnp.mean(h, axis=-1).transpose(0, 2, 1)  # [B, T, C_feat]
                logits = fnn.Dense(C, name="head")(feat)
                return jax.nn.sigmoid(logits).transpose(0, 2, 1)

        module = TinySup()
        params = {
            "cnn": cnn_params,
            "head": {"kernel": jnp.asarray(head_w0.T), "bias": jnp.asarray(head_b0)},
        }
        batch_stats = {"cnn": cnn_stats}

        def model_apply(p, mel, train=False, rngs=None, model_state=None, **kw):
            x = mel.transpose(0, 2, 1)[:, None]  # [B,F,T] -> [B,1,T,F]
            if train:
                strong, mut = module.apply(
                    {"params": p, "batch_stats": model_state}, x, train=True,
                    mutable=["batch_stats"],
                )
                return SEDOutput(strong=strong), mut["batch_stats"]
            return SEDOutput(strong=module.apply(
                {"params": p, "batch_stats": model_state}, x, train=False)), model_state

        class _IdentityFrontend:
            def __call__(self, wav, key=None, training=False):
                return wav

            def normalize(self, m):
                return m

        cfg = SupervisedConfig(
            loss_name="AslLoss",
            loss_kwargs=dict(rp=self.RP, rn=self.RN, margin=self.MARGIN),
            max_shift_frame=0, mixup_prob=0.0, transform_choice=(0, 0, 0, 0),
        )
        tx = optax.sgd(self.LR)
        step_fn = jax.jit(make_supervised_step(model_apply, _IdentityFrontend(), tx, cfg))
        state = MLMState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32), model_state=batch_stats)
        batch = {"wav": jnp.asarray(mel_np), "labels": jnp.asarray(labels_np)}
        jax_losses = []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            jax_losses.append(float(metrics["loss_class_strong"]))

        np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-5, rtol=2e-5)

        # running statistics trajectories agree exactly
        for i, (conv, bn, glu) in enumerate(layers):
            np.testing.assert_allclose(
                np.asarray(state.model_state["cnn"][f"norm{i}"]["mean"]),
                bn.running_mean.numpy(), atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(state.model_state["cnn"][f"norm{i}"]["var"]),
                bn.running_var.numpy(), rtol=1e-5,
            )

        # eval-mode forward consuming the trained stats
        out, _ = model_apply(state.params, jnp.asarray(mel_np), train=False,
                             model_state=state.model_state)
        np.testing.assert_allclose(np.asarray(out.strong), t_eval.numpy(), atol=5e-5)


class TestDASMCELossTorchParity:
    """DASM closed-set AT loss parity: the reference trains 'logit'
    out_type with torch CrossEntropyLoss on SOFT multi-class targets,
    channel-first via transpose(1, 2)
    (detect_any_sound/passt/train.py:40,92-96 with
    multi_label_to_multi_class building [0..p..0, 1-p] rows from pooled
    weak probabilities). Pins `_ce_multiclass` + the target transform to
    that exact call, including the reduction over (B, Q)."""

    def test_matches_reference_cross_entropy(self):
        from transformer4sed_tpu.recipes.dasm_recipe import _ce_multiclass

        torch.manual_seed(0)
        B, Q = 3, 5  # Q queries == C classes in the closed set
        logits = torch.randn(B, Q, Q + 1) * 1.5
        weak = torch.rand(B, Q)  # soft pooled probabilities

        mc = torch.zeros(B, Q, Q + 1)
        mc[:, :, :-1] = torch.eye(Q) * weak.unsqueeze(-1)
        mc[:, :, -1] = 1 - weak
        ref = torch.nn.CrossEntropyLoss()(
            input=logits.transpose(1, 2), target=mc.transpose(1, 2)
        )

        ours = _ce_multiclass(jnp.asarray(logits.numpy()), jnp.asarray(weak.numpy()))
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-6)


class TestHTSATFrontendTorchParity:
    """HTSAT wav->log-mel frontend parity vs the torchlibrosa semantics
    the reference freezes (htsat.py:698-723: hann periodic window,
    center=True reflect padding, power=2 spectrogram, librosa SLANEY mel
    banks fmin=50/fmax=14000, power_to_db with ref=1, amin=1e-10,
    top_db=None). The torch side rebuilds the whole pipeline
    independently here (torchlibrosa itself is not in the image),
    including the slaney mel scale and filter normalization."""

    def test_wav_to_logmel_matches(self):
        from transformer4sed_tpu.models.htsat import HTSATFrontend

        sr, n_fft, hop, n_mels, fmin, fmax = 32000, 1024, 320, 64, 50.0, 14000.0
        rng = np.random.RandomState(3)
        wav = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)

        # --- torch: STFT power spectrogram, torchlibrosa config ---
        x = torch.tensor(wav)
        spec = torch.stft(
            x, n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft, periodic=True),
            center=True, pad_mode="reflect", normalized=False,
            return_complex=True,
        ).abs() ** 2  # [B, bins, T]

        # --- librosa slaney mel banks, rebuilt from the formulas ---
        def hz_to_mel(f):
            f = np.asarray(f, dtype=np.float64)
            f_sp = 200.0 / 3
            mels = f / f_sp
            min_log_hz = 1000.0
            min_log_mel = min_log_hz / f_sp
            logstep = np.log(6.4) / 27.0
            return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)

        def mel_to_hz(m):
            m = np.asarray(m, dtype=np.float64)
            f_sp = 200.0 / 3
            freqs = f_sp * m
            min_log_hz = 1000.0
            min_log_mel = min_log_hz / f_sp
            logstep = np.log(6.4) / 27.0
            return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)

        mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
        fft_f = np.linspace(0, sr / 2, 1 + n_fft // 2)
        fdiff = np.diff(mel_f)
        ramps = mel_f[:, None] - fft_f[None, :]
        lower = -ramps[:-2] / fdiff[:-1, None]
        upper = ramps[2:] / fdiff[1:, None]
        weights = np.maximum(0, np.minimum(lower, upper))
        weights *= (2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels]))[:, None]  # slaney norm
        basis = torch.tensor(weights.astype(np.float32))  # [n_mels, bins]

        mel = torch.einsum("mf,bft->btm", basis, spec)
        ref_logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))  # ref=1, top_db=None

        # --- ours ---
        fe = HTSATFrontend(sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
                           fmin=fmin, fmax=fmax)
        ours = np.asarray(fe(jnp.asarray(wav)))[:, 0]  # [B, T, n_mels]
        assert ours.shape == tuple(ref_logmel.shape)
        np.testing.assert_allclose(ours, ref_logmel.numpy(), atol=5e-4)


class TestASTFrontendTorchParity:
    """AST Kaldi-fbank frontend parity: torchaudio.compliance.kaldi.fbank
    with the reference's exact args (ast_feature_extraction.py:38-49 —
    htk_compat, hanning window, dither=0, 25ms/10ms, 128 bins) rebuilt
    here from the Kaldi algorithm (torchaudio itself is not in the
    image): snip-edges framing, per-frame DC removal, preemphasis with
    the first-sample rule, SYMMETRIC hanning, rfft to the padded
    power-of-two size, un-normalized triangular mel banks on the
    1127*ln(1+f/700) scale excluding the nyquist bin, log with the
    float-eps floor — then the AST pad-to-1024 + AudioSet
    normalization."""

    def test_wav_to_fbank_matches(self):
        from transformer4sed_tpu.models.ast import ASTFrontend

        sr, n_mels, frame_len, hop, n_fft, target = 16000, 128, 400, 160, 512, 1024
        rng = np.random.RandomState(4)
        wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)

        x = torch.tensor(wav)
        x = x - x.mean(-1, keepdim=True)  # reference wrapper's global DC removal
        frames = x.unfold(-1, frame_len, hop)  # snip_edges [B, T, 400]
        frames = frames - frames.mean(-1, keepdim=True)  # remove_dc_offset
        pre = 0.97
        first = frames[..., :1] * (1.0 - pre)
        rest = frames[..., 1:] - pre * frames[..., :-1]
        frames = torch.cat([first, rest], dim=-1)
        frames = frames * torch.hann_window(frame_len, periodic=False)
        spec = torch.fft.rfft(frames, n=n_fft).abs() ** 2  # [B, T, 257]

        # kaldi get_mel_banks: htk mel scale, (num_bins+1) segments between
        # low=20 Hz and high=nyquist, triangles over the 256 non-nyquist
        # fft bins, no area normalization; nyquist column is zero
        def mel(f):
            return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

        low, high = 20.0, sr / 2
        mel_low, mel_high = mel(low), mel(high)
        mel_delta = (mel_high - mel_low) / (n_mels + 1)
        fft_freqs = (sr / n_fft) * np.arange(n_fft // 2)  # exclude nyquist
        m = mel(fft_freqs)
        banks = np.zeros((n_mels, n_fft // 2 + 1), np.float64)
        for j in range(n_mels):
            left = mel_low + j * mel_delta
            center = left + mel_delta
            right = center + mel_delta
            up = (m - left) / (center - left)
            down = (right - m) / (right - center)
            banks[j, : n_fft // 2] = np.clip(np.minimum(up, down), 0.0, None)
        basis = torch.tensor(banks.astype(np.float32))

        melspec = torch.einsum("mf,btf->btm", basis, spec)
        fbank = torch.log(torch.clamp(melspec, min=1.1921e-07))
        fbank = torch.nn.functional.pad(fbank, (0, 0, 0, target - fbank.shape[1]))
        fbank = (fbank - (-4.2677393)) / (4.5689974 * 2)
        ref = fbank.transpose(1, 2).numpy()  # [B, F, T]

        fe = ASTFrontend()
        ours = np.asarray(fe(jnp.asarray(wav)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4)
