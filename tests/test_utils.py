"""Utils tests: YAML include, checkpoint roundtrip, partial load, torch import."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from transformer4sed_tpu.utils.checkpoint import (
    load_partial,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    save_params,
)
from transformer4sed_tpu.utils.config import load_yaml_with_include, save_config
from transformer4sed_tpu.utils.torch_import import (
    check_tree_compatible,
    convert_passt_sed,
)

KEY = jax.random.PRNGKey(0)


class TestConfig:
    def test_include(self, tmp_path):
        base = {"training": {"lr": 1}, "feature": {"n_mels": 128}, "other": 5}
        with open(tmp_path / "base.yaml", "w") as f:
            yaml.safe_dump(base, f)
        child = {
            "include": {"base_path": "base.yaml", "keys": ["training", "feature"]},
            "feature": {"n_mels": 64},
            "generals": {"x": 1},
        }
        with open(tmp_path / "child.yaml", "w") as f:
            yaml.safe_dump(child, f)
        cfg = load_yaml_with_include(str(tmp_path / "child.yaml"))
        assert cfg["training"] == {"lr": 1}  # pulled from base
        # reference semantics (src/utils/__init__.py:33-35): listed keys
        # come from the base, overwriting a same-named local section
        assert cfg["feature"] == {"n_mels": 128}
        assert cfg["generals"] == {"x": 1}  # unlisted local key kept
        assert "other" not in cfg
        assert "include" not in cfg

    def test_include_config_root_relative(self, tmp_path):
        """The reference's shipped configs use ./config/...-rooted include
        paths (config/mat-sed/base/finetune2.yaml:2); they must resolve
        from any cwd by anchoring at the including file's config/ root."""
        d = tmp_path / "config" / "fam"
        d.mkdir(parents=True)
        with open(d / "base.yaml", "w") as f:
            yaml.safe_dump({"feature": {"sr": 32000}}, f)
        with open(d / "child.yaml", "w") as f:
            yaml.safe_dump(
                {"include": {"base_path": "./config/fam/base.yaml", "keys": ["feature"]}},
                f,
            )
        cfg = load_yaml_with_include(str(d / "child.yaml"))
        assert cfg["feature"] == {"sr": 32000}

    def test_include_anchors_at_last_config_dir(self, tmp_path):
        """A checkout living under a path that itself contains /config/
        must anchor ./config/... includes at the LAST config/ before the
        including file, not the first occurrence in the absolute path."""
        inner = tmp_path / "config" / "t4sed" / "config" / "fam"
        inner.mkdir(parents=True)
        # decoy at the OUTER anchor: picking the first /config/ would hit it
        decoy = tmp_path / "config" / "fam"
        decoy.mkdir(parents=True)
        with open(decoy / "base.yaml", "w") as f:
            yaml.safe_dump({"feature": {"sr": -1}}, f)
        with open(inner / "base.yaml", "w") as f:
            yaml.safe_dump({"feature": {"sr": 32000}}, f)
        with open(inner / "child.yaml", "w") as f:
            yaml.safe_dump(
                {"include": {"base_path": "./config/fam/base.yaml", "keys": ["feature"]}},
                f,
            )
        cfg = load_yaml_with_include(str(inner / "child.yaml"))
        assert cfg["feature"] == {"sr": 32000}

    def test_save(self, tmp_path):
        p = save_config({"a": 1}, str(tmp_path / "out"))
        assert os.path.exists(p)


class TestCheckpoint:
    def test_sibling_model_state_teacher_pairing(self, tmp_path):
        """Teacher checkpoints load the teacher's OWN BatchNorm stats
        (the trees diverge by design); student checkpoints the student's;
        stat-less checkpoints return None."""
        from transformer4sed_tpu.recipes.common import sibling_model_state

        best = tmp_path / "best"
        save_params(str(best / "best_student"), {"w": jnp.zeros((2,))})
        save_params(str(best / "best_teacher"), {"w": jnp.ones((2,))})
        save_params(str(best / "best_model_state"),
                    {"batch_stats": {"m": jnp.asarray([1.0])}})
        save_params(str(best / "best_model_state_teacher"),
                    {"batch_stats": {"m": jnp.asarray([2.0])}})
        s = sibling_model_state(str(best / "best_student"))
        t = sibling_model_state(str(best / "best_teacher"))
        assert float(np.asarray(s["batch_stats"]["m"])[0]) == 1.0
        assert float(np.asarray(t["batch_stats"]["m"])[0]) == 2.0
        # teacher falls back to the shared stats when no teacher dir exists
        import shutil

        shutil.rmtree(best / "best_model_state_teacher")
        t2 = sibling_model_state(str(best / "best_teacher"))
        assert float(np.asarray(t2["batch_stats"]["m"])[0]) == 1.0
        assert sibling_model_state(str(tmp_path / "nowhere" / "ckpt")) is None

    def test_params_roundtrip(self, tmp_path):
        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": {"x": jnp.ones((4,))}}
        path = save_params(str(tmp_path / "p"), params)
        restored = restore_params(path)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(params["w"]))
        np.testing.assert_array_equal(np.asarray(restored["b"]["x"]), 1.0)

    def test_state_roundtrip(self, tmp_path):
        import optax

        from transformer4sed_tpu.train.mean_teacher import create_mean_teacher_state

        params = {"w": jnp.ones((3,))}
        tx = optax.adamw(1e-3)
        state = create_mean_teacher_state(params, tx)
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        path = save_checkpoint(str(tmp_path / "ck"), state)
        template = create_mean_teacher_state(params, tx)
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == 7

    def test_load_partial_drops(self):
        params = {"classifier": {"kernel": np.zeros((2, 2))}, "backbone": {"w": np.zeros(3)}}
        restored = {"classifier": {"kernel": np.ones((2, 2))}, "backbone": {"w": np.ones(3)}}
        out = load_partial(params, restored, drop_patterns=[r"classifier"])
        assert out["classifier"]["kernel"].sum() == 0  # dropped
        assert out["backbone"]["w"].sum() == 3  # loaded

    def test_load_partial_shape_mismatch_skipped(self):
        params = {"w": np.zeros((2,))}
        restored = {"w": np.ones((3,))}
        out = load_partial(params, restored)
        assert out["w"].shape == (2,)
        assert out["w"].sum() == 0


class TestTorchImport:
    def test_passt_sed_import_matches_init_tree(self):
        """Build a synthetic torch-style state dict with reference naming and
        shapes; the converted tree must exactly cover the flax init tree."""
        from transformer4sed_tpu.models.passt_sed import PaSST_SED

        d, depth, heads, dec_layers, classes = 32, 2, 4, 1, 5
        model = PaSST_SED(
            class_num=classes,
            embed_dim=d,
            decoder_dim=d,
            backbone_depth=depth,
            backbone_num_heads=heads,
            decoder_num_heads=heads,
            at_adapter_heads=heads,
            passt_feature_layer=2,
            decoder="transformerXL",
            decoder_layer_num=dec_layers,
            decoder_pos_emd_len=200,
            at_adapter=True,
        )
        template = model.init({"params": KEY}, jnp.zeros((1, 128, 200)))["params"]

        rng = np.random.RandomState(0)
        f_grid, t_grid = 12, 99  # nominal (128, 998) grid
        sd = {
            "patch_embed.proj.weight": rng.randn(d, 1, 16, 16).astype(np.float32),
            "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
            "cls_token": rng.randn(1, 1, d).astype(np.float32),
            "dist_token": rng.randn(1, 1, d).astype(np.float32),
            "new_pos_embed": rng.randn(1, 2, d).astype(np.float32),
            "freq_new_pos_embed": rng.randn(1, d, f_grid, 1).astype(np.float32),
            "time_new_pos_embed": rng.randn(1, d, 1, t_grid).astype(np.float32),
            "norm.weight": np.ones(d, np.float32),
            "norm.bias": np.zeros(d, np.float32),
        }
        sd = {f"backbone.{k}": v for k, v in sd.items()}
        for i in range(depth):
            p = f"backbone.blocks.{i}"
            sd.update(
                {
                    f"{p}.norm1.weight": np.ones(d, np.float32),
                    f"{p}.norm1.bias": np.zeros(d, np.float32),
                    f"{p}.attn.qkv.weight": rng.randn(3 * d, d).astype(np.float32),
                    f"{p}.attn.qkv.bias": rng.randn(3 * d).astype(np.float32),
                    f"{p}.attn.proj.weight": rng.randn(d, d).astype(np.float32),
                    f"{p}.attn.proj.bias": rng.randn(d).astype(np.float32),
                    f"{p}.norm2.weight": np.ones(d, np.float32),
                    f"{p}.norm2.bias": np.zeros(d, np.float32),
                    f"{p}.mlp.fc1.weight": rng.randn(4 * d, d).astype(np.float32),
                    f"{p}.mlp.fc1.bias": rng.randn(4 * d).astype(np.float32),
                    f"{p}.mlp.fc2.weight": rng.randn(d, 4 * d).astype(np.float32),
                    f"{p}.mlp.fc2.bias": rng.randn(d).astype(np.float32),
                }
            )
        sd.update(
            {
                "out_norm.weight": np.ones(d, np.float32),
                "out_norm.bias": np.zeros(d, np.float32),
                "classifier.weight": rng.randn(classes, d).astype(np.float32),
                "classifier.bias": rng.randn(classes).astype(np.float32),
                "at_adpater.0.f_att_token": rng.randn(1, 1, d).astype(np.float32),
                "at_adpater.0.frequency_att.in_proj_weight": rng.randn(3 * d, d).astype(np.float32),
                "at_adpater.0.frequency_att.in_proj_bias": rng.randn(3 * d).astype(np.float32),
                "at_adpater.0.frequency_att.out_proj.weight": rng.randn(d, d).astype(np.float32),
                "at_adpater.0.frequency_att.out_proj.bias": rng.randn(d).astype(np.float32),
                "at_adpater.1.weight": rng.randn(classes, d).astype(np.float32),
                "at_adpater.1.bias": rng.randn(classes).astype(np.float32),
            }
        )
        for i in range(dec_layers):
            p = f"decoder.encoder_blocks.{i}"
            sd.update(
                {
                    f"{p}.norm1.weight": np.ones(d, np.float32),
                    f"{p}.norm1.bias": np.zeros(d, np.float32),
                    f"{p}.attn.in_proj.weight": rng.randn(3 * d, d).astype(np.float32),
                    f"{p}.attn.in_proj.bias": rng.randn(3 * d).astype(np.float32),
                    f"{p}.attn.out_proj.weight": rng.randn(d, d).astype(np.float32),
                    f"{p}.attn.out_proj.bias": rng.randn(d).astype(np.float32),
                    f"{p}.attn.linear_pos.weight": rng.randn(d, d).astype(np.float32),
                    f"{p}.attn.pos_bias_u": rng.randn(heads, d // heads).astype(np.float32),
                    f"{p}.attn.pos_bias_v": rng.randn(heads, d // heads).astype(np.float32),
                    f"{p}.norm2.weight": np.ones(d, np.float32),
                    f"{p}.norm2.bias": np.zeros(d, np.float32),
                    f"{p}.mlp.fc1.weight": rng.randn(d, d).astype(np.float32),
                    f"{p}.mlp.fc1.bias": rng.randn(d).astype(np.float32),
                    f"{p}.mlp.fc2.weight": rng.randn(d, d).astype(np.float32),
                    f"{p}.mlp.fc2.bias": rng.randn(d).astype(np.float32),
                }
            )

        imported = convert_passt_sed(
            sd, backbone_depth=depth, decoder_layer_num=dec_layers, at_adapter_heads=heads
        )
        # the nominal pos embeds in the synthetic dict use the full 128x998
        # grid; our tiny test model uses the same nominal grid via img_size
        problems = check_tree_compatible(template, imported)
        assert problems == {}

        # converted weights must actually run
        from transformer4sed_tpu.models.passt_sed import PaSST_SED as _M

        out = model.apply({"params": imported}, jnp.zeros((1, 128, 200)))
        assert out.strong.shape[1] == 5

    def test_lora_import_unmerges_merged_checkpoints(self):
        """Reference LoRA checkpoints are saved MERGED (pmam/main.py:202
        `net.eval()` before state_dict) with lora_A/B still in the dict.
        Importing into a lora_rank>0 target must subtract the delta from
        the kernel — our LoRADense re-adds (alpha/r)·x@A@B at runtime, so
        keeping the merged kernel would double-count the adapter."""
        from transformer4sed_tpu.models.lora import LoRADense
        from transformer4sed_tpu.utils.torch_import import _dense

        rng = np.random.RandomState(7)
        d_in, d_out, r = 8, 6, 2
        w = rng.randn(d_out, d_in).astype(np.float32)  # torch [out, in]
        bias = rng.randn(d_out).astype(np.float32)
        lora_a = rng.randn(r, d_in).astype(np.float32)
        lora_b = rng.randn(d_out, r).astype(np.float32)
        scale = 1.0 / r  # reference lora_alpha=1 (config/pmam yaml)
        merged = w + scale * (lora_b @ lora_a)
        sd = {"x.weight": merged, "x.bias": bias, "x.lora_A": lora_a, "x.lora_B": lora_b}

        # dense target: keeps the merged kernel, ignores lora keys
        dense_params = _dense(sd, "x", lora=False)
        np.testing.assert_allclose(dense_params["kernel"], merged.T, atol=1e-6)
        assert "lora_A" not in dense_params

        # LoRA target: the runtime forward must equal the merged forward
        lora_params = _dense(sd, "x", lora=True)
        np.testing.assert_allclose(lora_params["kernel"], w.T, atol=1e-5)
        x = rng.randn(3, d_in).astype(np.float32)
        layer = LoRADense(features=d_out, rank=r, alpha=1.0)
        out = layer.apply({"params": jax.tree_util.tree_map(jnp.asarray, lora_params)}, x)
        np.testing.assert_allclose(np.asarray(out), x @ merged.T + bias, atol=1e-4)


class TestImageNetAdaptation:
    def test_adapt_pos_embed(self):
        from transformer4sed_tpu.utils.torch_import import adapt_image_pos_embed

        rng = np.random.RandomState(0)
        pos = rng.randn(1, 2 + 24 * 24, 32).astype(np.float32)
        tok, freq, time = adapt_image_pos_embed(pos, num_tokens=2, grid_size=(12, 99))
        assert tok.shape == (1, 2, 32)
        assert freq.shape == (1, 32, 12, 1)
        assert time.shape == (1, 32, 1, 99)

    def test_convert_imagenet_vit(self):
        from transformer4sed_tpu.models.passt import PaSST
        from transformer4sed_tpu.utils.torch_import import (
            check_tree_compatible,
            convert_imagenet_vit_to_passt,
        )

        d, depth = 32, 2
        rng = np.random.RandomState(1)
        sd = {
            "pos_embed": rng.randn(1, 2 + 4 * 4, d).astype(np.float32),
            "cls_token": rng.randn(1, 1, d).astype(np.float32),
            "dist_token": rng.randn(1, 1, d).astype(np.float32),
            "patch_embed.proj.weight": rng.randn(d, 3, 16, 16).astype(np.float32),
            "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
            "norm.weight": np.ones(d, np.float32),
            "norm.bias": np.zeros(d, np.float32),
        }
        for i in range(depth):
            p = f"blocks.{i}"
            sd.update({
                f"{p}.norm1.weight": np.ones(d, np.float32),
                f"{p}.norm1.bias": np.zeros(d, np.float32),
                f"{p}.attn.qkv.weight": rng.randn(3 * d, d).astype(np.float32),
                f"{p}.attn.qkv.bias": rng.randn(3 * d).astype(np.float32),
                f"{p}.attn.proj.weight": rng.randn(d, d).astype(np.float32),
                f"{p}.attn.proj.bias": rng.randn(d).astype(np.float32),
                f"{p}.norm2.weight": np.ones(d, np.float32),
                f"{p}.norm2.bias": np.zeros(d, np.float32),
                f"{p}.mlp.fc1.weight": rng.randn(4 * d, d).astype(np.float32),
                f"{p}.mlp.fc1.bias": rng.randn(4 * d).astype(np.float32),
                f"{p}.mlp.fc2.weight": rng.randn(d, 4 * d).astype(np.float32),
                f"{p}.mlp.fc2.bias": rng.randn(d).astype(np.float32),
            })
        grid = (2, 19)  # tiny model grid: img (32, 200)
        imported = convert_imagenet_vit_to_passt(sd, depth=depth, grid_size=grid)

        model = PaSST(embed_dim=d, depth=depth, num_heads=4, img_size=(32, 200), tap_layers=(2,))
        template = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1, 32, 200)))["params"]
        assert check_tree_compatible(template, imported) == {}
        out = model.apply({"params": imported}, jnp.zeros((1, 1, 32, 200)))
        assert out["frame"].shape[-1] == d


class TestHTSATImport:
    def test_convert_htsat_matches_init(self):
        from transformer4sed_tpu.models.htsat import HTSAT
        from transformer4sed_tpu.utils.torch_import import check_tree_compatible, convert_htsat

        model = HTSAT(
            spec_size=64, patch_size=4, num_classes=7, embed_dim=16,
            depths=(1, 1), num_heads=(2, 4), window_size=4, mel_bins=16,
        )
        mel = jnp.zeros((1, 1, 64, 16))
        template = model.init({"params": KEY}, mel)

        rng = np.random.RandomState(0)
        d = 16
        w = 4
        sd = {
            "patch_embed.proj.weight": rng.randn(d, 1, 4, 4).astype(np.float32),
            "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
            "patch_embed.norm.weight": np.ones(d, np.float32),
            "patch_embed.norm.bias": np.zeros(d, np.float32),
            "norm.weight": np.ones(2 * d, np.float32),
            "norm.bias": np.zeros(2 * d, np.float32),
            "tscam_conv.weight": rng.randn(7, 2 * d, 2, 3).astype(np.float32),
            "tscam_conv.bias": rng.randn(7).astype(np.float32),
            "bn0.weight": np.ones(16, np.float32),
            "bn0.bias": np.zeros(16, np.float32),
            "bn0.running_mean": np.zeros(16, np.float32),
            "bn0.running_var": np.ones(16, np.float32),
        }
        for i, depth in enumerate((1, 1)):
            dim = d * 2 ** i
            heads = (2, 4)[i]
            for j in range(depth):
                p = f"layers.{i}.blocks.{j}"
                sd.update({
                    f"{p}.norm1.weight": np.ones(dim, np.float32),
                    f"{p}.norm1.bias": np.zeros(dim, np.float32),
                    f"{p}.attn.qkv.weight": rng.randn(3 * dim, dim).astype(np.float32),
                    f"{p}.attn.qkv.bias": rng.randn(3 * dim).astype(np.float32),
                    f"{p}.attn.proj.weight": rng.randn(dim, dim).astype(np.float32),
                    f"{p}.attn.proj.bias": rng.randn(dim).astype(np.float32),
                    f"{p}.attn.relative_position_bias_table": rng.randn((2 * w - 1) ** 2, heads).astype(np.float32),
                    f"{p}.norm2.weight": np.ones(dim, np.float32),
                    f"{p}.norm2.bias": np.zeros(dim, np.float32),
                    f"{p}.mlp.fc1.weight": rng.randn(4 * dim, dim).astype(np.float32),
                    f"{p}.mlp.fc1.bias": rng.randn(4 * dim).astype(np.float32),
                    f"{p}.mlp.fc2.weight": rng.randn(dim, 4 * dim).astype(np.float32),
                    f"{p}.mlp.fc2.bias": rng.randn(dim).astype(np.float32),
                })
        sd.update({
            "layers.0.downsample.norm.weight": np.ones(4 * d, np.float32),
            "layers.0.downsample.norm.bias": np.zeros(4 * d, np.float32),
            "layers.0.downsample.reduction.weight": rng.randn(2 * d, 4 * d).astype(np.float32),
        })
        imported = convert_htsat(sd, depths=(1, 1))
        problems = check_tree_compatible(template["params"], imported["params"])
        assert problems == {}, problems
        # imported weights must run
        out = model.apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]}, mel
        )
        assert out["clipwise_output"].shape == (1, 7)
