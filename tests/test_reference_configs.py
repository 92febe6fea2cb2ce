"""The reference's own shipped YAML configs drive this framework.

SURVEY.md §7.1 requires the reference's configs to "port with path
edits"; these tests go further and consume them VERBATIM from
``/root/reference/config`` (skipped when the reference checkout is not
present): include resolution (repo-root-relative base_path, base-wins
key semantics), codec + median filter + loss factory + optimizer
construction, and full-size model construction via ``jax.eval_shape``
(no weights materialised).
"""

import os

import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

REF_CONFIGS = [
    ("mat-sed/base/pretrain.yaml", "PaSST_SED"),
    ("mat-sed/base/finetune1.yaml", "PaSST_SED"),
    ("mat-sed/base/finetune2.yaml", "PaSST_SED"),
    ("pmam/post_pretrain.yaml", "PaSST_CNN"),
    ("pmam/finetune1.yaml", "PaSST_CNN"),
    ("pmam/finetune2.yaml", "PaSST_CNN"),
]


def _load(rel):
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    cfg = load_yaml_with_include(os.path.join(REF, rel))
    cfg["model_name"] = next(k for k in cfg if k in ("PaSST_SED", "PaSST_CNN"))
    return cfg


class TestReferenceConfigsLoad:
    @pytest.mark.parametrize("rel,name", REF_CONFIGS)
    def test_include_and_sections(self, rel, name):
        cfg = _load(rel)
        assert cfg["model_name"] == name
        # the include chain must deliver the shared sections
        for key in ("feature", "dataset", "training", "opt"):
            assert key in cfg, f"{rel} missing {key}"
        assert cfg["feature"]["n_mels"] == 128
        assert cfg["feature"]["sr"] == 32000

    def test_codec_filter_loss_optimizer(self):
        from transformer4sed_tpu.core.losses import loss_function_factory
        from transformer4sed_tpu.recipes import common

        cfg = _load("mat-sed/base/finetune1.yaml")
        codec = common.codec_from_config(cfg, labels=[f"c{i}" for i in range(10)])
        assert codec.n_frames == 1000

        widths = common.median_filter_from_config(cfg, codec)
        assert len(widths) == 10 and max(widths) > min(widths)

        loss = loss_function_factory(
            cfg["class_loss"]["loss_name"], cfg["class_loss"].get("kwargs") or {}
        )
        val = loss(jnp.full((2, 3), 0.3), jnp.zeros((2, 3)))
        assert jnp.isfinite(val)

        # param-group optimizer from the reference opt section (tiny tree
        # with the real top-level group names)
        params = {
            "backbone": {"w": jnp.zeros((2, 2))},
            "decoder": {"w": jnp.zeros((2, 2))},
            "classifier": {"w": jnp.zeros((2,))},
        }
        tx, labels = common.optimizer_from_config(params, cfg, steps_per_epoch=10)
        state = tx.init(params)
        assert state is not None


class TestReferenceConfigsBuildModels:
    @pytest.mark.parametrize("rel,name", REF_CONFIGS)
    def test_full_size_model_constructs(self, rel, name):
        """build_model consumes the reference section (incl. the nested
        PaSST_CNN {passt_sed_param, cnn_param} + lora_config layouts) and
        the full-size model's init traces: ~100M params, correct mel in."""
        from transformer4sed_tpu.recipes import common
        from transformer4sed_tpu.recipes.cli import build_model

        cfg = _load(rel)
        model, frontend = build_model(cfg)
        kw = common.model_init_kwargs(cfg, name)

        mel = jax.eval_shape(
            lambda w: frontend.normalize(frontend(w)),
            jax.ShapeDtypeStruct((1, 320000), jnp.float32),
        )
        assert mel.shape == (1, 128, 1000)
        rngs = {"params": jax.random.PRNGKey(0)}
        if kw.get("mlm") or (kw.get("passt_sed_param") or {}).get("mlm"):
            rngs["mlm"] = jax.random.PRNGKey(1)
        shapes = jax.eval_shape(
            lambda: model.init(rngs, jnp.zeros(mel.shape, mel.dtype))
        )
        n_params = sum(
            int(jnp.prod(jnp.asarray(x.shape)))
            for x in jax.tree_util.tree_leaves(shapes["params"])
        )
        assert n_params > 90e6, f"{rel}: {n_params/1e6:.1f}M params"


class TestLoRACkptPolicy:
    """lora_ckpt_merged resolution order: CLI > config > default-merged
    (the published-artifact convention, pmam/main.py:202-205)."""

    def test_default_is_merged(self):
        from transformer4sed_tpu.recipes.common import lora_ckpt_merged

        assert lora_ckpt_merged({"model_name": "PaSST_SED"}) is True

    def test_config_key_wins_over_default(self):
        from transformer4sed_tpu.recipes.common import lora_ckpt_merged

        cfg = {
            "model_name": "PaSST_SED",
            "PaSST_SED": {"init_kwargs": {
                "lora_config": {"r": 4, "lora_alpha": 1,
                                "merged_checkpoint": False}}},
        }
        assert lora_ckpt_merged(cfg) is False

    def test_cli_wins_over_config(self):
        from transformer4sed_tpu.recipes.common import lora_ckpt_merged

        cfg = {
            "model_name": "PaSST_SED",
            "PaSST_SED": {"init_kwargs": {
                "lora_config": {"r": 4, "merged_checkpoint": False}}},
        }
        assert lora_ckpt_merged(cfg, "merged") is True
        assert lora_ckpt_merged(cfg, "unmerged") is False

    def test_nested_passt_cnn_layout(self):
        from transformer4sed_tpu.recipes.common import lora_ckpt_merged

        cfg = {
            "model_name": "PaSST_CNN",
            "PaSST_CNN": {"init_kwargs": {"passt_sed_param": {
                "lora_config": {"r": 4, "merged_checkpoint": False}}}},
        }
        assert lora_ckpt_merged(cfg) is False

    def test_bad_cli_choice_raises(self):
        import pytest as _pytest

        from transformer4sed_tpu.recipes.common import lora_ckpt_merged

        with _pytest.raises(ValueError):
            lora_ckpt_merged({}, "sideways")
