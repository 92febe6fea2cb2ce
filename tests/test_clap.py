"""CLAP-SED recipe tests: common-only training (with BatchNorm state
threading) and zero-shot open-set evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.models.htsat import HTSATFrontend
from transformer4sed_tpu.models.htsat_heads import CLAP_SED

KEY = jax.random.PRNGKey(0)

N_SAMPLES = 20160  # -> 64 mel frames -> 32 output frames (tiny HTSAT)
N_OUT_FRAMES = 32


class _FakeLoader:
    def __init__(self, batches):
        self.batches = list(batches)

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass


def _config():
    return {
        "model_name": "CLAP_SED",
        "CLAP_SED": {"train_kwargs": {}, "val_kwargs": {}},
        "training": {
            "clip_grad": True,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
            "transform": {"choice": [1, 0, 0, 0]},
        },
        "opt": {
            "param_groups": {
                "encoder": {"lr": 1e-4, "weight_decay": 0.0},
                "decoder": {"lr": 1e-3, "weight_decay": 0.0},
                "head": {"lr": 1e-3, "weight_decay": 0.0},
            }
        },
        "backbone_depth": 4,
    }


def _codec(labels):
    # 20160 samples @32k, hop 320 -> 64 frames; net_pooling 2 -> 32
    return LabelCodec(
        labels=labels, audio_len=N_SAMPLES / 32000, frame_len=1024,
        frame_hop=320, net_pooling=2, sr=32000,
    )


class TestCommonOnlyClapTrainer:
    def test_full_cycle(self):
        from transformer4sed_tpu.recipes.clap import CommonOnlyClapTrainer
        from transformer4sed_tpu.utils.logging import Logger

        rng = np.random.RandomState(0)
        classes = ("c0", "c1", "c2", "c3")
        common_mask = np.array([True, True, False, False])
        query_bank = rng.randn(4, 16).astype(np.float32)
        wav = rng.randn(2, N_SAMPLES).astype(np.float32) * 0.05
        labels = np.zeros((2, 4, N_OUT_FRAMES), np.float32)
        labels[:, 0, 5:15] = 1.0
        train_loader = _FakeLoader([{"wav": wav, "label": labels}])
        val_loader = _FakeLoader(
            [{"wav": wav, "label": labels,
              "pad_mask": np.zeros((2, N_OUT_FRAMES), bool),
              "filename": ["v0", "v1"]}]
        )
        codec = _codec(classes)
        assert codec.n_frames == N_OUT_FRAMES

        model = CLAP_SED(embed_dim=768, class_num=4, query_dim=16, htsat_config="tiny")
        trainer = CommonOnlyClapTrainer(
            model, HTSATFrontend(), _config(), codec, train_loader, val_loader,
            Logger(), common_mask=common_mask, query_bank=query_bank,
        )
        assert trainer.state.model_state is not None  # bn0 running stats

        bn_before = jax.tree_util.tree_map(
            np.asarray, trainer.state.model_state["batch_stats"]
        )
        metrics = trainer.train_epoch(0, KEY)
        assert np.isfinite(metrics["loss_class_strong"])
        # BatchNorm running stats advanced through the jitted step
        leaves_b = jax.tree_util.tree_leaves(bn_before)
        leaves_a = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, trainer.state.model_state["batch_stats"])
        )
        assert any(np.abs(a - b).max() > 0 for a, b in zip(leaves_a, leaves_b))

        gt = {"v0": [(0.05, 0.3, "c0")], "v1": [(0.05, 0.3, "c0")]}
        durations = {"v0": 0.63, "v1": 0.63}
        results = trainer.validation(0, gt, durations, median_filter=3)
        assert np.isfinite(results["psds"])

    def test_requires_bank(self):
        from transformer4sed_tpu.recipes.clap import CommonOnlyClapTrainer

        with pytest.raises(ValueError):
            CommonOnlyClapTrainer(None, None, {}, None, None, None, None)


class TestClapOpenset:
    def test_openset_eval_with_batch_stats(self):
        from transformer4sed_tpu.recipes.dasm_recipe import openset_evaluate

        rng = np.random.RandomState(1)
        model = CLAP_SED(embed_dim=768, class_num=2, query_dim=16, htsat_config="tiny")
        frontend = HTSATFrontend()
        wav = rng.randn(2, N_SAMPLES).astype(np.float32) * 0.05
        variables = model.init({"params": KEY}, frontend(jnp.asarray(wav)))
        bank = rng.randn(2, 16).astype(np.float32)
        extra = rng.randn(1, 16).astype(np.float32)
        codec = _codec(("c0", "c1", "novel"))
        loader = [{"wav": wav, "pad_mask": np.zeros((2, N_OUT_FRAMES), bool),
                   "filename": ["o0", "o1"]}]
        gt = {"o0": [(0.05, 0.3, "novel")], "o1": [(0.1, 0.4, "c1")]}
        durations = {"o0": 0.63, "o1": 0.63}
        psds, single, top10 = openset_evaluate(
            model, frontend, variables["params"], codec, loader, extra, gt, durations,
            query_bank=bank, median_filter=3,
            model_state={"batch_stats": variables["batch_stats"]},
        )
        assert np.isfinite(psds)
        assert set(single) <= {"c0", "c1", "novel"}
