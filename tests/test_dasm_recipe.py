"""DASM recipe tests: OV query ordering/masks, supervised step, per-type PSDS."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer4sed_tpu.recipes.dasm_recipe import (
    DASMTrainConfig,
    common_first_order,
    make_dasm_step,
    open_vocab_att_mask,
    reorder_pred,
    split_psds_by_type,
)

KEY = jax.random.PRNGKey(0)


class TestOVUtilities:
    COMMON = np.array([True, False, True, False, False])

    def test_common_first_order(self):
        np.testing.assert_array_equal(common_first_order(self.COMMON), [0, 2, 1, 3, 4])

    def test_reorder_roundtrip(self):
        order = common_first_order(self.COMMON)
        pred_cf = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7).astype(np.float32))
        # build "original" by scattering, then verify reorder recovers it
        recovered = reorder_pred(pred_cf, self.COMMON)
        np.testing.assert_array_equal(
            np.asarray(recovered)[:, order], np.asarray(pred_cf)
        )

    def test_att_mask_structure(self):
        mask = open_vocab_att_mask(self.COMMON)
        n_common = 2
        # every query can see the common block
        assert not mask[:, :n_common].any()
        # rare queries hidden from each other except self
        assert mask[2, 3] and mask[3, 2]
        assert not mask[3, 3]


class TestDASMStep:
    def test_supervised_step(self):
        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.train.mlm import MLMState

        model = tiny_dasm()
        frontend = PasstFrontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 63681).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        assert mel.shape[-1] == 200
        variables = model.init({"params": KEY}, mel)

        def model_apply(params, m, train=False, rngs=None, model_state=None, **kw):
            return model.apply({"params": params}, m, train=train, rngs=rngs, **kw), None

        tx = optax.adamw(1e-4)
        state = MLMState(
            params=variables["params"], opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32)
        )
        cfg = DASMTrainConfig(out_type="sigmoid", w_at=1.0)
        step = jax.jit(lambda s, b, k: make_dasm_step(model_apply, frontend, tx, cfg)(s, b, k))
        labels = jnp.asarray((np.random.RandomState(1).rand(2, 4, 200) > 0.8).astype(np.float32))
        state, metrics = step(state, {"wav": wav, "labels": labels}, KEY)
        for k in ("loss_total", "loss_class_strong", "loss_class_at_specific"):
            assert np.isfinite(float(metrics[k]))

    def test_logit_head_ce(self):
        from transformer4sed_tpu.recipes.dasm_recipe import _ce_multiclass

        logits = jnp.asarray(np.random.RandomState(2).randn(2, 3, 4).astype(np.float32))
        weak = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
        loss = _ce_multiclass(logits, weak)
        assert np.isfinite(float(loss))
        # perfect logits -> small loss
        perfect = jnp.log(
            jnp.clip(
                jnp.asarray(
                    np.stack(
                        [
                            [[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                            [[0, 0, 0, 1], [0, 0, 0, 1], [0, 0, 0, 1]],
                        ]
                    ).astype(np.float32)
                ),
                1e-6,
                1.0,
            )
        ) * 50
        assert float(_ce_multiclass(perfect, weak)) < 1e-3


class _FakeLoader:
    def __init__(self, batches):
        self.batches = list(batches)

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass


def _dasm_driver_config():
    return {
        "model_name": "DASM",
        "DASM": {
            "at_param": {"out_type": "sigmoid", "query_projector": False},
            "train_kwargs": {},
            "val_kwargs": {},
        },
        "training": {
            "clip_grad": True,
            "w_AT": 1.0,
            "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                          "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
            "transform": {"choice": [1, 0, 0, 0]},
        },
        # weight decay off: the OV test asserts rare query rows are
        # untouched, and decoupled decay moves zero-grad rows (as torch does)
        "opt": {
            "param_groups": {
                "encoder": {"lr": 1e-4, "weight_decay": 0.0},
                "decoder": {"lr": 1e-3, "weight_decay": 0.0},
                "head": {"lr": 1e-3, "weight_decay": 0.0},
            }
        },
        "backbone_depth": 2,
    }


class TestOVDASMTrainer:
    def test_full_cycle(self):
        """Open-vocab epoch + validation: train on common classes only,
        validate with common-first queries + att mask, per-type PSDS."""
        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.core.codec import LabelCodec
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes.dasm_recipe import OVDASMTrainer
        from transformer4sed_tpu.utils.logging import Logger

        rng = np.random.RandomState(0)
        classes = ("c0", "c1", "c2", "c3")
        common_mask = np.array([True, False, True, False])
        wav = rng.randn(2, 63681).astype(np.float32) * 0.05
        labels = np.zeros((2, 4, 200), np.float32)
        labels[:, 0, 30:90] = 1.0
        labels[1, 2, 100:160] = 1.0
        train_loader = _FakeLoader([{"wav": wav, "label": labels}])
        val_loader = _FakeLoader(
            [{"wav": wav, "label": labels, "pad_mask": np.zeros((2, 200), bool),
              "filename": ["v0", "v1"]}]
        )
        codec = LabelCodec(
            labels=classes, audio_len=63681 / 32000, frame_len=1024, frame_hop=320, sr=32000
        )
        assert codec.n_frames == 200

        trainer = OVDASMTrainer(
            tiny_dasm(), PasstFrontend(), _dasm_driver_config(), codec,
            train_loader, val_loader, Logger(),
            type_map={"c0": "common", "c1": "rare", "c2": "common", "c3": "rare"},
            common_mask=common_mask,
        )
        q_before = np.asarray(trainer.state.params["at_query"]).copy()
        metrics = trainer.train_epoch(0, KEY)
        for k in ("loss_total", "loss_class_strong", "loss_class_at_specific"):
            assert np.isfinite(metrics[k])
        q_after = np.asarray(trainer.state.params["at_query"])
        # only the common rows of the learnable query bank receive gradients
        assert np.abs(q_after[common_mask] - q_before[common_mask]).max() > 0
        np.testing.assert_array_equal(q_after[~common_mask], q_before[~common_mask])

        gt = {"v0": [(0.3, 0.9, "c0")], "v1": [(0.3, 0.9, "c0"), (1.0, 1.6, "c2")]}
        durations = {"v0": 2.0, "v1": 2.0}
        results = trainer.validation(0, gt, durations, median_filter=5)
        for k in ("psds", "at_mAP", "psds_common"):
            assert k in results and np.isfinite(results[k])
        assert 0.0 <= results["at_mAP"] <= 1.0


class TestOpensetEval:
    def test_extended_vocabulary(self):
        """Novel-class queries appended to a trained bank are detected
        zero-shot over an extended codec."""
        from tests.test_dasm import tiny_dasm
        from transformer4sed_tpu.core.codec import LabelCodec
        from transformer4sed_tpu.frontend import PasstFrontend
        from transformer4sed_tpu.recipes.dasm_recipe import openset_evaluate

        model = tiny_dasm()
        frontend = PasstFrontend()
        rng = np.random.RandomState(3)
        wav = rng.randn(2, 63681).astype(np.float32) * 0.05
        mel = frontend.normalize(frontend(jnp.asarray(wav)))
        params = model.init({"params": KEY}, mel)["params"]

        base = ("c0", "c1", "c2", "c3")
        codec = LabelCodec(
            labels=base + ("novel_a", "novel_b"),
            audio_len=63681 / 32000, frame_len=1024, frame_hop=320, sr=32000,
        )
        extra_query = jnp.asarray(rng.randn(2, 32).astype(np.float32))
        loader = [{"wav": wav, "pad_mask": np.zeros((2, 200), bool),
                   "filename": ["o0", "o1"]}]
        gt = {"o0": [(0.2, 0.8, "novel_a")], "o1": [(0.5, 1.2, "c1")]}
        durations = {"o0": 2.0, "o1": 2.0}
        psds, single, top10 = openset_evaluate(
            model, frontend, params, codec, loader, extra_query, gt, durations,
            median_filter=5,
        )
        assert np.isfinite(psds) and 0.0 <= psds <= 1.0
        assert set(single) <= set(codec.labels)
        assert len(top10) <= 10

        # query-count mismatch is rejected
        bad_codec = LabelCodec(
            labels=base, audio_len=63681 / 32000, frame_len=1024, frame_hop=320, sr=32000
        )
        with pytest.raises(ValueError):
            openset_evaluate(
                model, frontend, params, bad_codec, loader, extra_query, gt, durations
            )


class TestMacroAP:
    def test_perfect_and_random(self):
        from transformer4sed_tpu.recipes.dasm_recipe import macro_average_precision

        targets = np.array([[1, 0], [0, 1], [1, 0], [0, 0]], np.float32)
        perfect = targets + 0.0
        assert macro_average_precision(perfect, targets) == pytest.approx(1.0)
        # class with no positives is skipped, not zeroed
        t2 = np.array([[1, 0], [0, 0]], np.float32)
        p2 = np.array([[0.9, 0.4], [0.1, 0.6]], np.float32)
        assert macro_average_precision(p2, t2) == pytest.approx(1.0)


class TestPerTypePSDS:
    def test_split(self):
        single = {"a": 0.5, "b": 0.7, "c": 0.1}
        type_map = {"a": "common", "b": "common", "c": "rare"}
        out = split_psds_by_type(single, type_map)
        assert out["psds_common"] == pytest.approx(0.6)
        assert out["psds_rare"] == pytest.approx(0.1)
