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

        def model_apply(params, m, train=False, rngs=None, **kw):
            return model.apply({"params": params}, m, train=train, rngs=rngs, **kw)

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


class TestPerTypePSDS:
    def test_split(self):
        single = {"a": 0.5, "b": 0.7, "c": 0.1}
        type_map = {"a": "common", "b": "common", "c": "rare"}
        out = split_psds_by_type(single, type_map)
        assert out["psds_common"] == pytest.approx(0.6)
        assert out["psds_rare"] == pytest.approx(0.1)
