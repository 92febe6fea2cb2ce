"""Tests: single-clip inference path + AudioSet supervised trainer driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.recipes.infer import infer_clip

KEY = jax.random.PRNGKey(0)


class TestInferClip:
    def test_events_from_tiny_model(self):
        from tests.test_recipes_e2e import tiny_sed_model
        from transformer4sed_tpu.frontend import PasstFrontend

        codec = LabelCodec(
            labels=("a", "b"), audio_len=1.2, frame_len=1024, frame_hop=320, sr=32000
        )
        model = tiny_sed_model(class_num=2)
        frontend = PasstFrontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, int(1.2 * 32000)))))
        params = model.init({"params": KEY}, mel)["params"]
        wav = np.random.RandomState(0).randn(32000).astype(np.float32)  # 1 s of 1.2 s
        events, strong, weak = infer_clip(
            model, frontend, params, wav, codec, threshold=0.5, median_filter=5,
            model_kwargs={"temp_w": 0.5},
        )
        assert strong.shape[0] == 2
        assert weak.shape == (2,)
        for label, onset, offset in events:
            assert label in ("a", "b")
            assert 0 <= onset < offset <= codec.audio_len


class TestSupervisedStep:
    def test_supervised_step_runs(self):
        from tests.test_train import tiny_frontend, tiny_model
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState
        import optax

        model = tiny_model()
        frontend = tiny_frontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 38081).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY}, mel)

        def model_apply(params, m, train=False, rngs=None, **kw):
            return model.apply({"params": params}, m, train=train, rngs=rngs, **kw)

        tx = optax.adamw(1e-4)
        state = MLMState(
            params=variables["params"], opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        cfg = SupervisedConfig(loss_name="AslLoss", loss_kwargs={"rp": 0, "rn": 4, "margin": 0.05})
        step = jax.jit(make_supervised_step(model_apply, frontend, tx, cfg))
        labels = jnp.asarray((np.random.RandomState(1).rand(2, 3, 120) > 0.8).astype(np.float32))
        state, metrics = step(state, {"wav": wav, "labels": labels}, KEY)
        assert np.isfinite(float(metrics["loss_class_strong"]))
