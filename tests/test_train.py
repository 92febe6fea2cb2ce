"""Training-layer tests: param grouping, optimizer, mean-teacher step
(loss goes down, EMA tracks), MLM step, and the 8-device CPU mesh path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer4sed_tpu.core import schedules
from transformer4sed_tpu.frontend import PasstFrontend
from transformer4sed_tpu.models.passt_sed import PaSST_SED
from transformer4sed_tpu.parallel import make_mesh, put_batch, shard_train_step
from transformer4sed_tpu.train.mean_teacher import (
    MeanTeacherConfig,
    consistency_weight,
    create_mean_teacher_state,
    make_mean_teacher_step,
    pool_strong_labels,
)
from transformer4sed_tpu.train.mlm import MLMConfig, create_mlm_state, make_mlm_step, mlm_loss
from transformer4sed_tpu.train.optim import (
    GroupSpec,
    ParamGroupConfig,
    build_optimizer,
    child_tuning,
    label_params,
)

KEY = jax.random.PRNGKey(0)


def tiny_model(**kw):
    cfg = dict(
        class_num=3,
        embed_dim=32,
        decoder_dim=32,
        backbone_depth=2,
        backbone_num_heads=4,
        decoder_num_heads=4,
        at_adapter_heads=4,
        passt_feature_layer=2,
        decoder="transformerXL",
        decoder_layer_num=1,
        decoder_pos_emd_len=120,
        at_adapter=True,
    )
    cfg.update(kw)
    return PaSST_SED(**cfg)


def tiny_frontend():
    # 1-second clips at 3.2 kHz -> small mel for CPU tests (frames: (3200-1)//320+1 = 10? -> 10*... )
    return PasstFrontend(n_mels=128, sr=32000, win_length=800, hop_length=320, n_fft=1024)


class TestParamLabels:
    def setup_method(self):
        model = tiny_model()
        mel = jnp.zeros((1, 128, 120))
        self.params = model.init({"params": KEY}, mel)["params"]

    def test_groups_cover_all(self):
        cfg = ParamGroupConfig(backbone_depth=2)
        labels = label_params(self.params, cfg)
        import flax

        flat = flax.traverse_util.flatten_dict(labels, sep="/")
        assert set(flat.values()) <= {"encoder_low", "encoder_high", "decoder", "head", "frozen"}
        # backbone -> encoder, decoder module -> decoder, classifier -> head
        assert any(k.startswith("backbone/") and v == "encoder_low" for k, v in flat.items())
        assert any("decoder_module" in k and v == "decoder" for k, v in flat.items())
        assert flat["classifier/kernel"] == "head"

    def test_step_lr_and_freeze(self):
        cfg = ParamGroupConfig(
            encoder=GroupSpec(lr=1e-5, step_lr=1, freeze_layer=1), backbone_depth=2
        )
        import flax

        flat = flax.traverse_util.flatten_dict(label_params(self.params, cfg), sep="/")
        # block 0 frozen (freeze_layer=1), block 1 is top -> encoder_high
        assert flat["backbone/blocks_0/attn/qkv/kernel"] == "frozen"
        assert flat["backbone/blocks_1/attn/qkv/kernel"] == "encoder_high"
        assert flat["backbone/norm/scale"] == "encoder_high"

    def test_hierarchical_backbone_global_block_depth(self):
        """HTSAT Swin blocks are ONE flat module name layers_{i}_blocks_{j}
        (htsat.py:328); the global depth index for freeze_layer/step_lr
        must parse that real naming, not just a nested layers/blocks tree
        (a regex requiring a slash silently dropped the layer index and
        collapsed the 12 Swin blocks onto the within-layer j)."""
        import flax

        # the real (2, 2, 6, 2)-ish shape: ragged blocks-per-layer
        depths = [2, 2, 3]
        fake = {
            "backbone": {
                f"layers_{i}_blocks_{j}": {"attn": {"kernel": jnp.ones((2, 2))}}
                for i, d in enumerate(depths)
                for j in range(d)
            },
            "classifier": {"kernel": jnp.ones((2, 2))},
        }
        # 7 global blocks; freeze the first 4 -> layers_2 (global 4, 5, 6) live
        cfg = ParamGroupConfig(
            encoder=GroupSpec(lr=1e-4, freeze_layer=4), backbone_depth=7
        )
        flat = flax.traverse_util.flatten_dict(label_params(fake, cfg), sep="/")
        assert flat["backbone/layers_0_blocks_1/attn/kernel"] == "frozen"
        assert flat["backbone/layers_1_blocks_1/attn/kernel"] == "frozen"
        assert flat["backbone/layers_2_blocks_0/attn/kernel"] == "encoder_low"
        assert flat["backbone/layers_2_blocks_2/attn/kernel"] == "encoder_low"
        # step_lr counts from the top of the GLOBAL stack
        cfg2 = ParamGroupConfig(
            encoder=GroupSpec(lr=1e-4, step_lr=3), backbone_depth=7
        )
        flat2 = flax.traverse_util.flatten_dict(label_params(fake, cfg2), sep="/")
        assert flat2["backbone/layers_2_blocks_0/attn/kernel"] == "encoder_high"
        assert flat2["backbone/layers_1_blocks_1/attn/kernel"] == "encoder_low"
        # the nested layers/blocks layout keeps working too
        nested = {
            "backbone": {
                f"layers_{i}": {
                    f"blocks_{j}": {"attn": {"kernel": jnp.ones((2, 2))}}
                    for j in range(2)
                }
                for i in range(3)
            },
        }
        cfg3 = ParamGroupConfig(
            encoder=GroupSpec(lr=1e-4, freeze_layer=4), backbone_depth=6
        )
        flat3 = flax.traverse_util.flatten_dict(label_params(nested, cfg3), sep="/")
        assert flat3["backbone/layers_1/blocks_1/attn/kernel"] == "frozen"
        assert flat3["backbone/layers_2/blocks_0/attn/kernel"] == "encoder_low"

    def test_clip_norm_ignores_frozen_gradients(self):
        """Frozen-group gradients must not inflate the global norm: the
        live groups' updates are identical whether the frozen gradient is
        tiny or enormous (the reference's clip sees grad=None there)."""
        params = {
            "backbone": {"blocks_0": {"kernel": jnp.ones((2, 2))}},
            "classifier": {"kernel": jnp.ones((2, 2))},
        }
        cfg = ParamGroupConfig(
            encoder=GroupSpec(lr=0.0),  # backbone frozen
            head=GroupSpec(lr=1e-3),
            backbone_depth=1,
            clip_grad=1.0,
        )
        tx, _ = build_optimizer(params, cfg)
        state = tx.init(params)
        g_head = jnp.full((2, 2), 0.1)
        small = {"backbone": {"blocks_0": {"kernel": jnp.zeros((2, 2))}},
                 "classifier": {"kernel": g_head}}
        huge = {"backbone": {"blocks_0": {"kernel": jnp.full((2, 2), 1e6)}},
                "classifier": {"kernel": g_head}}
        up_small, _ = tx.update(small, state, params)
        up_huge, _ = tx.update(huge, state, params)
        np.testing.assert_allclose(
            np.asarray(up_small["classifier"]["kernel"]),
            np.asarray(up_huge["classifier"]["kernel"]),
            rtol=1e-6,
        )
        assert float(jnp.abs(up_huge["backbone"]["blocks_0"]["kernel"]).max()) == 0.0

    def test_audioset_cnn_and_at_decoder_groups(self):
        """The AudioSet recipes' policy (set_lr.py / lr_set.py): separate
        LR groups for the CNN branch and the DASM AT decoder; alias
        naming backbone/sed_decoder accepted by optimizer_from_config."""
        import flax

        fake = {
            "backbone": {"blocks_0": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}}},
            "cnn": {"conv0": {"kernel": jnp.ones((2, 2))}},
            "at_decoder": {"layers_0": {"self_attn": {"kernel": jnp.ones((2, 2))}}},
            "sed_decoder": {"layer_0": {"kernel": jnp.ones((2, 2))}},
            "at_query": jnp.ones((4, 2)),
            "cnn_projector": {"kernel": jnp.ones((2, 2))},
            "at_projector": {"kernel": jnp.ones((2, 2))},
            "merge_weight": jnp.ones((1,)),
            "norm_before_pool": {"scale": jnp.ones((2,))},
            "norm_after_merge": {"scale": jnp.ones((2,))},
            "sed_head": {"kernel": jnp.ones((2, 2))},
        }
        cfg = ParamGroupConfig(
            cnn=GroupSpec(lr=1e-3), at_decoder=GroupSpec(lr=1e-3),
            query=GroupSpec(lr=1e-3), backbone_depth=2,
        )
        flat = flax.traverse_util.flatten_dict(label_params(fake, cfg), sep="/")
        assert flat["cnn/conv0/kernel"] == "cnn"
        assert flat["at_decoder/layers_0/self_attn/kernel"] == "at_decoder"
        assert flat["at_query"] == "query"
        assert flat["sed_decoder/layer_0/kernel"] == "decoder"
        # the reference's full decoder-group keyword set (lr_set.py:41-51)
        for k in ("cnn_projector/kernel", "at_projector/kernel", "merge_weight",
                  "norm_before_pool/scale", "norm_after_merge/scale"):
            assert flat[k] == "decoder", k
        assert flat["sed_head/kernel"] == "head"
        # optimizer builds with the extra groups and updates them
        tx, _ = build_optimizer(fake, cfg)
        grads = jax.tree_util.tree_map(jnp.ones_like, fake)
        updates, _ = tx.update(grads, tx.init(fake), fake)
        uflat = flax.traverse_util.flatten_dict(updates, sep="/")
        assert float(jnp.abs(uflat["cnn/conv0/kernel"]).max()) > 0

        # alias naming through the config path
        from transformer4sed_tpu.recipes.common import optimizer_from_config

        config = {
            "opt": {"param_groups": {
                "backbone": {"lr": 1e-4}, "cnn": {"lr": 1e-3},
                "sed_decoder": {"lr": 1e-3}, "at_decoder": {"lr": 1e-3},
                "head": {"lr": 1e-3},
            }},
            "training": {"scheduler": {"n_epochs": 1, "n_epochs_cut": 1}},
        }
        tx2, labels = optimizer_from_config(fake, config, steps_per_epoch=2)
        lflat = flax.traverse_util.flatten_dict(labels, sep="/")
        assert lflat["cnn/conv0/kernel"] == "cnn"
        assert lflat["at_decoder/layers_0/self_attn/kernel"] == "at_decoder"

    def test_frozen_params_not_updated(self):
        cfg = ParamGroupConfig(
            encoder=GroupSpec(lr=0.0), decoder=GroupSpec(lr=1e-3), head=GroupSpec(lr=1e-3),
            backbone_depth=2,
        )
        tx, _ = build_optimizer(self.params, cfg)
        opt_state = tx.init(self.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, self.params)
        updates, _ = tx.update(grads, opt_state, self.params)
        import flax

        flat = flax.traverse_util.flatten_dict(updates, sep="/")
        assert float(jnp.abs(flat["backbone/blocks_0/attn/qkv/kernel"]).max()) == 0.0
        assert float(jnp.abs(flat["classifier/kernel"]).max()) > 0.0


class TestChildTuning:
    def test_masks_and_rescales(self):
        tx = child_tuning(p=0.5, seed=0)
        grads = {"w": jnp.ones((1000,))}
        state = tx.init(grads)
        out, _ = tx.update(grads, state)
        vals = np.asarray(out["w"])
        kept = vals[vals != 0]
        assert abs(len(kept) / 1000 - 0.5) < 0.1
        np.testing.assert_allclose(kept, 2.0)


class TestConsistencyWeight:
    def test_ramp(self):
        cfg = MeanTeacherConfig(w_cons_max=40.0, self_loss_warmup_steps=100, cons_scheduler="Linear")
        assert float(consistency_weight(0, cfg)) == 0.0
        assert float(consistency_weight(50, cfg)) == pytest.approx(20.0)
        assert float(consistency_weight(1000, cfg)) == pytest.approx(40.0)

    def test_sigmoid(self):
        cfg = MeanTeacherConfig(w_cons_max=1.0, self_loss_warmup_steps=100, cons_scheduler="Sigmoid")
        assert float(consistency_weight(50, cfg)) == pytest.approx(0.5)
        assert float(consistency_weight(100, cfg)) == pytest.approx(1.0)

    def test_pool_strong_labels(self):
        lab = jnp.zeros((2, 3, 10)).at[0, 1, :5].set(1.0)
        out = np.asarray(pool_strong_labels(lab))
        assert out[0, 1] > 0.9
        assert out[0, 0] < 1e-4


def build_mt_setup(batch=6, t_mel=120):
    model = tiny_model()
    frontend = tiny_frontend()
    cfg = MeanTeacherConfig(
        strong_num=2,
        weak_num=2,
        unlabel_num=2,
        net_pooling=1,
        self_loss_warmup_steps=10,
        w_cons_max=2.0,
        stu_kwargs={},
        tch_kwargs={},
    )
    n_samples = (t_mel - 1) * 320 + 1  # -> t_mel mel frames after preemphasis
    wav = np.random.RandomState(0).randn(batch, n_samples).astype(np.float32)
    t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
    labels = (np.random.RandomState(1).rand(batch, 3, t_out) > 0.8).astype(np.float32)
    batch_dict = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}

    mel = frontend(batch_dict["wav"][:1])
    variables = model.init({"params": KEY}, frontend.normalize(mel))

    def model_apply(params, mel_in, train=False, rngs=None, **kw):
        return model.apply({"params": params}, mel_in, train=train, rngs=rngs, **kw)

    pg = ParamGroupConfig(
        encoder=GroupSpec(lr=1e-4),
        decoder=GroupSpec(lr=1e-3),
        head=GroupSpec(lr=1e-3),
        backbone_depth=2,
    )
    tx, _ = build_optimizer(variables["params"], pg, schedule=schedules.exponential_down(50, 100))
    return model_apply, frontend, tx, cfg, variables["params"], batch_dict


class TestMeanTeacherStep:
    def test_step_runs_and_learns(self):
        model_apply, frontend, tx, cfg, params, batch = build_mt_setup()
        state = create_mean_teacher_state(params, tx)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_total"]))
            assert np.isfinite(losses[-1])
        assert int(state.step) == 4
        # teacher must move toward student but stay distinct early
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, state.teacher_params
        )
        max_diff = max(jax.tree_util.tree_leaves(diff))
        assert max_diff > 0

    def test_empty_weak_span_builds_and_runs(self):
        """weak_num=0 with mixup enabled must not crash at trace time
        (mixup on an empty subset is a no-op, as in the reference's
        mel[mask] indexing)."""
        model = tiny_model()
        frontend = tiny_frontend()
        cfg = MeanTeacherConfig(
            strong_num=2, weak_num=0, unlabel_num=2, net_pooling=1,
            self_loss_warmup_steps=10, mixup_prob=1.0,
        )
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = np.random.RandomState(0).randn(4, n_samples).astype(np.float32)
        t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
        labels = (np.random.RandomState(1).rand(4, 3, t_out) > 0.8).astype(np.float32)
        batch = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}
        variables = model.init({"params": KEY}, frontend.normalize(frontend(batch["wav"][:1])))

        def model_apply(params, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": params}, mel_in, train=train, rngs=rngs, **kw)

        pg = ParamGroupConfig(
            encoder=GroupSpec(lr=1e-4), decoder=GroupSpec(lr=1e-3),
            head=GroupSpec(lr=1e-3), backbone_depth=2,
        )
        tx, _ = build_optimizer(variables["params"], pg)
        state = create_mean_teacher_state(variables["params"], tx)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss_total"]))

    def test_batchnorm_model_state_threaded(self):
        """PaSST_CNN with the reference's default 'batch'-norm CNN branch
        (config/pmam/finetune1.yaml) must train through the mean-teacher
        step: BatchNorm collections ride in state.model_state /
        teacher_model_state, and the teacher keeps its OWN stats (the
        reference EMA touches parameters only)."""
        from transformer4sed_tpu.models.passt_cnn import PaSST_CNN

        model = PaSST_CNN(
            class_num=3, embed_dim=32, decoder_dim=32, backbone_depth=2,
            backbone_num_heads=4, decoder_num_heads=4, at_adapter_heads=4,
            passt_feature_layer=2, decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=120, at_adapter=True,
            cnn_param={"nb_filters": [8, 8], "pooling": [[1, 16], [1, 8]],
                       "normalization": "batch", "activation": "glu"},
        )
        frontend = tiny_frontend()
        cfg = MeanTeacherConfig(
            strong_num=1, weak_num=1, unlabel_num=1, net_pooling=1, max_shift_frame=5
        )
        wav = np.random.RandomState(0).randn(3, 32000).astype(np.float32) * 0.05
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY}, mel)
        assert "batch_stats" in variables
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}

        def model_apply(p, m, train=False, rngs=None, model_state=None, **kw):
            vs = {"params": p, **(model_state or {})}
            if train and model_state:
                return model.apply(vs, m, train=True, rngs=rngs, mutable=list(model_state), **kw)
            return model.apply(vs, m, train=train, rngs=rngs, **kw), None

        tx = optax.adamw(1e-4)
        state = create_mean_teacher_state(params, tx, model_state)
        step = jax.jit(
            make_mean_teacher_step(model_apply, frontend, tx, cfg, model_state_aware=True)
        )
        batch = {"wav": jnp.asarray(wav),
                 "labels": jnp.zeros((3, 3, mel.shape[-1]))}
        before = np.asarray(
            jax.tree_util.tree_leaves(state.model_state["batch_stats"])[0]
        ).copy()
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss_total"]))
        after_s = np.asarray(jax.tree_util.tree_leaves(state.model_state["batch_stats"])[0])
        after_t = np.asarray(
            jax.tree_util.tree_leaves(state.teacher_model_state["batch_stats"])[0]
        )
        # running stats actually updated, for student AND teacher
        assert np.abs(after_s - before).max() > 0
        assert np.abs(after_t - before).max() > 0

    def test_metrics_keys(self):
        model_apply, frontend, tx, cfg, params, batch = build_mt_setup()
        state = create_mean_teacher_state(params, tx)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        _, metrics = step(state, batch, KEY)
        for k in (
            "loss_total",
            "loss_class_strong",
            "loss_class_weak",
            "loss_cons_strong",
            "loss_cons_weak",
            "loss_cons_at_specific",
            "w_cons",
            "grad_norm",
        ):
            assert k in metrics


class TestGradAccumulation:
    """training.accum_steps: optax.MultiSteps over k loader batches per
    optimizer step, with per-APPLIED-step semantics for state.step, the
    mean-teacher EMA and the consistency ramp (train.optim.update_applied)."""

    def _supervised_setup(self):
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState

        model = tiny_model(at_adapter=False)
        frontend = tiny_frontend()
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = np.random.RandomState(3).randn(4, n_samples).astype(np.float32)
        t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
        labels = (np.random.RandomState(4).rand(4, 3, t_out) > 0.8).astype(np.float32)
        mel = frontend.normalize(frontend(jnp.asarray(wav[:1])))
        params = model.init({"params": KEY}, mel)["params"]

        def model_apply(p, mel_in, train=False, rngs=None, model_state=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw), None

        # deterministic: all aug off so per-sample grads are independent
        cfg = SupervisedConfig(mixup_prob=0.0, transform_choice=(0, 0, 0, 0),
                               max_shift_frame=0)

        def make(tx):
            state = MLMState(params=params, opt_state=tx.init(params),
                             step=jnp.zeros((), jnp.int32), model_state=None)
            return jax.jit(make_supervised_step(model_apply, frontend, tx, cfg)), state

        return make, wav, labels

    def test_supervised_accum_equals_full_batch(self):
        """k=2 over two half-batches with the same key == one plain step
        over the full batch (grads average; all aug draws are per-batch
        scalars so the split does not change per-sample processing)."""
        make, wav, labels = self._supervised_setup()
        key = jax.random.PRNGKey(0)
        full = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}
        h1 = {"wav": full["wav"][:2], "labels": full["labels"][:2]}
        h2 = {"wav": full["wav"][2:], "labels": full["labels"][2:]}

        # SGD: the update is linear in the gradient, so half-batch
        # averaging must reproduce the full-batch step to f32 rounding
        # (adam's eps-normalisation amplifies ~1e-8 grad noise near zero)
        step_plain, s_plain = make(optax.sgd(1e-2))
        s_plain, _ = step_plain(s_plain, full, key)

        step_acc, s_acc = make(optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=2))
        s_mid, _ = step_acc(s_acc, h1, key)
        # intermediate micro-step: zero update, counter unchanged
        assert int(s_mid.step) == 0
        mid_same = jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            s_mid.params, s_acc.params,
        )
        assert all(jax.tree_util.tree_leaves(mid_same))
        s_done, _ = step_acc(s_mid, h2, key)
        assert int(s_done.step) == 1
        for a, b in zip(jax.tree_util.tree_leaves(s_done.params),
                        jax.tree_util.tree_leaves(s_plain.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_mean_teacher_ema_and_ramp_gated_on_apply(self):
        model_apply, frontend, tx, cfg, params, batch = build_mt_setup()
        acc = optax.MultiSteps(optax.adamw(1e-3), every_k_schedule=2)
        state = create_mean_teacher_state(params, acc)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, acc, cfg))
        s1, m1 = step(state, batch, jax.random.PRNGKey(0))
        # micro-step: params, teacher and the ramp counter all frozen
        assert int(s1.step) == 0
        for a, b in zip(jax.tree_util.tree_leaves(s1.teacher_params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s2, m2 = step(s1, batch, jax.random.PRNGKey(1))
        assert int(s2.step) == 1
        moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree_util.tree_leaves(s2.teacher_params),
                            jax.tree_util.tree_leaves(params))
        )
        assert moved  # EMA applied exactly on the applied update

    def test_optimizer_from_config_wraps_multisteps(self):
        from transformer4sed_tpu.recipes.common import optimizer_from_config

        config = {
            "opt": {"param_groups": {"encoder": {"lr": 1e-4}, "decoder": {"lr": 1e-3},
                                      "head": {"lr": 1e-3}}},
            "training": {"scheduler": {"n_epochs": 2, "n_epochs_cut": 1},
                          "accum_steps": 2},
        }
        params = {"backbone": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
        tx, _ = optimizer_from_config(params, config, steps_per_epoch=10)
        assert isinstance(tx.init(params), optax.MultiStepsState)


class TestMLMStep:
    def test_mlm_loss_masked_only(self):
        pred = jnp.ones((2, 10, 4))
        target = jnp.zeros((2, 10, 4))
        mask = jnp.zeros((2, 10)).at[:, :5].set(1.0)
        assert float(mlm_loss(pred, target, mask)) == pytest.approx(1.0)
        # unmasked diff does not count
        pred2 = pred.at[:, 5:].set(100.0)
        assert float(mlm_loss(pred2, target, mask)) == pytest.approx(1.0)

    def test_mlm_step_runs(self):
        model = tiny_model(mlm=True, mlm_dict={"mask_rate": 0.5, "block_width": 10, "out_dim": 32})
        frontend = tiny_frontend()
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = jnp.asarray(np.random.RandomState(0).randn(2, n_samples).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY, "mlm": KEY}, mel)

        def model_apply(params, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": params}, mel_in, train=train, rngs=rngs, **kw)

        tx = optax.adamw(1e-3)
        from transformer4sed_tpu.train.mlm import MLMState

        state = MLMState(params=variables["params"], opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32))
        step = jax.jit(make_mlm_step(model_apply, frontend, tx))
        state, metrics = step(state, {"wav": wav}, KEY)
        assert np.isfinite(float(metrics["loss_mlm"]))
        assert int(state.step) == 1


class TestMeshPath:
    def test_eight_device_mesh_step(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh(8)
        model_apply, frontend, tx, cfg, params, batch = build_mt_setup(batch=8)
        # rebuild cfg for batch 8: [4 strong | 2 weak | 2 unlabeled]
        cfg = MeanTeacherConfig(
            strong_num=4, weak_num=2, unlabel_num=2, net_pooling=1, self_loss_warmup_steps=10
        )
        state = create_mean_teacher_state(params, tx)
        step = shard_train_step(make_mean_teacher_step(model_apply, frontend, tx, cfg), mesh)
        sharded_batch = put_batch(batch, mesh)
        state, metrics = step(state, sharded_batch, KEY)
        assert np.isfinite(float(metrics["loss_total"]))
        assert int(state.step) == 1


class TestMultiStep:
    def test_scan_equals_sequential(self):
        from transformer4sed_tpu.train.mean_teacher import make_multi_step, stack_batches

        model_apply, frontend, tx, cfg, params, batch = build_mt_setup()
        step = make_mean_teacher_step(model_apply, frontend, tx, cfg)

        # sequential reference
        state_a = create_mean_teacher_state(params, tx)
        key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, 2)
        for i in range(2):
            state_a, m_a = jax.jit(step)(state_a, batch, keys[i])

        # scanned
        state_b = create_mean_teacher_state(params, tx)
        multi = jax.jit(make_multi_step(step, 2))
        batches = stack_batches([batch, batch])
        state_b, metrics = multi(state_b, batches, key)

        assert int(state_b.step) == 2
        assert metrics["loss_total"].shape == (2,)
        # same key derivation -> same trajectory (up to scan-vs-unrolled
        # f32 accumulation-order noise)
        for la, lb in zip(
            jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)
        ):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=5e-4)


class TestDevicePrefetch:
    def test_prefetch_preserves_order(self):
        from transformer4sed_tpu.parallel.mesh import device_prefetch

        batches = [{"x": np.full((4,), i, np.float32)} for i in range(5)]
        out = list(device_prefetch(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_allclose(np.asarray(b["x"]), i)


class TestBF16ModelLevel:
    """VERDICT r2 item 3: bf16 use_flash=True versions of the train steps
    on CPU. The deacbd2 bug (a custom_vjp returning f32 cotangents next
    to bf16 siblings, breaking the caller's qkv-split VJP at trace time)
    was only caught on real TPU because every model-level test ran f32.
    These trace + run the full steps with the flagship's dtype/kernel
    flags at tiny shapes — the failure mode is platform-independent."""

    def _bf16_setup(self, **model_kw):
        model = tiny_model(use_flash=True, dtype=jnp.bfloat16, **model_kw)
        frontend = tiny_frontend()
        return model, frontend

    def test_mean_teacher_step_bf16(self):
        model, frontend = self._bf16_setup()
        cfg = MeanTeacherConfig(strong_num=2, weak_num=2, unlabel_num=2,
                                net_pooling=1, self_loss_warmup_steps=10)
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = np.random.RandomState(0).randn(6, n_samples).astype(np.float32)
        t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
        labels = (np.random.RandomState(1).rand(6, 3, t_out) > 0.8).astype(np.float32)
        batch = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}
        mel = frontend.normalize(frontend(batch["wav"][:1]))
        params = model.init({"params": KEY}, mel)["params"]

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        tx = optax.adamw(1e-3)
        state = create_mean_teacher_state(params, tx)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss_total"]))
        # params stay in their primal dtype through update + EMA
        for leaf, new in zip(jax.tree_util.tree_leaves(params),
                             jax.tree_util.tree_leaves(state.params)):
            assert leaf.dtype == new.dtype
        for leaf, new in zip(jax.tree_util.tree_leaves(params),
                             jax.tree_util.tree_leaves(state.teacher_params)):
            assert leaf.dtype == new.dtype

    def test_mlm_step_bf16(self):
        model, frontend = self._bf16_setup(
            mlm=True, mlm_dict={"mask_rate": 0.5, "block_width": 10, "out_dim": 32})
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = jnp.asarray(np.random.RandomState(0).randn(2, n_samples).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY, "mlm": KEY}, mel)

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        tx = optax.adamw(1e-3)
        from transformer4sed_tpu.train.mlm import MLMState

        state = MLMState(params=variables["params"], opt_state=tx.init(variables["params"]),
                         step=jnp.zeros((), jnp.int32))
        step = jax.jit(make_mlm_step(model_apply, frontend, tx))
        state, metrics = step(state, {"wav": wav}, KEY)
        assert np.isfinite(float(metrics["loss_mlm"]))

    def test_supervised_step_bf16(self):
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState

        model, frontend = self._bf16_setup()
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = jnp.asarray(np.random.RandomState(0).randn(4, n_samples).astype(np.float32))
        t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
        labels = jnp.asarray(
            (np.random.RandomState(1).rand(4, 3, t_out) > 0.8).astype(np.float32))
        mel = frontend.normalize(frontend(wav[:1]))
        params = model.init({"params": KEY}, mel)["params"]

        def model_apply(p, mel_in, train=False, rngs=None, model_state=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw), None

        tx = optax.adamw(1e-3)
        cfg = SupervisedConfig()
        state = MLMState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32), model_state=None)
        step = jax.jit(make_supervised_step(model_apply, frontend, tx, cfg))
        state, metrics = step(state, {"wav": wav, "labels": labels}, KEY)
        assert np.isfinite(float(metrics["loss_class_strong"]))

    def test_grad_dtypes_match_param_dtypes_bf16(self):
        """Cotangents surfacing from the bf16 flash/XL kernel stack must
        come back in each param's dtype (f32 master params here)."""
        model, frontend = self._bf16_setup()
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = jnp.asarray(np.random.RandomState(0).randn(2, n_samples).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        params = model.init({"params": KEY}, mel)["params"]

        def loss(p):
            out = model.apply({"params": p}, mel, temp_w=1.0)
            return jnp.sum(out.strong.astype(jnp.float32) ** 2) + jnp.sum(
                out.weak.astype(jnp.float32) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        flat_g = jax.tree_util.tree_leaves(grads)
        for (path, p), g in zip(flat_p, flat_g):
            assert g.dtype == p.dtype, f"{jax.tree_util.keystr(path)}: {g.dtype} != {p.dtype}"
            assert np.isfinite(np.asarray(g, np.float32)).all(), jax.tree_util.keystr(path)

    def test_eval_forward_bf16(self):
        model, frontend = self._bf16_setup()
        t_mel = 120
        n_samples = (t_mel - 1) * 320 + 1
        wav = jnp.asarray(np.random.RandomState(0).randn(2, n_samples).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        params = model.init({"params": KEY}, mel)["params"]
        out = jax.jit(lambda p, m: model.apply({"params": p}, m, temp_w=0.5))(params, mel)
        assert np.isfinite(np.asarray(out.strong, np.float32)).all()
        assert np.isfinite(np.asarray(out.weak, np.float32)).all()


class TestLearningSanity:
    """VERDICT r2 item 4: an actual *decrease* assertion. A sign-flipped
    loss term passed all 436 round-2 tests; these fail on one."""

    def _clips(self, n=4, t_mel=120):
        """2 clips with an 880 Hz tone in frames [0, T/2) (class 0 on),
        2 noise-only clips (all classes off) — linearly separable."""
        n_samples = (t_mel - 1) * 320 + 1
        t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
        rng = np.random.RandomState(0)
        wav = rng.randn(n, n_samples).astype(np.float32) * 0.02
        tone = 0.3 * np.sin(2 * np.pi * 880.0 * np.arange(n_samples) / 32000.0)
        labels = np.zeros((n, 3, t_out), np.float32)
        for i in range(n // 2):
            wav[i, : n_samples // 2] += tone[: n_samples // 2].astype(np.float32)
            labels[i, 0, : t_out // 2] = 1.0
        return wav, labels

    def test_supervised_step_overfits(self):
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState

        model = tiny_model(at_adapter=False)
        frontend = tiny_frontend()
        wav, labels = self._clips()
        batch = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}
        mel = frontend.normalize(frontend(batch["wav"][:1]))
        params = model.init({"params": KEY}, mel)["params"]

        def model_apply(p, mel_in, train=False, rngs=None, model_state=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw), None

        tx = optax.adamw(1e-3)
        # deterministic memorisation: no mixup/filter-aug/frame-shift
        cfg = SupervisedConfig(mixup_prob=0.0, transform_choice=(0, 0, 0, 0),
                               max_shift_frame=0)
        state = MLMState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32), model_state=None)
        step = jax.jit(make_supervised_step(model_apply, frontend, tx, cfg))
        losses = []
        for i in range(100):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_class_strong"]))
        assert losses[-1] < losses[0] / 5.0, (
            f"supervised step failed to memorise 4 clips: {losses[0]:.4f} -> {losses[-1]:.4f}")

    def test_mean_teacher_step_overfits(self):
        model = tiny_model()
        frontend = tiny_frontend()
        wav, labels = self._clips()
        batch = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}
        mel = frontend.normalize(frontend(batch["wav"][:1]))
        params = model.init({"params": KEY}, mel)["params"]

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        cfg = MeanTeacherConfig(
            strong_num=4, weak_num=0, unlabel_num=0, net_pooling=1,
            self_loss_warmup_steps=50, w_cons_max=2.0,
            mixup_prob=0.0, n_transform=0, max_shift_frame=0)
        tx = optax.adamw(1e-3)
        state = create_mean_teacher_state(params, tx)
        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        losses = []
        for i in range(100):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_class_strong"]))
        assert losses[-1] < losses[0] / 5.0, (
            f"mean-teacher step failed to memorise 4 clips: {losses[0]:.4f} -> {losses[-1]:.4f}")
