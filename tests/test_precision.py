"""bf16-vs-f32 training agreement bound (docs/PRECISION.md).

The production flagship trains with bf16 compute over f32 params +
optimizer state while the reference trains f32 end-to-end
(``recipes/desed/finetune/train.py:194-199``). The full-size on-chip
A/B lives in ``exps/precision_ab.py`` (results in docs/PRECISION.md);
this is the CPU-scale regression gate on the same harness: same init,
same batches, same keys, only the compute dtype differs — the bf16 arm
must track the f32 arm within the documented bounds. A numerics
regression in the bf16 path (kernel accumulating in bf16, a cast
dropping to bf16 where f32 is required, an optimizer update leaking
into bf16) breaks these bounds long before it shows up in PSDS.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def ab_runs():
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
    )

    n_steps, b = 8, 6
    t_mel = 120
    n_samples = (t_mel - 1) * 320 + 1
    t_out = (((t_mel - 16) // 10 + 1) + 1) * 10
    kw = dict(
        class_num=3, embed_dim=32, decoder_dim=32, backbone_depth=2,
        backbone_num_heads=4, decoder_num_heads=4, at_adapter_heads=4,
        passt_feature_layer=2, decoder="transformerXL", decoder_layer_num=1,
        decoder_pos_emd_len=t_out, at_adapter=True,
    )
    models = {"f32": PaSST_SED(dtype=jnp.float32, **kw),
              "bf16": PaSST_SED(dtype=jnp.bfloat16, **kw)}
    frontend = PasstFrontend()
    rng = np.random.RandomState(3)
    wav = (rng.randn(b, n_samples) * 0.1).astype(np.float32)
    labels = np.zeros((b, 3, t_out), np.float32)
    labels[:2] = (rng.rand(2, 3, t_out) > 0.8).astype(np.float32)
    labels[2:4, :, 0] = (rng.rand(2, 3) > 0.5).astype(np.float32)
    batch = {"wav": jnp.asarray(wav), "labels": jnp.asarray(labels)}

    mel0 = frontend.normalize(frontend(wav[:1]))
    # ONE f32 init serves both arms (param_dtype is f32 regardless)
    params = models["f32"].init({"params": KEY}, mel0)["params"]
    cfg = MeanTeacherConfig(strong_num=2, weak_num=2, unlabel_num=2,
                            self_loss_warmup_steps=4)
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-3))

    runs = {}
    for name, model in models.items():
        step = jax.jit(make_mean_teacher_step(
            lambda p, m, train, rngs, model=model, **k2: model.apply(
                {"params": p}, m, train=train, rngs=rngs, **k2),
            frontend, opt, cfg))
        state = create_mean_teacher_state(params, opt)
        losses = []
        for i in range(n_steps):
            state, metrics = step(state, batch, jax.random.fold_in(KEY, i))
            losses.append(float(metrics["loss_total"]))
        runs[name] = {"losses": np.asarray(losses), "state": state}
    runs["models"] = models
    runs["frontend"] = frontend
    runs["batch"] = batch
    return runs


class TestBF16TrainingBound:
    def test_losses_finite(self, ab_runs):
        for name in ("f32", "bf16"):
            assert np.isfinite(ab_runs[name]["losses"]).all(), name

    def test_loss_trajectory_tracks_f32(self, ab_runs):
        f32, bf16 = ab_runs["f32"]["losses"], ab_runs["bf16"]["losses"]
        rel = np.abs(f32 - bf16) / np.maximum(np.abs(f32), 1e-9)
        # full-size on-chip measurement: mean rel 0.18% over 200 steps
        # (docs/PRECISION.md); 3% headroom covers the tiny-model scale
        assert rel.mean() < 0.03, f"mean relative loss delta {rel.mean():.4f}"
        assert rel.max() < 0.10, f"max relative loss delta {rel.max():.4f}"

    def test_gradient_direction_agrees(self, ab_runs):
        """bf16 gradient at the f32 end-state must point the same way."""
        from jax.flatten_util import ravel_pytree

        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            make_loss_fn,
            make_preprocess,
        )

        cfg = MeanTeacherConfig(strong_num=2, weak_num=2, unlabel_num=2,
                                self_loss_warmup_steps=4)
        st = ab_runs["f32"]["state"]
        frontend = ab_runs["frontend"]
        grads = {}
        for name in ("f32", "bf16"):
            model = ab_runs["models"][name]
            loss_fn = make_loss_fn(
                lambda p, m, train, rngs, model=model, **k2: model.apply(
                    {"params": p}, m, train=train, rngs=rngs, **k2), cfg)
            preprocess = make_preprocess(frontend, cfg)

            @jax.jit
            def grad_at(params, tparams, batch, k, loss_fn=loss_fn,
                        preprocess=preprocess, model=model):
                kpre, kstu, ktch = jax.random.split(k, 3)
                stu_mel, tch_mel, labels, weak_tags = preprocess(batch, kpre)
                tch_rngs = {kk: jax.random.fold_in(ktch, i)
                            for i, kk in enumerate(("patchout", "dropout", "mlm"))}
                tch = model.apply({"params": tparams}, tch_mel, train=True,
                                  rngs=tch_rngs)
                tch = jax.tree_util.tree_map(jax.lax.stop_gradient, tch)
                g = jax.grad(lambda p: loss_fn(p, None, stu_mel, labels,
                                               weak_tags, tch, kstu, st.step)[0])(params)
                return ravel_pytree(g)[0]

            grads[name] = np.asarray(
                grad_at(st.params, st.teacher_params, ab_runs["batch"], KEY),
                np.float64)
        g32, g16 = grads["f32"], grads["bf16"]
        cos = g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-30)
        # full-size on-chip measurement: cosine >= 0.9998 at every probe
        assert cos > 0.995, f"bf16/f32 gradient cosine {cos:.5f}"
        ratio = np.linalg.norm(g16) / (np.linalg.norm(g32) + 1e-30)
        assert 0.9 < ratio < 1.1, f"gradient norm ratio {ratio:.4f}"

    def test_eval_forward_compute_error_bounded(self, ab_runs):
        """Same trained params through both compute dtypes: probability
        outputs agree to bf16-resolution scale."""
        frontend = ab_runs["frontend"]
        p = ab_runs["f32"]["state"].params
        wav = ab_runs["batch"]["wav"]
        mel = frontend.normalize(frontend(wav))
        outs = {}
        for name in ("f32", "bf16"):
            out = ab_runs["models"][name].apply({"params": p}, mel, temp_w=0.5)
            outs[name] = np.asarray(out.strong, np.float32)
        err = np.abs(outs["f32"] - outs["bf16"]).max()
        assert err < 0.05, f"same-params eval forward max|delta| {err:.4f}"

    def test_cross_trajectory_divergence_bounded(self, ab_runs):
        """The two trained param sets, both evaluated in f32: the arms
        must land on nearby functions, not merely nearby losses."""
        frontend = ab_runs["frontend"]
        wav = ab_runs["batch"]["wav"]
        mel = frontend.normalize(frontend(wav))
        f32_model = ab_runs["models"]["f32"]
        a = np.asarray(f32_model.apply(
            {"params": ab_runs["f32"]["state"].params}, mel, temp_w=0.5).strong)
        b = np.asarray(f32_model.apply(
            {"params": ab_runs["bf16"]["state"].params}, mel, temp_w=0.5).strong)
        err = np.abs(a - b).max()
        assert err < 0.10, f"cross-trajectory forward max|delta| {err:.4f}"
