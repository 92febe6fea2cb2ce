"""Tensor-parallel partitioning tests on the 8-device CPU mesh:
('data', 'model') = (4, 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from transformer4sed_tpu.parallel import (
    make_2d_mesh,
    partition_specs,
    put_batch,
    shard_params,
)

KEY = jax.random.PRNGKey(0)


def tiny_model():
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    return PaSST_SED(
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


@pytest.fixture(scope="module")
def setup():
    from transformer4sed_tpu.frontend import PasstFrontend

    model = tiny_model()
    frontend = PasstFrontend()
    t_mel = 120
    n_samples = (t_mel - 1) * 320 + 1
    wav = jnp.asarray(np.random.RandomState(0).randn(8, n_samples).astype(np.float32))
    mel = frontend.normalize(frontend(wav))
    params = model.init({"params": KEY}, mel)["params"]
    return model, frontend, params, wav, mel


class TestPartitionSpecs:
    def test_rules_match_block_params(self, setup):
        _, _, params, _, _ = setup
        import flax

        specs = flax.traverse_util.flatten_dict(partition_specs(params), sep="/")
        assert specs["backbone/blocks_0/attn/qkv/kernel"] == P(None, "model")
        assert specs["backbone/blocks_0/attn/proj/kernel"] == P("model", None)
        assert specs["backbone/blocks_0/mlp/fc1/kernel"] == P(None, "model")
        assert specs["backbone/blocks_0/mlp/fc2/kernel"] == P("model", None)
        # XL decoder attention
        xl = [k for k in specs if k.endswith("in_proj/kernel")]
        assert xl and all(specs[k] == P(None, "model") for k in xl)
        # norms replicated
        assert specs["backbone/blocks_0/norm1/scale"] == P()

    def test_sharded_leaves_are_distributed(self, setup):
        _, _, params, _, _ = setup
        mesh = make_2d_mesh(8, model_parallel=2)
        sharded = shard_params(params, mesh)
        leaf = sharded["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert leaf.sharding.spec == P(None, "model")
        # each shard holds half the output features
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert shard_shapes == {(32, 48)}

    def test_indivisible_falls_back_replicated(self, setup):
        _, _, params, _, _ = setup
        mesh = make_2d_mesh(8, model_parallel=2)
        # class head [32, 3]: a hypothetical rule on its kernel would not
        # divide 3 by 2 -> shard_params must replicate instead of crashing
        from transformer4sed_tpu.parallel.partition import TP_RULES

        rules = TP_RULES + ((r".*/head/kernel$", P(None, "model")),)
        sharded = shard_params(params, mesh, rules=rules)
        flat = jax.tree_util.tree_leaves(sharded)
        assert all(x.is_fully_replicated or x.sharding.spec != P() for x in flat)


class TestTPForwardParity:
    def test_tp_matches_replicated(self, setup):
        model, frontend, params, wav, mel = setup
        mesh = make_2d_mesh(8, model_parallel=2)
        sharded = shard_params(params, mesh)
        batch = jax.device_put(mel, NamedSharding(mesh, P("data")))

        @jax.jit
        def forward(p, m):
            return model.apply({"params": p}, m, temp_w=0.5).strong

        ref = forward(params, mel)
        out = forward(sharded, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestTPTrainStep:
    def test_mean_teacher_step_on_2d_mesh(self, setup):
        import optax

        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            create_mean_teacher_state,
            make_mean_teacher_step,
        )

        model, frontend, params, wav, _ = setup
        mesh = make_2d_mesh(8, model_parallel=2)
        sharded = shard_params(params, mesh)
        tx = optax.adamw(1e-4)
        state = create_mean_teacher_state(sharded, tx)

        cfg = MeanTeacherConfig(
            strong_num=4, weak_num=2, unlabel_num=2, net_pooling=1,
            self_loss_warmup_steps=10,
        )

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        step = jax.jit(make_mean_teacher_step(model_apply, frontend, tx, cfg))
        t_out = (((120 - 16) // 10 + 1) + 1) * 10
        labels = np.zeros((8, 3, t_out), np.float32)
        labels[:4] = (np.random.RandomState(1).rand(4, 3, t_out) > 0.8).astype(np.float32)
        labels[4:6, :, 0] = 1.0
        batch = put_batch({"wav": wav, "labels": jnp.asarray(labels)}, mesh)
        new_state, metrics = step(state, batch, KEY)
        assert np.isfinite(float(metrics["loss_total"]))
        # TP shardings survive the step (params and adam moments)
        qkv = new_state.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert qkv.sharding.spec == P(None, "model")


class TestCrossLayoutEquivalence:
    def test_losses_agree_1dev_dp_tp(self, setup):
        """Same batch + key stepped on 1 device, dp=8, and dp4xtp2 must
        produce the same loss — sharding may only change reduction
        order, never semantics (mirrors ``__graft_entry__.dryrun_multichip``;
        replaces the DP semantics of the reference's
        ``recipes/desed/finetune/passt/main.py:31-37``)."""
        import optax

        from transformer4sed_tpu.parallel import make_mesh, shard_train_step
        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            create_mean_teacher_state,
            make_mean_teacher_step,
        )

        model, frontend, params, wav, _ = setup
        params = jax.tree_util.tree_map(np.asarray, params)  # host master copy
        tx = optax.adamw(1e-4)
        cfg = MeanTeacherConfig(
            strong_num=4, weak_num=2, unlabel_num=2, net_pooling=1,
            self_loss_warmup_steps=10,
        )

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        raw_step = make_mean_teacher_step(model_apply, frontend, tx, cfg)
        t_out = (((120 - 16) // 10 + 1) + 1) * 10
        labels = np.zeros((8, 3, t_out), np.float32)
        labels[:4] = (np.random.RandomState(1).rand(4, 3, t_out) > 0.8).astype(np.float32)
        labels[4:6, :, 0] = 1.0
        batch = {"wav": wav, "labels": jnp.asarray(labels)}

        def run(mesh, use_tp):
            p = (
                shard_params(params, mesh)
                if use_tp
                else jax.device_put(params, NamedSharding(mesh, P()))
            )
            state = create_mean_teacher_state(p, tx)
            step = jax.jit(raw_step) if use_tp else shard_train_step(raw_step, mesh)
            _, metrics = step(state, put_batch(batch, mesh), KEY)
            return float(metrics["loss_total"])

        losses = [
            run(make_mesh(1), use_tp=False),
            run(make_mesh(8), use_tp=False),
            run(make_2d_mesh(8, model_parallel=2), use_tp=True),
        ]
        np.testing.assert_allclose(losses[1:], losses[0], rtol=2e-3)


class TestTPFlashAttention:
    def test_head_sharded_matches_replicated(self):
        from transformer4sed_tpu.kernels import flash_attention
        from transformer4sed_tpu.parallel.partition import tp_flash_attention

        mesh = make_2d_mesh(8, model_parallel=2)
        rng = np.random.RandomState(0)
        q, k, v = (
            jnp.asarray(rng.randn(2, 4, 64, 16).astype(np.float32)) for _ in range(3)
        )
        ref = flash_attention(q, k, v)
        out = jax.jit(lambda q, k, v: tp_flash_attention(q, k, v, mesh))(
            *(jax.device_put(x, NamedSharding(mesh, P(None, "model"))) for x in (q, k, v))
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # trailing Nones are normalized away in the reported spec
        assert tuple(out.sharding.spec)[:2] == (None, "model")


class TestShardEvalPut:
    def test_sharded_and_ragged(self):
        """Eval batches ride the data mesh when divisible; ragged tails
        stay unsharded; mesh=None is a no-op."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from transformer4sed_tpu.parallel import make_mesh
        from transformer4sed_tpu.recipes.common import shard_eval_put

        if jax.device_count() < 2:
            import pytest

            pytest.skip("needs the multi-device CPU mesh")
        mesh = make_mesh()
        n = jax.device_count()
        a = jnp.ones((n * 2, 4))
        b = jnp.zeros((n * 2, 3))
        sa, sb = shard_eval_put(mesh, a, b)
        assert len(sa.sharding.device_set) == n
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(a))
        # ragged: not divisible -> unsharded passthrough
        (ra,) = shard_eval_put(mesh, jnp.ones((n + 1, 4)))
        assert len(ra.sharding.device_set) == 1
        # no mesh -> identity
        (ia,) = shard_eval_put(None, a)
        assert ia is a


class TestDeviceShortfall:
    """Requesting more devices than the backend has must fail loudly
    (round-1 driver dryrun failed with a cryptic divisibility error
    because make_2d_mesh silently truncated to 1 device)."""

    def test_make_mesh_raises_with_counts(self):
        from transformer4sed_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match=r"requested 16 devices, backend has 8"):
            make_mesh(16)

    def test_make_2d_mesh_raises_with_counts(self):
        with pytest.raises(ValueError, match=r"requested 16 devices, backend has 8"):
            make_2d_mesh(16, model_parallel=2)

    def test_error_names_platform(self):
        from transformer4sed_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match=r"platform=cpu"):
            make_mesh(9)


class TestSupervisedStepBatchNormSPMD:
    """Supervised step with a BatchNorm model under data-parallel SPMD:
    GSPMD must compute GLOBAL batch statistics (the arrays are logically
    global; the mean/var reductions gain collectives), so the dp=8 loss
    and the updated running stats must equal the 1-device run — the SPMD
    replacement for torch SyncBatchNorm semantics the reference never
    had (its DataParallel computed per-GPU stats)."""

    def test_loss_and_stats_agree_1dev_dp(self):
        import flax.linen as fnn
        import optax

        from transformer4sed_tpu.models.cnn import CNN
        from transformer4sed_tpu.models.sed_model import SEDOutput
        from transformer4sed_tpu.parallel import make_mesh, put_batch, shard_train_step
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.train.mlm import MLMState

        C, Fdim, T, B = 3, 16, 16, 8
        filters = [8, 8]

        class TinySup(fnn.Module):
            @fnn.compact
            def __call__(self, x, train=False):
                h = CNN(n_in_channel=1, nb_filters=filters, kernel_size=[3, 3],
                        padding=[1, 1], stride=[1, 1], pooling=[(1, 2), (1, 2)],
                        activation="glu", normalization="batch", name="cnn")(x, train=train)
                feat = jnp.mean(h, axis=-1).transpose(0, 2, 1)
                logits = fnn.Dense(C, name="head")(feat)
                return jax.nn.sigmoid(logits).transpose(0, 2, 1)

        module = TinySup()
        rng = np.random.RandomState(0)
        mel_np = (rng.randn(B, Fdim, T) * 0.5).astype(np.float32)
        labels_np = (rng.rand(B, C, T) > 0.8).astype(np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = module.init(
                {"params": KEY}, jnp.asarray(mel_np).transpose(0, 2, 1)[:, None], train=False
            )
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        stats0 = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

        def model_apply(p, mel, train=False, rngs=None, model_state=None, **kw):
            x = mel.transpose(0, 2, 1)[:, None]
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
            loss_name="BCELoss", max_shift_frame=0, mixup_prob=0.0,
            transform_choice=(0, 0, 0, 0),
        )
        tx = optax.adamw(1e-3)
        raw_step = make_supervised_step(model_apply, _IdentityFrontend(), tx, cfg)
        batch = {"wav": jnp.asarray(mel_np), "labels": jnp.asarray(labels_np)}

        def run(mesh):
            from jax.sharding import NamedSharding, PartitionSpec as P

            p = jax.device_put(params, NamedSharding(mesh, P()))
            s = jax.device_put(stats0, NamedSharding(mesh, P()))
            state = MLMState(params=p, opt_state=tx.init(p),
                             step=jnp.zeros((), jnp.int32), model_state=s)
            step = shard_train_step(raw_step, mesh)
            state, metrics = step(state, put_batch(batch, mesh), KEY)
            return float(metrics["loss_class_strong"]), jax.tree_util.tree_map(
                np.asarray, state.model_state
            )

        loss1, stats1 = run(make_mesh(1))
        loss8, stats8 = run(make_mesh(8))
        np.testing.assert_allclose(loss8, loss1, rtol=2e-5)
        import flax

        f1 = flax.traverse_util.flatten_dict(stats1, sep="/")
        f8 = flax.traverse_util.flatten_dict(stats8, sep="/")
        assert f1.keys() == f8.keys()
        for k in f1:
            np.testing.assert_allclose(f8[k], f1[k], rtol=1e-4, err_msg=k)
