"""Live-oracle TRAINER-layer parity (VERDICT r3 task 5).

The train-loop parity in ``test_torch_parity.py`` rebuilds the
reference loop in torch inside the test — a transcription. Here the
reference recipe modules THEMSELVES are imported
(``recipes/desed/finetune/train.py``, ``mlm_passt/train.py``,
``audioset_strong/base/passt_cnn/train.py``) and their real
``Trainer.train`` epochs run against our jitted steps with
converter-shared weights, superseding the transcriptions for the three
train-step families.

Determinism control (test scaffolding, not behavior changes):

* ``random.random -> 0.99`` skips the coin-flip mixups;
  ``random.gauss -> 0.0`` zeroes the per-sample frame shifts
  (``src/preprocess/data_aug.py:17`` draws via the stdlib) — our side
  uses ``mixup_prob=0`` / ``max_shift_frame=0``.
* transform configs use ``choice=[0,0,0,0]`` (reference
  ``feature_transformation`` then deep-copies the input: identity
  views) — our side ``n_transform=0`` / zero choice.
* mel-frontend fmin/fmax augmentation is disabled by setting the LIVE
  extractor's ``fmin_aug_range/fmax_aug_range`` to 1 post-init
  (``passt_feature_extraction.py:67-71`` then adds randint(1) == 0) and
  constructing our ``PasstFrontend`` with the matching fixed band.
* all torch drop rates are 0 in these configs (passt_sed.py:95-97), so
  ``net.train()`` forwards are deterministic.

Tolerances are wider than the model-level live pins because the full
wav->mel frontends differ by float round-off (~3e-4 mel atol,
``TestPasstFrontendTorchParity``) which integrates over multi-step
trajectories; wiring errors (mask swap, EMA off-by-one, loss-term
weights) move losses by 1e-2+.
"""

from __future__ import annotations

import copy
import logging
import random as pyrandom
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import load


def t(x):
    return torch.as_tensor(np.asarray(x, dtype=np.float32))


class _Writer:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, global_step=None):
        self.scalars[tag] = float(value)


def _dummy_logger():
    return types.SimpleNamespace(
        tensorboard_writer=_Writer(), logger=logging.getLogger("live-trainer")
    )


def _neutralize_python_rng(monkeypatch):
    monkeypatch.setattr(pyrandom, "random", lambda: 0.99)  # no mixup coin
    monkeypatch.setattr(pyrandom, "gauss", lambda mu, sigma: 0.0)  # no shift


def _neutral_frontend():
    """Our frontend with the aug band pinned to the reference's
    deterministic train-mode values (fmin=0, fmax=15000)."""
    from transformer4sed_tpu.frontend import PasstFrontend

    return PasstFrontend(fmax=15000.0, fmin_aug_range=1, fmax_aug_range=1)


TRANSFORM_OFF = {
    "n_transform": 2,
    "choice": [0, 0, 0, 0],
    "filter_db_range": [-0.5, 0.5],
    "filter_bands": [3, 6],
    "filter_minimum_bandwidth": 6,
    "filter_type": "step",
}


# ---------------------------------------------------------------------------
# recipes/desed/finetune/train.py — the mean-teacher Trainer, live
# ---------------------------------------------------------------------------


class TestFinetuneTrainerLive:
    """The actual ``Trainer`` from ``recipes/desed/finetune/train.py``:
    get_mask / get_self_weight pinned exactly, and a full 3-step
    ``train()`` epoch (preprocess -> student/teacher forwards -> six
    losses -> AdamW -> scheduler -> update_ema) against
    ``make_mean_teacher_step`` with converter-shared weights."""

    S, W, U = 2, 2, 2
    N_STEPS = 3
    LR, WD = 1e-3, 1e-2
    W_WEAK, W_WEAK_CONS, W_AT, W_CONS_MAX = 0.5, 1.0, 0.2, 2.0
    D, C = 192, 10
    N_SAMPLES = 320000  # 10 s: the reference forward hard-asserts pred T==1000 (passt_sed.py:260)

    def _config(self):
        return {
            "training": {
                # [strong, synth, weak, unlabeled]; train() folds synth
                # into strong (train.py:135-136)
                "batch_size": [1, 1, self.W, self.U],
                "transform": dict(TRANSFORM_OFF),
                "self_loss_warmup": 1,  # * epoch_len(=N_STEPS) steps
                "cons_scheduler_name": "Sigmoid",
                "w_cons_max": self.W_CONS_MAX,
                "w_cons_min": 0.0,
                "w_weak": self.W_WEAK,
                "w_weak_cons": self.W_WEAK_CONS,
                "w_AT": self.W_AT,
                "clip_grad": False,
                "ema_factor": 0.999,
            },
            "PaSST_SED": {
                "train_stu_kwargs": {"temp_w": 1.0},
                "train_tch_kwargs": {"temp_w": 1.0},
            },
        }

    def _build_ref(self, ref_train):
        ref_mod = load("src.models.passt.passt_sed")
        torch.manual_seed(40)
        net = ref_mod.PaSST_SED(
            embed_dim=self.D, decoder_dim=self.D, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, load_pretrained_model=False,
            class_num=self.C, at_adapter=True)
        # deterministic train-mode mel (see module docstring)
        net.mel_trans.fmin_aug_range = 1
        net.mel_trans.fmax_aug_range = 1
        return net

    def test_get_mask_is_our_static_slices(self):
        ref_train = load("recipes.desed.finetune.train")
        trainer = object.__new__(ref_train.Trainer)  # get_mask needs no state
        wavs = torch.zeros(6, 10)
        ms, mw, mu = trainer.get_mask(wavs, 2, 3, 1)
        assert ms.tolist() == [1, 1, 0, 0, 0, 0]
        assert mw.tolist() == [0, 0, 1, 1, 1, 0]
        assert mu.tolist() == [0, 0, 0, 0, 0, 1]
        # ours: [strong | weak | unlabeled] static slices — same partition

    def test_get_self_weight_matches_consistency_weight(self):
        """The live ramp (train.py:96-115, reading scheduler.step_num =
        completed+1) vs our consistency_weight(step+1)."""
        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            consistency_weight,
        )

        ref_train = load("recipes.desed.finetune.train")
        for name, our_name in (("Sigmoid", "Sigmoid"), ("Linear", "Linear")):
            warmup_epochs, epoch_len = 2, 5
            trainer = object.__new__(ref_train.Trainer)
            trainer.config = {"training": {
                "self_loss_warmup": warmup_epochs, "cons_scheduler_name": name}}
            # NOTE do not pre-set trainer._train_epoch_len: the reference
            # property assigns a LOCAL _train_epoch_len (train.py:91-94,
            # missing `self.`), so its cache branch raises
            # UnboundLocalError whenever the attribute exists — it only
            # works because the attribute is never actually cached
            trainer.train_loader = [None] * epoch_len
            cfg = MeanTeacherConfig(
                w_cons_max=1.0, w_cons_min=0.0,
                self_loss_warmup_steps=warmup_epochs * epoch_len,
                cons_scheduler=our_name,
            )
            for completed in range(0, 14):
                trainer.scheduler = types.SimpleNamespace(step_num=completed + 1)
                ref_w = trainer.get_self_weight()
                ours = float(consistency_weight(jnp.asarray(completed + 1), cfg))
                np.testing.assert_allclose(ours, ref_w, rtol=1e-6, atol=1e-7,
                                           err_msg=f"{name} completed={completed}")

    def test_three_step_epoch_matches(self, monkeypatch):
        import optax

        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.train.mean_teacher import (
            MeanTeacherConfig,
            create_mean_teacher_state,
            make_mean_teacher_step,
        )
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        _neutralize_python_rng(monkeypatch)
        ref_train = load("recipes.desed.finetune.train")
        net = self._build_ref(ref_train)
        ema_net = copy.deepcopy(net)
        sd = {k: np.copy(v.detach().numpy()) for k, v in net.state_dict().items()}

        s, w, u = self.S, self.W, self.U
        B = s + w + u
        rng = np.random.RandomState(41)
        wav_np = (rng.randn(B, self.N_SAMPLES) * 0.1).astype(np.float32)
        T_pred = 1000
        labels_np = np.zeros((B, self.C, T_pred), np.float32)
        labels_np[:s] = (rng.rand(s, self.C, T_pred) > 0.9).astype(np.float32)
        labels_np[s : s + w, :, 0] = (rng.rand(w, self.C) > 0.5).astype(np.float32)

        config = self._config()
        opt = torch.optim.AdamW(net.parameters(), lr=self.LR, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=self.WD)
        sched_mod = load("src.utils.scheduler")
        # scale == 1 throughout (start_iter >> N_STEPS): the schedule
        # shapes themselves are live-pinned in TestSchedulerLive
        scheduler = sched_mod.ExponentialDown(
            opt, start_iter=1000, total_iter=2000, exponent=-0.5, warmup_iter=0)
        loader = [(t(wav_np), t(labels_np), 0, 0)] * self.N_STEPS
        my_logger = _dummy_logger()
        trainer = ref_train.Trainer(
            optimizer=opt, my_logger=my_logger, net=net, ema_net=ema_net,
            scheduler=scheduler, encoder=types.SimpleNamespace(net_pooling=1),
            train_loader=loader, val_loader=None, test_loader=None,
            config=config, device=torch.device("cpu"))
        trainer.train(epoch=0)
        ref_avg_loss = my_logger.tensorboard_writer.scalars["Train/loss_total"]
        ref_avg_strong = my_logger.tensorboard_writer.scalars["Train/loss_class_strong"]

        # ---- ours: same weights via the converter, same 3 steps ----
        init_kwargs = dict(
            class_num=self.C, embed_dim=self.D, decoder_dim=self.D,
            backbone_depth=12, backbone_num_heads=12, decoder_num_heads=12,
            at_adapter_heads=12, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, at_adapter=True)
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        model = PaSST_SED(**init_kwargs)

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            # all drop rates are 0: train-mode forwards are deterministic
            return model.apply({"params": p}, mel_in, **kw)

        cfg = MeanTeacherConfig(
            strong_num=s, weak_num=w, unlabel_num=u, net_pooling=1,
            w_weak=self.W_WEAK, w_weak_cons=self.W_WEAK_CONS, w_at=self.W_AT,
            w_cons_max=self.W_CONS_MAX, w_cons_min=0.0,
            self_loss_warmup_steps=self.N_STEPS, cons_scheduler="Sigmoid",
            ema_factor=0.999, mixup_prob=0.0, max_shift_frame=0, n_transform=0,
            stu_kwargs={"temp_w": 1.0}, tch_kwargs={"temp_w": 1.0})
        tx = optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.WD)
        step_fn = jax.jit(make_mean_teacher_step(
            model_apply, _neutral_frontend(), tx, cfg))
        state = create_mean_teacher_state(params, tx)
        batch = {"wav": jnp.asarray(wav_np), "labels": jnp.asarray(labels_np)}
        losses, strongs = [], []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_total"]))
            strongs.append(float(metrics["loss_class_strong"]))

        np.testing.assert_allclose(np.mean(losses), ref_avg_loss, atol=2e-3)
        np.testing.assert_allclose(np.mean(strongs), ref_avg_strong, atol=2e-3)

        # final student AND teacher forwards on the shared eval mel: pins
        # the whole grad -> AdamW -> scheduler -> EMA chain end-state
        net.eval()
        ema_net.eval()
        with torch.no_grad():
            mel_t = net.mel_trans(t(wav_np))
            mel_t = net.mel_trans.normalize(mel_t)
            stu_ref = net(mel_t, temp_w=1.0)
            tch_ref = ema_net(mel_t, temp_w=1.0)
        fe = _neutral_frontend()
        mel_j = fe.normalize(fe(jnp.asarray(wav_np)))
        out = model.apply({"params": state.params}, mel_j, temp_w=1.0)
        tout = model.apply({"params": state.teacher_params}, mel_j, temp_w=1.0)
        np.testing.assert_allclose(
            np.asarray(out.strong), stu_ref[0].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(tout.strong), tch_ref[0].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out.at_out), stu_ref[2]["at_out"].numpy(), atol=5e-3)


# ---------------------------------------------------------------------------
# recipes/desed/mlm/mlm_passt/train.py — the MLM pretraining Trainer, live
# ---------------------------------------------------------------------------


class _ListLogger:
    """Plain-logging stand-in capturing the trainer's info() messages."""

    def __init__(self):
        self.messages = []

    def info(self, msg, *args):
        self.messages.append(msg.format(*args) if args else str(msg))


class TestMLMTrainerLive:
    """The actual ``MLMTrainer`` from ``mlm_passt/train.py``: a 3-step
    ``train()`` epoch (mel -> frame_shift -> transform -> masked
    forward -> masked-MSE -> AdamW) against ``make_mlm_step`` with
    converter-shared weights. Masking is deterministic via
    ``mask_rate=1.0, mask_style=(1,0,0)`` — every frame becomes the
    mask token on both sides (``src/models/transformer/mask.py:71-75``:
    rand < 1.0 is always true).

    REFERENCE BUG (found live, r4): ``MlmModule.setence_mask``
    (``src/models/transformer/mask.py:69-71``) writes the mask token
    through ``token_seq_new.reshape(-1, C)[mask] = mask_token``. The
    decoder input is NON-contiguous in every real PaSST_SED forward
    (``InterpolateModule`` interpolates in [B,C,T] then transposes
    back, ``passt_sed.py:31-34``), ``.clone()`` preserves the layout,
    so ``reshape`` returns a COPY and the in-place write is silently
    discarded: upstream MLM pretraining never corrupts its input. We
    implement the *intended* semantics (real masking); the trajectory
    test below monkeypatches the reference onto its intended path by
    making the input contiguous, and
    ``test_reference_masking_is_silent_noop`` pins the bug itself."""

    N_STEPS = 3
    LR, WD = 1e-3, 1e-2
    D, B = 192, 3

    MLM_DICT = {"out_dim": 192, "mask_rate": 1.0,
                "mask_style": (1.0, 0.0, 0.0), "strategy": "random"}

    def test_three_step_epoch_matches(self, monkeypatch):
        import optax

        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.train.mlm import (
            MLMConfig,
            create_mlm_state,
            make_mlm_step,
            mlm_loss,
        )
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        _neutralize_python_rng(monkeypatch)
        ref_train = load("recipes.desed.mlm.mlm_passt.train")
        ref_mod = load("src.models.passt.passt_sed")
        torch.manual_seed(50)
        # reference bug: mlm=True + load_pretrained_model=False raises
        # UnboundLocalError ('device' is only bound inside the
        # load_pretrained branch, passt_sed.py:112/135) — replicate the
        # ctor's init_mlm call manually with an explicit device
        net = ref_mod.PaSST_SED(
            embed_dim=self.D, decoder_dim=self.D, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, load_pretrained_model=False,
            class_num=10, at_adapter=False, mlm=False)
        net.mlm = True
        net.init_mlm(device=torch.device("cpu"), mlm_dict=dict(self.MLM_DICT))
        net.mel_trans.fmin_aug_range = 1
        net.mel_trans.fmax_aug_range = 1
        # route the reference onto its INTENDED masking path (see class
        # docstring: with the production non-contiguous decoder input the
        # reference's masking is a silent no-op)
        orig_mask = net.mlm_tool.setence_mask
        net.mlm_tool.setence_mask = lambda ts, mt: orig_mask(ts.contiguous(), mt)
        sd = {k: np.copy(v.detach().numpy()) for k, v in net.state_dict().items()}

        rng = np.random.RandomState(51)
        wav_np = (rng.randn(self.B, 320000) * 0.1).astype(np.float32)

        config = {"training": {
            "transform": dict(TRANSFORM_OFF, n_transform=1),
            "encoder_win": False,
        }}
        opt = torch.optim.AdamW(net.parameters(), lr=self.LR, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=self.WD)
        sched_mod = load("src.utils.scheduler")
        scheduler = sched_mod.ExponentialDown(
            opt, start_iter=1000, total_iter=2000, exponent=-0.5, warmup_iter=0)
        loader = [(t(wav_np), 0, 0, 0)] * self.N_STEPS
        logger = _ListLogger()
        trainer = ref_train.MLMTrainer(
            net, loader, None, config, opt, scheduler,
            types.SimpleNamespace(net_pooling=1), logger, torch.device("cpu"))
        trainer.train(epoch=0)
        # "Epoch 0: Train loss is <x>"
        ref_mean_loss = float(logger.messages[0].rsplit(" ", 1)[-1])

        # ---- ours ----
        init_kwargs = dict(
            class_num=10, embed_dim=self.D, decoder_dim=self.D,
            backbone_depth=12, backbone_num_heads=12, decoder_num_heads=12,
            passt_feature_layer=10, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=1000, at_adapter=False,
            mlm=True, mlm_dict=dict(self.MLM_DICT))
        params, _ = convert_torch_checkpoint(sd, "PaSST_SED", init_kwargs=init_kwargs)
        model = PaSST_SED(**init_kwargs)

        def model_apply(p, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": p}, mel_in, train=train, rngs=rngs, **kw)

        cfg = MLMConfig(max_shift_frame=0, transform_choice=(0, 0, 0, 0))
        tx = optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.WD)
        step_fn = jax.jit(make_mlm_step(model_apply, _neutral_frontend(), tx, cfg))
        state = create_mlm_state(params, tx)
        losses = []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(state, {"wav": jnp.asarray(wav_np)},
                                     jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_mlm"]))
        np.testing.assert_allclose(np.mean(losses), ref_mean_loss, atol=2e-3)

        # final reconstruction loss on the shared input (all-masked ->
        # deterministic eval on both sides) pins the AdamW end-state
        net.eval()
        with torch.no_grad():
            mel_t = net.mel_trans.normalize(net.mel_trans(t(wav_np)))
            pred, other = net(mel_t, encoder_win=False)
            ref_final = float(torch.nn.functional.mse_loss(
                other["frame_before_mask"][other["mask_id_seq"]],
                pred[other["mask_id_seq"]]))
        fe = _neutral_frontend()
        mel_j = fe.normalize(fe(jnp.asarray(wav_np)))
        out = model.apply({"params": state.params}, mel_j,
                          rngs={"mlm": jax.random.PRNGKey(9)})
        ours_final = float(mlm_loss(
            out.mlm_pred, out.frame_before_mask,
            out.mask_id_seq.astype(jnp.float32)))
        np.testing.assert_allclose(ours_final, ref_final, atol=2e-3)

    def test_reference_masking_is_silent_noop(self):
        """Pin the reference bug justifying our intentional deviation:
        ``setence_mask`` leaves a NON-contiguous input untouched
        (``reshape`` copies, the in-place write is discarded,
        ``src/models/transformer/mask.py:69-71``) while the same call
        on a contiguous tensor masks every frame. PaSST_SED's decoder
        input is always non-contiguous (``InterpolateModule``,
        ``passt_sed.py:31-34``), so upstream MLM pretraining runs
        reconstruction on uncorrupted input; we mask for real."""
        mask_mod = load("src.models.transformer.mask")
        tool = mask_mod.MlmModule(device=None, **{k: v for k, v in self.MLM_DICT.items()
                                                  if k != "out_dim"})
        torch.manual_seed(0)
        mask_token = torch.randn(1, 1, self.D)
        # same [B,T,C] layout the production forward produces: transpose
        # of a contiguous [B,C,T] tensor
        x = torch.randn(2, self.D, 50).transpose(1, 2)
        assert not x.is_contiguous() and not x.clone().is_contiguous()
        masked, mask_id = tool.setence_mask(x, mask_token)
        assert bool(mask_id.all())  # mask_rate=1.0: every frame selected
        torch.testing.assert_close(masked, x)  # ...yet nothing was masked
        masked_c, _ = tool.setence_mask(x.contiguous(), mask_token)
        torch.testing.assert_close(
            masked_c, mask_token.expand(2, 50, self.D))  # intended path


# ---------------------------------------------------------------------------
# recipes/audioset_strong/base/passt_cnn/train.py — supervised Trainer, live
# ---------------------------------------------------------------------------


class TestAudioSetSupervisedTrainerLive:
    """The actual supervised ``Trainer`` from
    ``audioset_strong/base/passt_cnn/train.py``: a 3-step ``train()``
    epoch on a live PaSST_CNN (BatchNorm CNN branch threaded through
    the step) against ``make_supervised_step``."""

    N_STEPS = 3
    LR, WD = 1e-3, 1e-2
    D, C, B = 192, 10, 3

    CNN_PARAM = {
        "n_in_channel": 1,
        "nb_filters": [8, 8, 8, 8],
        "kernel_size": [3, 3, 3, 3], "padding": [1, 1, 1, 1],
        "stride": [1, 1, 1, 1],
        "pooling": [(1, 4), (1, 4), (1, 4), (1, 2)],
        "activation": "glu", "normalization": "batch",
    }

    def test_three_step_epoch_matches(self, monkeypatch):
        import optax

        from transformer4sed_tpu.models.passt_cnn import PaSST_CNN
        from transformer4sed_tpu.recipes.audioset_strong import (
            SupervisedConfig,
            make_supervised_step,
        )
        from transformer4sed_tpu.recipes.common import make_model_apply
        from transformer4sed_tpu.train.mlm import MLMState
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        _neutralize_python_rng(monkeypatch)
        ref_train = load("recipes.audioset_strong.base.passt_cnn.train")
        ref_mod = load("src.models.cnn_transformer.passt_cnn")
        torch.manual_seed(60)
        net = ref_mod.PaSST_CNN(
            passt_sed_param=dict(
                embed_dim=self.D, decoder_dim=self.D, passt_feature_layer=10,
                decoder="transformerXL", decoder_layer_num=1,
                decoder_pos_emd_len=1000, load_pretrained_model=False,
                class_num=self.C, at_adapter=False),
            cnn_param=dict(self.CNN_PARAM, nb_filters=list(self.CNN_PARAM["nb_filters"])),
        )
        fx = net.get_feature_extractor()
        fx.fmin_aug_range = 1
        fx.fmax_aug_range = 1
        sd = {k: np.copy(v.detach().numpy()) for k, v in net.state_dict().items()}

        rng = np.random.RandomState(61)
        wav_np = (rng.randn(self.B, 320000) * 0.1).astype(np.float32)
        labels_np = (rng.rand(self.B, self.C, 1000) > 0.9).astype(np.float32)

        config = {
            "class_loss": {"loss_name": "BCELoss", "kwargs": {}},
            "training": {
                "transform": dict(TRANSFORM_OFF, n_transform=1),
                "clip_grad": False,
            },
            "PaSST_CNN": {"train_kwargs": {"temp_w": 1.0}},
        }
        opt = torch.optim.AdamW(net.parameters(), lr=self.LR, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=self.WD)
        sched_mod = load("src.utils.scheduler")
        scheduler = sched_mod.ExponentialDown(
            opt, start_iter=1000, total_iter=2000, exponent=-0.5, warmup_iter=0)
        loader = [(t(wav_np), t(labels_np), 0, 0)] * self.N_STEPS
        my_logger = _dummy_logger()
        trainer = ref_train.Trainer(
            optimizer=opt, my_logger=my_logger, net=net, scheduler=scheduler,
            encoder=types.SimpleNamespace(sr=32000, net_pooling=1),
            train_loader=loader, val_loader=None, test_loader=None,
            config=config, device=torch.device("cpu"))
        trainer.train(epoch=0)
        ref_avg = my_logger.tensorboard_writer.scalars["Train/loss_class_strong"]

        # ---- ours ----
        init_kwargs = dict(
            class_num=self.C, embed_dim=self.D, decoder_dim=self.D,
            backbone_depth=12, backbone_num_heads=12, decoder_num_heads=12,
            passt_feature_layer=10, decoder="transformerXL",
            decoder_layer_num=1, decoder_pos_emd_len=1000, at_adapter=False,
            cnn_param={k: v for k, v in self.CNN_PARAM.items()})
        params, torch_state = convert_torch_checkpoint(
            sd, "PaSST_CNN", init_kwargs=init_kwargs)
        model_state = torch_state or None
        model = PaSST_CNN(**init_kwargs)
        model_apply = make_model_apply(model, model_state_aware=True)

        cfg = SupervisedConfig(
            loss_name="BCELoss", mixup_prob=0.0, max_shift_frame=0,
            transform_choice=(0, 0, 0, 0), model_kwargs={"temp_w": 1.0})
        tx = optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=self.WD)
        step_fn = jax.jit(make_supervised_step(model_apply, _neutral_frontend(), tx, cfg))
        state = MLMState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32), model_state=model_state)
        losses = []
        for i in range(self.N_STEPS):
            state, metrics = step_fn(
                state, {"wav": jnp.asarray(wav_np), "labels": jnp.asarray(labels_np)},
                jax.random.PRNGKey(i))
            losses.append(float(metrics["loss_class_strong"]))
        np.testing.assert_allclose(np.mean(losses), ref_avg, atol=2e-3)

        # final eval forward (running BN stats after 3 train steps)
        net.eval()
        with torch.no_grad():
            mel_t = fx.normalize(fx(t(wav_np)))
            strong_ref, _, _ = net(mel_t, temp_w=1.0)
        fe = _neutral_frontend()
        mel_j = fe.normalize(fe(jnp.asarray(wav_np)))
        out, _ = model_apply(state.params, mel_j, train=False,
                             model_state=state.model_state, temp_w=1.0)
        np.testing.assert_allclose(
            np.asarray(out.strong), strong_ref.numpy(), atol=5e-3)


# ---------------------------------------------------------------------------
# recipes/desed/finetune/train.py — validation() and test() as a SYSTEM, live
# ---------------------------------------------------------------------------


def _append_shim(monkeypatch):
    """pandas 3 removed DataFrame.append (the reference targets 1.x)."""
    import pandas as pd

    monkeypatch.setattr(
        pd.DataFrame, "append",
        lambda self, other, ignore_index=False: pd.concat(
            [self, other], ignore_index=ignore_index),
        raising=False)


def _df_to_clip_scores(df, labels):
    from transformer4sed_tpu.eval.scores import ClipScores

    return ClipScores(
        scores=df[list(labels)].to_numpy(),
        timestamps=np.concatenate(
            [df["onset"].to_numpy(), df["offset"].to_numpy()[-1:]]),
        event_classes=tuple(labels))


class _PsdsCapture:
    """Capture-and-delegate stand-in for the reference's
    ``compute_psds_from_scores`` (``src/evaluation_measures.py:299-341``,
    a thin forward to sed_scores_eval.intersection_based.psds): records
    the score buffer + the exact PSDS parameters the reference passes,
    then computes the value through OUR native sweep (triple-pinned
    equal to sed_scores_eval by tests/test_psds_brute.py) with the SAME
    parameters/defaults our trainer uses — so equal buffers imply equal
    PSDS values on both sides."""

    def __init__(self, labels):
        self.labels = labels
        self.calls = []

    def __call__(self, scores, ground_truth_file, durations_file,
                 dtc_threshold=0.5, gtc_threshold=0.5, cttc_threshold=0.3,
                 alpha_ct=0, alpha_st=0, max_efpr=100, num_jobs=4,
                 save_dir=None):
        from transformer4sed_tpu.eval.psds import compute_psds_from_scores
        from transformer4sed_tpu.recipes import common

        kw = dict(dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
                  cttc_threshold=cttc_threshold, alpha_ct=alpha_ct,
                  alpha_st=alpha_st, max_efpr=max_efpr)
        self.calls.append(({k: v.copy() for k, v in scores.items()}, dict(kw)))
        conv = {k: _df_to_clip_scores(v, self.labels) for k, v in scores.items()}
        gt = common.load_ground_truth(ground_truth_file)
        dur = common.load_durations(durations_file)
        kw["cttc_threshold"] = 0.3 if cttc_threshold is None else cttc_threshold
        val, single = compute_psds_from_scores(conv, gt, dur, num_jobs=1, **kw)
        return val, single


class _SedEvalCapture:
    """Capture-and-delegate for ``log_sedeval_metrics``
    (``src/evaluation_measures.py:256-292``): records the decoded event
    DataFrame and computes event/segment F1 through OUR host metrics
    (collar semantics pinned in tests/test_eval.py)."""

    def __init__(self, labels):
        self.labels = labels
        self.frames = []

    def __call__(self, predictions, ground_truth, save_dir=None,
                 return_class_wise=False):
        from transformer4sed_tpu.eval.sed_f1 import event_based_f1
        from transformer4sed_tpu.recipes import common

        self.frames.append(predictions.copy())
        if predictions.empty:
            return 0.0, 0.0, 0.0, 0.0
        pred_events = {}
        for r in predictions.itertuples():
            stem = str(r.filename).rsplit(".", 1)[0]
            pred_events.setdefault(stem, []).append(
                (float(r.onset), float(r.offset), str(r.event_label)))
        gt = common.load_ground_truth(ground_truth)
        for stem in gt:
            pred_events.setdefault(stem, [])
        ef = event_based_f1(pred_events, gt, self.labels)
        # segment F1 is not consumed by the validation/test log paths
        # under comparison (only event macro is) — return zeros for it
        return ef["macro_f1"], ef["micro_f1"], 0.0, 0.0


class TestEvalSystemLive:
    """The reference ``Trainer.validation``/``test`` run LIVE as systems
    (``recipes/desed/finetune/train.py:274-398,409-522``) against
    ``MATSEDTrainer.validation``/``test`` with converter-shared weights:
    per-clip postprocessed score DataFrames, decoded 0.5-threshold event
    tables, the PSDS parameter sets, and the resulting PSDS/F1 numbers
    must all match — for the median AND max filter paths and the
    finetune2 ``encoder_win`` sliding-window validation (VERDICT r4
    item 1: the last system seam previously pinned only piecewise)."""

    D, C, B = 192, 10, 3
    N_SAMPLES = 320000
    LABELS = [f"c{i}" for i in range(10)]

    @pytest.fixture(scope="class")
    def rig(self, tmp_path_factory):
        from transformer4sed_tpu.utils.torch_import import convert_torch_checkpoint

        ref_train = load("recipes.desed.finetune.train")
        ref_mod = load("src.models.passt.passt_sed")

        def build(seed):
            torch.manual_seed(seed)
            net = ref_mod.PaSST_SED(
                embed_dim=self.D, decoder_dim=self.D, passt_feature_layer=10,
                decoder="transformerXL", decoder_layer_num=1,
                decoder_pos_emd_len=1000, load_pretrained_model=False,
                class_num=self.C, at_adapter=True)
            net.mel_trans.fmin_aug_range = 1
            net.mel_trans.fmax_aug_range = 1
            return net

        net, ema_net = build(70), build(71)  # student != teacher
        init_kwargs = dict(
            class_num=self.C, embed_dim=self.D, decoder_dim=self.D,
            backbone_depth=12, backbone_num_heads=12, decoder_num_heads=12,
            at_adapter_heads=12, passt_feature_layer=10,
            decoder="transformerXL", decoder_layer_num=1,
            decoder_pos_emd_len=1000, at_adapter=True)
        params = {}
        for tag, n in (("s", net), ("t", ema_net)):
            sd = {k: np.copy(v.detach().numpy()) for k, v in n.state_dict().items()}
            params[tag], _ = convert_torch_checkpoint(
                sd, "PaSST_SED", init_kwargs=init_kwargs)

        # mini val split on disk (GT events + durations)
        root = tmp_path_factory.mktemp("eval_sys")
        rng = np.random.RandomState(72)
        wav_np = (rng.randn(self.B, self.N_SAMPLES) * 0.1).astype(np.float32)
        labels_np = np.zeros((self.B, self.C, 1000), np.float32)
        gt_rows, dur_rows, names = [], [], []
        for i in range(self.B):
            name = f"v{i}.wav"
            names.append(name)
            on, off = 1.0 + i, 4.0 + i
            cls = i % self.C
            labels_np[i, cls, int(on * 100):int(off * 100)] = 1.0
            gt_rows.append((name, on, off, self.LABELS[cls]))
            dur_rows.append((name, 10.0))
        import pandas as pd

        val_tsv = root / "val.tsv"
        val_dur = root / "dur.tsv"
        pd.DataFrame(gt_rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
            val_tsv, sep="\t", index=False)
        pd.DataFrame(dur_rows, columns=["filename", "duration"]).to_csv(
            val_dur, sep="\t", index=False)
        return {
            "ref_train": ref_train, "net": net, "ema_net": ema_net,
            "params": params, "init_kwargs": init_kwargs, "wav": wav_np,
            "labels": labels_np, "names": names, "val_folder": str(root),
            "val_tsv": str(val_tsv), "val_dur": str(val_dur),
        }

    def _ref_config(self, rig, val_kwargs, filter_type="median"):
        return {
            "training": {"weak_mask": True, "median_window": [7] * self.C,
                         "filter_type": filter_type,
                         "psds_folders": [None, None]},
            "feature": {"pred_len": 1000},
            "dataset": {"val_folder": rig["val_folder"],
                        "val_tsv": rig["val_tsv"], "val_dur": rig["val_dur"],
                        "test_tsv": rig["val_tsv"], "test_dur": rig["val_dur"]},
            "generals": {"predict": False, "test_on_public_eval": False},
            "PaSST_SED": {"val_kwargs": dict(val_kwargs)},
        }

    def _ref_trainer(self, rig, config, loader):
        ref_train = rig["ref_train"]
        return ref_train.Trainer(
            optimizer=None, my_logger=_dummy_logger(), net=rig["net"],
            ema_net=rig["ema_net"], scheduler=None,
            encoder=load("src.codec.encoder").Encoder(
                list(self.LABELS), audio_len=10.0, frame_len=1024,
                frame_hop=320, net_pooling=1, sr=32000),
            train_loader=None, val_loader=loader, test_loader=loader,
            config=config, device=torch.device("cpu"))

    def _ref_loader(self, rig):
        paths = [f"{rig['val_folder']}/{n}" for n in rig["names"]]
        pad_mask = torch.zeros(self.B, 1000, dtype=torch.bool)
        return [(t(rig["wav"]), t(rig["labels"]), pad_mask, 0,
                 list(rig["names"]), paths)]

    def _our_trainer(self, rig, val_kwargs, monkeypatch, capture):
        """MATSEDTrainer over the same split, with the production decode
        helpers wrapped to record the per-clip buffers they produce."""
        from transformer4sed_tpu.core.codec import LabelCodec
        from transformer4sed_tpu.models.passt_sed import PaSST_SED
        from transformer4sed_tpu.recipes import matsed
        from transformer4sed_tpu.utils.logging import Logger

        real_bdp = matsed.batched_decode_preds
        real_dpb = matsed.decode_pred_batch

        def rec_bdp(*args, **kwargs):
            raw, post = real_bdp(*args, **kwargs)
            capture.setdefault("bdp", []).append((raw, post))
            return raw, post

        def rec_dpb(*args, **kwargs):
            out = real_dpb(*args, **kwargs)
            capture.setdefault("dpb", []).append(out)
            return out

        monkeypatch.setattr(matsed, "batched_decode_preds", rec_bdp)
        monkeypatch.setattr(matsed, "decode_pred_batch", rec_dpb)

        config = {
            "model_name": "PaSST_SED",
            "generals": {"seed": 0, "val_interval": 1},
            "feature": {"pred_len": 1000},
            "dataset": {"val_tsv": rig["val_tsv"], "val_dur": rig["val_dur"],
                        "val_folder": rig["val_folder"]},
            "training": {
                "batch_size": [1, 1, 1, 1], "weak_mask": True,
                "median_window": [7] * self.C,
                "scheduler": {"n_epochs": 1, "n_epochs_cut": 1, "exponent": -1,
                              "lr_warmup_epochs": 0, "lr_warmup_rate": 0.1},
                "transform": {"n_transform": 0, "choice": [0, 0, 0, 0]},
            },
            "PaSST_SED": {"val_kwargs": dict(val_kwargs),
                          "test_kwargs": dict(val_kwargs),
                          "train_stu_kwargs": {}, "train_tch_kwargs": {}},
            "opt": {"param_groups": {
                "encoder": {"lr": 1e-4, "weight_decay": 1e-4, "freeze_layer": 0, "step_lr": 1},
                "decoder": {"lr": 1e-3, "weight_decay": 1e-4},
                "head": {"lr": 1e-3, "weight_decay": 1e-4}}},
            "backbone_depth": 12,
        }
        codec = LabelCodec(self.LABELS, audio_len=10.0, frame_len=1024,
                           frame_hop=320, net_pooling=1, sr=32000)
        batch = {"wav": rig["wav"], "label": rig["labels"],
                 "pad_mask": np.zeros((self.B, 1000), bool),
                 "filename": list(rig["names"])}
        model = PaSST_SED(**rig["init_kwargs"])
        trainer = matsed.MATSEDTrainer(
            model, _neutral_frontend(), config, codec,
            train_loader=[batch], val_loader=[batch], test_loader=[batch],
            logger=Logger(), init_params=rig["params"]["s"],
            init_model_state={})
        # the reference teacher is a DIFFERENTLY seeded net
        trainer.state = trainer.state.replace(teacher_params=rig["params"]["t"])
        return trainer

    def _assert_scores_close(self, ref_buffer, our_scores, atol, msg):
        assert set(ref_buffer) == set(our_scores), msg
        for audio_id, ref_df in ref_buffer.items():
            ours = our_scores[audio_id]
            np.testing.assert_allclose(
                ours.scores, ref_df[list(self.LABELS)].to_numpy(),
                atol=atol, err_msg=f"{msg}: {audio_id} score frames diverged")
            np.testing.assert_allclose(
                ours.timestamps,
                np.concatenate([ref_df["onset"].to_numpy(),
                                ref_df["offset"].to_numpy()[-1:]]),
                atol=1e-9, err_msg=f"{msg}: {audio_id} timestamps diverged")

    def _assert_events_close(self, ref_df, our_rows, msg, atol=0.05):
        """Event tables from near-equal scores: identical (file, label)
        multisets; onsets/offsets within ``atol`` seconds (threshold
        crossings of near-equal filtered scores jitter by <= a frame
        or two; anything larger is a decode-glue bug)."""
        ref_events = sorted(
            (str(r.filename).rsplit(".", 1)[0], str(r.event_label),
             float(r.onset), float(r.offset))
            for r in ref_df.itertuples())
        ours = sorted(
            (fn.rsplit(".", 1)[0], lab, float(on), float(off))
            for fn, lab, on, off in our_rows)
        assert [e[:2] for e in ref_events] == [e[:2] for e in ours], (
            f"{msg}: event (file, label) multisets differ:\n"
            f"ref={ref_events}\nours={ours}")
        for r, o in zip(ref_events, ours):
            assert abs(r[2] - o[2]) <= atol and abs(r[3] - o[3]) <= atol, (
                f"{msg}: event boundary diverged: ref={r} ours={o}")

    def test_validation_system(self, rig, monkeypatch):
        _append_shim(monkeypatch)
        ref_train = rig["ref_train"]
        psds_cap = _PsdsCapture(self.LABELS)
        sed_cap = _SedEvalCapture(self.LABELS)
        monkeypatch.setattr(ref_train, "compute_psds_from_scores", psds_cap)
        monkeypatch.setattr(ref_train, "log_sedeval_metrics", sed_cap)

        config = self._ref_config(rig, {"temp_w": 0.5})
        trainer = self._ref_trainer(rig, config, self._ref_loader(rig))
        logger = trainer.my_logger
        stu_psds1, tch_psds1 = trainer.validation(epoch=0)
        ref_scalars = logger.tensorboard_writer.scalars

        # the reference passed the published PSDS parameter sets
        assert psds_cap.calls[0][1]["dtc_threshold"] == 0.7  # psds1 student
        assert psds_cap.calls[1][1]["alpha_ct"] == 0.5       # psds2 student
        assert psds_cap.calls[1][1]["cttc_threshold"] == 0.3

        capture = {}
        ours = self._our_trainer(rig, {"temp_w": 0.5}, monkeypatch, capture)
        results = ours.validation(0)

        # numbers: PSDS1/2 for student AND teacher, event F1, weak F1
        np.testing.assert_allclose(results["psds1/s"], stu_psds1, atol=5e-3)
        np.testing.assert_allclose(results["psds1/t"], tch_psds1, atol=5e-3)
        np.testing.assert_allclose(
            results["psds2/s"], ref_scalars["validation/psds2/s"], atol=5e-3)
        np.testing.assert_allclose(
            results["psds2/t"], ref_scalars["validation/psds2/t"], atol=5e-3)
        np.testing.assert_allclose(
            results["event_f1/s"], ref_scalars["validation/event-based F1/s"],
            atol=5e-2)  # quantized by per-event matches; tables pinned below
        np.testing.assert_allclose(
            results["weak_f1/s"], ref_scalars["validation/weak f1/s"], atol=1e-6)
        np.testing.assert_allclose(
            results["weak_f1/t"], ref_scalars["validation/weak f1/t"], atol=1e-6)

        # per-clip POSTPROCESSED score DataFrames (the PSDS inputs):
        # reference buffers are the first args of its psds1 calls
        # (student: call 0, teacher: call 2); ours were recorded from the
        # production batched_decode_preds (student batch then teacher batch)
        ref_stu_buffer = psds_cap.calls[0][0]
        ref_tch_buffer = psds_cap.calls[2][0]
        our_stu_post = capture["bdp"][0][1]
        our_tch_post = capture["bdp"][1][1]
        self._assert_scores_close(ref_stu_buffer, our_stu_post, 5e-3, "student val scores")
        self._assert_scores_close(ref_tch_buffer, our_tch_post, 5e-3, "teacher val scores")

        # decoded 0.5-threshold event tables (the sed_eval F1 inputs)
        self._assert_events_close(sed_cap.frames[0], capture["dpb"][0][0.5],
                                  "student val events")
        self._assert_events_close(sed_cap.frames[1], capture["dpb"][1][0.5],
                                  "teacher val events")

    @pytest.mark.parametrize("filter_type", ["median", "max"])
    def test_test_system(self, rig, monkeypatch, filter_type):
        _append_shim(monkeypatch)
        ref_train = rig["ref_train"]
        psds_cap = _PsdsCapture(self.LABELS)
        sed_cap = _SedEvalCapture(self.LABELS)
        monkeypatch.setattr(ref_train, "compute_psds_from_scores", psds_cap)
        monkeypatch.setattr(ref_train, "log_sedeval_metrics", sed_cap)

        config = self._ref_config(rig, {"temp_w": 0.5}, filter_type=filter_type)
        trainer = self._ref_trainer(rig, config, self._ref_loader(rig))
        trainer.test()

        capture = {}
        ours = self._our_trainer(rig, {"temp_w": 0.5}, monkeypatch, capture)
        our_results = ours.test(filter_type=filter_type)

        # final PSDS numbers: ours reports the TEACHER (the model the
        # reference's published numbers track and BestModels selects).
        # The capture delegated the reference's values to the same native
        # sweep, so re-derive them from the captured buffers+parameters:
        # calls are [stud psds1, stud psds2, tch psds1, tch psds2]
        from transformer4sed_tpu.eval.psds import compute_psds_from_scores
        from transformer4sed_tpu.recipes import common as rcommon

        ref_vals = []
        for buf, kw in psds_cap.calls:
            conv = {k: _df_to_clip_scores(v, self.LABELS) for k, v in buf.items()}
            kw = dict(kw)
            kw["cttc_threshold"] = kw["cttc_threshold"] or 0.3
            val, _ = compute_psds_from_scores(
                conv, rcommon.load_ground_truth(rig["val_tsv"]),
                rcommon.load_durations(rig["val_dur"]), num_jobs=1, **kw)
            ref_vals.append(val)
        np.testing.assert_allclose(our_results["psds1"], ref_vals[2], atol=5e-3)
        np.testing.assert_allclose(our_results["psds2"], ref_vals[3], atol=5e-3)

        # teacher postprocessed score buffer vs our production test decode
        # (our test stage calls batched_decode_preds once, teacher batch)
        _, our_post = capture["bdp"][0]
        self._assert_scores_close(psds_cap.calls[2][0], our_post, 5e-3,
                                  f"teacher test post scores ({filter_type})")

        # student-side coverage through our production collection path
        # (our test stage itself reports teacher-only); _collect_scores
        # filters with the median path, so pin it on the median case and
        # the 0.5-threshold student event table with it
        if filter_type == "median":
            stu_scores, stu_rows, _, _ = ours._collect_scores(
                ours.state.params, "test_kwargs")
            self._assert_scores_close(psds_cap.calls[0][0], stu_scores, 5e-3,
                                      "student test post scores")
            self._assert_events_close(sed_cap.frames[0], stu_rows,
                                      "student test events")

    def test_validation_encoder_win_system(self, rig, monkeypatch):
        """finetune2 sliding-window validation: ``encoder_win=True,
        win_param=[512, 31]`` (config/mat-sed/base/finetune2.yaml
        val_kwargs) through BOTH full validation systems."""
        _append_shim(monkeypatch)
        ref_train = rig["ref_train"]
        psds_cap = _PsdsCapture(self.LABELS)
        sed_cap = _SedEvalCapture(self.LABELS)
        monkeypatch.setattr(ref_train, "compute_psds_from_scores", psds_cap)
        monkeypatch.setattr(ref_train, "log_sedeval_metrics", sed_cap)

        # upstream hardcodes the slide accumulator to out_dim=768
        # (passt_sed.py:269 builds PasstWithSlide without out_dim,
        # encoder_slide_window.py:10 defaults 768) — crashes for any
        # other decoder_dim. Route the REFERENCE onto its intended path
        # at this test's D=192 (scaffolding, not a behavior change).
        ref_win = load("src.models.passt.passt_win")
        monkeypatch.setattr(
            ref_win.PasstWithSlide, "__init__",
            lambda self, net, win_param=(512, 29): ref_win.EncoderSlideWindow.__init__(
                self, net, list(win_param), out_dim=net.decoder_dim))

        val_kwargs = {"temp_w": 0.5, "encoder_win": True,
                      "win_param": [512, 31], "mix_rate": 0.5}
        config = self._ref_config(rig, val_kwargs)
        trainer = self._ref_trainer(rig, config, self._ref_loader(rig))
        stu_psds1, tch_psds1 = trainer.validation(epoch=0)

        capture = {}
        ours = self._our_trainer(rig, val_kwargs, monkeypatch, capture)
        results = ours.validation(0)

        np.testing.assert_allclose(results["psds1/s"], stu_psds1, atol=5e-3)
        np.testing.assert_allclose(results["psds1/t"], tch_psds1, atol=5e-3)
        # slide-window overlap-add accumulates ~17 windowed forwards per
        # clip; per-frame error stays averaging-bounded (slightly wider)
        self._assert_scores_close(psds_cap.calls[0][0], capture["bdp"][0][1],
                                  8e-3, "student encoder_win val scores")
        self._assert_scores_close(psds_cap.calls[2][0], capture["bdp"][1][1],
                                  8e-3, "teacher encoder_win val scores")
        self._assert_events_close(sed_cap.frames[0], capture["dpb"][0][0.5],
                                  "student encoder_win val events")
