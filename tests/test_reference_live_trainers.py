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
