"""Mean-teacher semi-supervised training — the MAT-SED hot loop as ONE
jitted program.

The reference epoch body (``recipes/desed/finetune/train.py:129-213``)
spans the mel frontend, augmentation, student forward, teacher forward
(no grad), six losses, backward, AdamW step, LR scheduler and EMA
update, each as separate eager calls. Here the entire body is a single
pure function of (state, batch, key): XLA fuses frontend+augmentation
into the backbone's first matmuls, the teacher forward runs under
``stop_gradient``, and the EMA update is a tree-map on identically
sharded student/teacher trees (zero extra communication under pjit).

Batch layout is the fixed multi-source composition
[strong | weak | unlabeled] (``ConcatDatasetBatchSampler`` semantics,
``src/preprocess/dataset.py:156-195``), so the reference's boolean
index masks become *static slices*.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transformer4sed_tpu.core import losses as L
from transformer4sed_tpu.core.ema import ema_update
from transformer4sed_tpu.frontend import augment


@dataclass(frozen=True)
class MeanTeacherConfig:
    # batch composition (strong includes synth, as the reference folds them)
    strong_num: int = 4
    weak_num: int = 4
    unlabel_num: int = 4
    net_pooling: int = 1
    # loss weights (config/mat-sed/base/finetune1.yaml 'training' section)
    w_weak: float = 0.5
    w_weak_cons: float = 1.0
    w_at: float = 0.2
    w_cons_max: float = 40.0
    w_cons_min: float = 0.0
    self_loss_warmup_steps: int = 1000
    cons_scheduler: str = "Sigmoid"  # or "Linear"
    ema_factor: float = 0.999
    # augmentation
    mixup_prob: float = 0.5
    mixup_alpha: float = 10.0
    mixup_beta: float = 0.5
    max_shift_frame: int = 90
    n_transform: int = 2  # 0: no aug; 1: same view for stu/tch; 2: distinct views
    transform_choice: Tuple[int, int, int, int] = (1, 0, 0, 0)
    filter_db_range: Tuple[float, float] = (-0.5, 0.5)
    filter_bands: Tuple[int, int] = (3, 6)
    filter_minimum_bandwidth: int = 6
    filter_type: str = "step"
    freq_mask_ratio: Optional[int] = None
    noise_snrs: Optional[Tuple[float, float]] = None
    # model forward kwargs
    stu_kwargs: Dict[str, Any] = field(default_factory=dict)
    tch_kwargs: Dict[str, Any] = field(default_factory=dict)

    @property
    def batch_size(self) -> int:
        return self.strong_num + self.weak_num + self.unlabel_num


@flax.struct.dataclass
class MeanTeacherState:
    params: Any
    teacher_params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar, number of completed optimizer steps
    # non-params collections (BatchNorm running stats for CNN-branch
    # models, e.g. PaSST_CNN 'batch' normalization). The teacher keeps
    # its OWN stats: the reference's update_ema touches parameters only,
    # so teacher buffers evolve from its train-mode forwards
    # (src/utils/scheduler.py:125-130 iterates net.parameters()).
    model_state: Any = None
    teacher_model_state: Any = None


def consistency_weight(step, cfg: MeanTeacherConfig):
    """w_cons ramp (reference ``get_self_weight``, ``finetune/train.py:96-115``)."""
    warm = jnp.clip(step / max(cfg.self_loss_warmup_steps, 1), 0.0, 1.0)
    if cfg.cons_scheduler == "Sigmoid":
        warm = jnp.where(warm < 1.0, jax.nn.sigmoid(10.0 * (warm - 0.5)), 1.0)
    elif cfg.cons_scheduler != "Linear":
        raise ValueError(f"unknown cons scheduler {cfg.cons_scheduler!r}")
    return jnp.maximum(cfg.w_cons_max * warm, cfg.w_cons_min)


def pool_strong_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """[N, C, T] strong grid -> [N, C] weak labels via linear-softmax pooling
    (reference ``pool_strong_labels``, ``finetune/train.py:26-29``)."""
    x = jnp.clip(labels, 1e-5, 1.0)
    return jnp.clip(jnp.sum(x * x, axis=-1) / jnp.sum(x, axis=-1), 1e-7, 1.0)


def create_mean_teacher_state(
    params, optimizer: optax.GradientTransformation, model_state=None
) -> MeanTeacherState:
    return MeanTeacherState(
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        model_state=model_state,
        teacher_model_state=jax.tree_util.tree_map(jnp.copy, model_state),
    )


def make_preprocess(frontend, cfg: MeanTeacherConfig):
    """The frontend + augmentation segment of the train step, exposed at
    module level so profiling studies (``exps/profile_train_segments.py``)
    can time it in isolation with the EXACT production code."""
    s, w = cfg.strong_num, cfg.weak_num

    def preprocess(batch, key):
        kmel, kshift, kmix, kmixp, ktrans = jax.random.split(key, 5)
        mel = frontend(batch["wav"], key=kmel, training=True)
        mel = frontend.normalize(mel)
        labels = batch["labels"]

        mel, labels = augment.frame_shift(
            kshift, mel, labels, net_pooling=cfg.net_pooling, max_shift_frame=cfg.max_shift_frame
        )

        # mixup within the strong and weak subsets, an INDEPENDENT
        # Beta(alpha, beta) coefficient per subset (the reference draws
        # np.random.beta inside the per-mask loop, train.py:78-80),
        # applied with prob mixup_prob
        kps, kpw = jax.random.split(kmix)
        do_mix = jax.random.uniform(kmixp) < cfg.mixup_prob

        def mix_span(m, lab, key, lo, hi):
            if hi - lo <= 0:  # empty subset: reference mixup on mel[mask] is a no-op
                return m, lab
            kc, kperm = jax.random.split(key)
            c = jax.random.beta(kc, cfg.mixup_alpha, cfg.mixup_beta)
            perm = lo + jax.random.permutation(kperm, hi - lo)
            full = jnp.arange(m.shape[0])
            perm_full = jnp.where((full >= lo) & (full < hi), perm[jnp.clip(full - lo, 0, hi - lo - 1)], full)
            mixed_m = c * m + (1 - c) * m[perm_full]
            mixed_l = jnp.clip(c * lab + (1 - c) * lab[perm_full], 0.0, 1.0)
            span = ((full >= lo) & (full < hi))[:, None, None]
            return (
                jnp.where(span & do_mix, mixed_m, m),
                jnp.where(span & do_mix, mixed_l, lab),
            )

        if cfg.mixup_prob > 0:
            mel, labels = mix_span(mel, labels, kps, 0, s)
            mel, labels = mix_span(mel, labels, kpw, s, s + w)

        if cfg.n_transform == 0:
            stu_mel = tch_mel = mel
        else:
            views = augment.feature_transformation(
                ktrans,
                mel,
                n_transform=cfg.n_transform,
                choice=cfg.transform_choice,
                filter_db_range=cfg.filter_db_range,
                filter_bands=cfg.filter_bands,
                filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
                filter_type=cfg.filter_type,
                freq_mask_ratio=cfg.freq_mask_ratio,
                noise_snrs=cfg.noise_snrs,
                norm_std=5.0,
            )
            if cfg.n_transform == 1:
                stu_mel = tch_mel = views
            else:
                stu_mel, tch_mel = views

        # weak labels: tag-sum for the weak rows. The reference also builds
        # pooled weak labels for the strong rows (train.py:86-88) but no
        # loss ever consumes them — that dead branch is not reproduced.
        weak_from_tags = jnp.sum(labels[s : s + w], axis=-1)
        return stu_mel, tch_mel, labels, weak_from_tags

    return preprocess


def make_loss_fn(model_apply: Callable, cfg: MeanTeacherConfig, model_state_aware: bool = False):
    """The student-forward + loss-assembly segment (differentiated by the
    step); module-level for the same profiling reason as
    :func:`make_preprocess`."""
    s, w = cfg.strong_num, cfg.weak_num

    def loss_fn(params, model_state, stu_mel, labels, weak_tags, tch, kstu, step):
        stu_rngs = {k: jax.random.fold_in(kstu, i) for i, k in enumerate(("patchout", "dropout", "mlm"))}

        if model_state_aware:
            stu, new_ms = model_apply(
                params, stu_mel, train=True, rngs=stu_rngs, model_state=model_state,
                **cfg.stu_kwargs,
            )
            new_ms = jax.lax.stop_gradient(new_ms)
        else:
            stu = model_apply(params, stu_mel, train=True, rngs=stu_rngs, **cfg.stu_kwargs)
            new_ms = model_state

        # supervised — statically empty spans contribute zero loss (a mean
        # over zero elements is NaN; span widths are static config, so the
        # guard resolves at trace time)
        zero = jnp.zeros(())
        loss_class_strong = L.bce(stu.strong[:s], labels[:s]) if s > 0 else zero
        loss_class_weak = L.bce(stu.weak[s : s + w], weak_tags) if w > 0 else zero
        loss_class_at = L.bce(stu.at_out[s : s + w], weak_tags) if w > 0 else zero
        # consistency (teacher targets already stop-gradiented)
        loss_cons_strong = L.mse(stu.strong, tch.strong)
        loss_cons_weak = L.mse(stu.weak, tch.at_out)
        loss_cons_at = L.mse(stu.at_out, tch.at_out)

        # reference get_self_weight reads scheduler.step_num BEFORE the
        # scheduler steps, i.e. completed steps + 1 (train.py:103,178 with
        # scheduler.py:49 step_num=1) — hence step + 1 here
        w_cons = consistency_weight(step + 1, cfg)
        self_loss = (
            loss_cons_strong + cfg.w_weak_cons * loss_cons_weak + cfg.w_at * loss_cons_at
        ) * w_cons
        total = (
            loss_class_strong
            + cfg.w_weak * loss_class_weak
            + self_loss
            + cfg.w_at * loss_class_at
        )
        metrics = {
            "loss_total": total,
            "loss_class_strong": loss_class_strong,
            "loss_class_weak": loss_class_weak,
            "loss_class_at_specific": loss_class_at,
            "loss_cons_strong": loss_cons_strong,
            "loss_cons_weak": loss_cons_weak,
            "loss_cons_at_specific": loss_cons_at,
            "w_cons": w_cons,
        }
        return total, (metrics, new_ms)

    return loss_fn


def make_mean_teacher_step(
    model_apply: Callable,
    frontend,
    optimizer: optax.GradientTransformation,
    cfg: MeanTeacherConfig,
    model_state_aware: bool = False,
):
    """Build the jittable train step.

    ``model_apply(params, mel, train, rngs, **kwargs) -> SEDOutput``.
    With ``model_state_aware=True`` the contract becomes
    ``model_apply(params, mel, train, rngs, model_state, **kwargs) ->
    (SEDOutput, new_model_state)`` and the state's model_state /
    teacher_model_state collections (BatchNorm stats) are threaded
    through the step. ``batch`` = dict(wav=[B, S], labels=[B, C, T_lab])
    in [strong | weak | unlabeled] order.
    """
    preprocess = make_preprocess(frontend, cfg)
    loss_fn = make_loss_fn(model_apply, cfg, model_state_aware)

    def train_step(state: MeanTeacherState, batch, key):
        # preprocess + the teacher forward run OUTSIDE value_and_grad: the
        # teacher is stop-gradiented anyway, and hoisting it (a) lets its
        # attention take the fast no-grad kernel paths (heads-in-lanes
        # flash/XL, no residual saving) and (b) drops the teacher's O/LSE
        # residuals from the autodiff memory footprint. The PRNG split
        # tree is unchanged, so numerics are bit-identical to the inline
        # formulation (pinned by the 4-step torch train-parity test).
        kpre, kstu, ktch = jax.random.split(key, 3)
        stu_mel, tch_mel, labels, weak_tags = preprocess(batch, kpre)
        tch_rngs = {k: jax.random.fold_in(ktch, i) for i, k in enumerate(("patchout", "dropout", "mlm"))}
        if model_state_aware:
            tch, new_tms = model_apply(
                state.teacher_params, tch_mel, train=True, rngs=tch_rngs,
                model_state=state.teacher_model_state, **cfg.tch_kwargs,
            )
        else:
            tch = model_apply(
                state.teacher_params, tch_mel, train=True, rngs=tch_rngs, **cfg.tch_kwargs
            )
            new_tms = state.teacher_model_state
        tch = jax.tree_util.tree_map(jax.lax.stop_gradient, tch)

        (_, (metrics, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, stu_mel, labels, weak_tags,
            tch, kstu, state.step,
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # reference EMA step counter: scheduler.step_num = completed steps + 1,
        # stepped before the EMA update -> first update sees step_num = 2
        new_teacher = ema_update(
            new_params, state.teacher_params, state.step + 2, cfg.ema_factor
        )
        from transformer4sed_tpu.train.optim import update_applied

        applied = update_applied(new_opt_state)
        if applied is None:  # plain optimizer: the reference-parity path
            new_step = state.step + 1
        else:
            # gradient accumulation: between applied updates the params are
            # unchanged, but an ungated EMA would still decay the teacher
            # toward them k times per optimizer step — gate EMA and the
            # step counter (which drives the EMA warmup and the
            # consistency-weight ramp) on the actual apply
            new_teacher = jax.tree_util.tree_map(
                lambda e, o: jnp.where(applied, e, o), new_teacher, state.teacher_params
            )
            new_step = state.step + applied.astype(jnp.int32)
        new_state = MeanTeacherState(
            params=new_params,
            teacher_params=new_teacher,
            opt_state=new_opt_state,
            step=new_step,
            model_state=new_ms,
            teacher_model_state=new_tms,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_multi_step(train_step: Callable, n_inner: int):
    """Wrap a (state, batch, key) step into a lax.scan over ``n_inner``
    stacked batches: one host round-trip per n_inner optimizer steps.

    Reduces dispatch/host-sync overhead (and, on RPC-attached devices
    such as the dev tunnel, avoids materialising the full train state
    per step). ``batches`` is the per-step batch pytree stacked on a
    leading [n_inner, ...] axis; returns the final state and the
    scan-stacked metrics.
    """

    def multi_step(state, batches, key):
        def body(carry, inputs):
            step_batch, step_key = inputs
            new_state, metrics = train_step(carry, step_batch, step_key)
            return new_state, metrics

        keys = jax.random.split(key, n_inner)
        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, metrics

    return multi_step


def stack_batches(batch_list):
    """Stack a list of batch dicts on a new leading axis for multi-step."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batch_list)
