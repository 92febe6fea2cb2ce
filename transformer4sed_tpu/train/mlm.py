"""Masked-reconstruction (MLM) pretraining step (MAT-SED stage 1).

Loss = MSE between the pre-mask decoder input and the reconstruction at
masked positions only (``recipes/desed/mlm/mlm_passt/train.py:36-38``),
implemented as a mask-weighted mean so shapes stay static. Augmentation
mirrors the reference MLM trainer: frame shift + one
feature_transformation view (``mlm_passt/train.py:24-33``).

INTENTIONAL DEVIATION — we actually mask. The reference's
``MlmModule.setence_mask`` writes the mask token via
``token_seq_new.reshape(-1, C)[mask] = mask_token``
(``src/models/transformer/mask.py:69-71``); the decoder input is
non-contiguous in every real PaSST_SED forward (``InterpolateModule``
interpolates in [B,C,T] and transposes back, ``passt_sed.py:31-34``),
``.clone()`` preserves that layout, so ``reshape`` returns a copy and
the in-place write is silently discarded — upstream MLM pretraining
reconstructs UNCORRUPTED input. We implement the intended BERT-style
corruption. Pinned live in ``tests/test_reference_live_trainers.py::
TestMLMTrainerLive`` (trajectory parity on the reference's intended
contiguous path + a no-op-bug pin).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transformer4sed_tpu.train.optim import step_increment

from transformer4sed_tpu.frontend import augment


def mlm_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over masked frames only. pred/target [B,T,C], mask [B,T]."""
    sq = jnp.sum((pred - target) ** 2, axis=-1)  # [B, T]
    denom = jnp.maximum(jnp.sum(mask), 1.0) * pred.shape[-1]
    return jnp.sum(sq * mask) / denom


@dataclass(frozen=True)
class MLMConfig:
    max_shift_frame: int = 90
    transform_choice: Tuple[int, int, int, int] = (1, 0, 0, 0)
    filter_db_range: Tuple[float, float] = (-0.5, 0.5)
    filter_bands: Tuple[int, int] = (3, 6)
    filter_minimum_bandwidth: int = 6
    filter_type: str = "step"
    freq_mask_ratio: Optional[int] = None
    noise_snrs: Optional[Tuple[float, float]] = None
    model_kwargs: Dict[str, Any] = field(default_factory=dict)


@flax.struct.dataclass
class MLMState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # non-param variable collections (e.g. {'batch_stats': ...} for
    # BatchNorm backbones like HTSAT); None for pure-LN models
    model_state: Any = None


def create_mlm_state(params, optimizer: optax.GradientTransformation) -> MLMState:
    return MLMState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def make_mlm_step(
    model_apply: Callable,
    frontend,
    optimizer,
    cfg: MLMConfig = MLMConfig(),
    model_state_aware: bool = False,
):
    """model_apply(params, mel, train, rngs, **kw) -> SEDOutput with mlm fields.

    With ``model_state_aware=True`` the contract becomes
    ``model_apply(params, mel, train, rngs, model_state, **kw) ->
    (SEDOutput, new_model_state)`` and BatchNorm collections are
    threaded through the step (PaSST_CNN 'batch'-norm CNN branch in the
    PMAM post-pretrain stage)."""

    def loss_fn(params, model_state, batch, key):
        kmel, kshift, ktrans, kfwd = jax.random.split(key, 4)
        mel = frontend(batch["wav"], key=kmel, training=True)
        mel = frontend.normalize(mel)
        mel = augment.frame_shift(kshift, mel, max_shift_frame=cfg.max_shift_frame)
        mel = augment.feature_transformation(
            ktrans,
            mel,
            n_transform=1,
            choice=cfg.transform_choice,
            filter_db_range=cfg.filter_db_range,
            filter_bands=cfg.filter_bands,
            filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
            filter_type=cfg.filter_type,
            freq_mask_ratio=cfg.freq_mask_ratio,
            noise_snrs=cfg.noise_snrs,
            norm_std=5.0,
        )
        rngs = {k: jax.random.fold_in(kfwd, i) for i, k in enumerate(("patchout", "dropout", "mlm"))}
        if model_state_aware:
            out, new_ms = model_apply(
                params, mel, train=True, rngs=rngs, model_state=model_state, **cfg.model_kwargs
            )
            new_ms = jax.lax.stop_gradient(new_ms)
        else:
            out = model_apply(params, mel, train=True, rngs=rngs, **cfg.model_kwargs)
            new_ms = model_state
        # NO stop_gradient on the target: the reference backpropagates
        # through frame_before_mask too (mlm_passt/train.py:38 computes
        # MSELoss(frame_before_mask[mask], pred[mask]) with no detach),
        # which trains the f_pool/projector modules from both branches
        loss = mlm_loss(out.mlm_pred, out.frame_before_mask, out.mask_id_seq.astype(jnp.float32))
        return loss, ({"loss_mlm": loss}, new_ms)

    def train_step(state: MLMState, batch, key):
        (_, (metrics, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, batch, key
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            MLMState(
                params=new_params, opt_state=new_opt, step=state.step + step_increment(new_opt), model_state=new_ms
            ),
            metrics,
        )

    return train_step
