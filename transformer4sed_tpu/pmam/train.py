"""PMAM prototype-BCE training step.

Reference hot loop (``recipes/desed/pmam/train.py:82-143``): the model
runs its MLM path; the reconstruction logit is compared to the GMM
prototypes by cosine similarity, squashed by
``sigmoid((leaky_relu(cos, 0.2) * 2 - 1) / temperature)``, and trained
with BCE against the frame-wise pseudo-labels at *masked positions
only*, plus an optional weak AT-branch BCE. Only LoRA params (plus the
decoder/head) train — wire that via the optimizer label trees.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from transformer4sed_tpu.train.optim import step_increment

from transformer4sed_tpu.core import losses as L
from transformer4sed_tpu.frontend import augment


def prototype_predictions(
    logit: jnp.ndarray, gmm_means: jnp.ndarray, temperature: float = 0.1
) -> jnp.ndarray:
    """[B, T, C] reconstruction x [K, C] prototypes -> [B, T, K] probabilities.

    Reference ``recipes/desed/pmam/train.py:82-87``: only the LOGIT side
    is L2-normalised (``F.normalize(logit) @ gmm_means.T``) — the GMM
    means keep their magnitudes, so this is a scaled projection rather
    than a true cosine; reproducing that exactly matters because the
    sigmoid saturation depends on the means' norms. torch F.normalize
    clamps the norm at eps=1e-12.
    """
    logit_n = logit / jnp.maximum(jnp.linalg.norm(logit, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("btc,kc->btk", logit_n, gmm_means, preferred_element_type=jnp.float32)
    act = jax.nn.leaky_relu(sim, negative_slope=0.2) * 2.0 - 1.0
    return jax.nn.sigmoid(act / temperature)


def masked_bce(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """BCE over masked frames only; pred/target [B, T, K], mask [B, T].
    Uses the shared NaN-safe log (torch value clamp + finite gradients
    at saturated predictions, ``core/losses._safe_log``)."""
    losses = -(target * L._safe_log(pred) + (1.0 - target) * L._safe_log(1.0 - pred))
    per_frame = jnp.mean(losses, axis=-1)  # [B, T]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_frame * mask) / denom


@dataclass(frozen=True)
class PMAMConfig:
    temperature: float = 0.1
    w_at: float = 0.0
    max_shift_frame: int = 90
    transform_choice: Tuple[int, int, int, int] = (1, 0, 0, 0)
    filter_db_range: Tuple[float, float] = (-0.5, 0.5)
    filter_bands: Tuple[int, int] = (3, 6)
    filter_minimum_bandwidth: int = 6
    filter_type: str = "step"
    net_pooling: int = 1
    model_kwargs: Dict[str, Any] = field(default_factory=dict)


def make_pmam_step(
    model_apply: Callable,
    frontend,
    optimizer,
    gmm_means,
    cfg: PMAMConfig = PMAMConfig(),
    model_state_aware: bool = False,
):
    """Build the jitted PMAM step.

    ``batch`` = dict(wav=[B, S], labels=[B, K, T_lab]) where labels are
    the frame-wise GMM pseudo-labels. With ``model_state_aware=True``
    the model_apply contract becomes
    ``(params, mel, train, rngs, model_state, **kw) -> (out, new_ms)``
    and BatchNorm collections (PaSST_CNN 'batch'-norm CNN) ride in
    ``state.model_state``.
    """
    gmm_means = jnp.asarray(gmm_means)

    def loss_fn(params, model_state, batch, key):
        kmel, kshift, ktrans, kfwd = jax.random.split(key, 4)
        mel = frontend(batch["wav"], key=kmel, training=True)
        mel = frontend.normalize(mel)
        labels = batch["labels"]  # [B, K, T]
        mel, labels = augment.frame_shift(
            kshift, mel, labels, net_pooling=cfg.net_pooling, max_shift_frame=cfg.max_shift_frame
        )
        mel = augment.feature_transformation(
            ktrans,
            mel,
            n_transform=1,
            choice=cfg.transform_choice,
            filter_db_range=cfg.filter_db_range,
            filter_bands=cfg.filter_bands,
            filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
            filter_type=cfg.filter_type,
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

        pred = prototype_predictions(out.mlm_pred, gmm_means, cfg.temperature)  # [B, T, K]
        targets = labels.transpose(0, 2, 1)  # [B, T, K]
        mask = out.mask_id_seq.astype(jnp.float32)
        loss_strong = masked_bce(pred, targets, mask)

        loss_weak = jnp.asarray(0.0)
        if cfg.w_at > 0 and out.at_out is not None:
            label_weak = (jnp.sum(labels, axis=-1) >= 1).astype(jnp.float32)
            loss_weak = L.bce(out.at_out, label_weak)
        total = loss_strong + cfg.w_at * loss_weak
        return total, (
            {"loss_total": total, "loss_strong": loss_strong, "loss_weak": loss_weak},
            new_ms,
        )

    def step(state, batch, key):
        (_, (metrics, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, batch, key
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        import optax as _optax

        new_params = _optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params, opt_state=new_opt, step=state.step + step_increment(new_opt), model_state=new_ms
            ),
            metrics,
        )

    return step
