"""Optimizer construction: per-module param groups on top of optax.

Reproduces the reference recipes' optimisation policy
(``recipes/desed/finetune/passt/setting.py:28-103`` +
``recipes/desed/setting.py:254-278``) as a label tree + multi-transform:

  * 'encoder' (backbone) with optional *step-LR*: the top-N blocks and
    the final backbone norm train at 2x the encoder LR;
  * 'decoder' (decoder / f-pool / projector modules);
  * 'head' (everything else);
  * lr <= 0 or freeze_layer -> the group label 'frozen'
    (``optax.set_to_zero``), mirroring requires_grad=False.

Each live group is AdamW(betas=(0.9, 0.999), eps=1e-8) at its own base
LR scaled by one shared schedule (the reference steps one scheduler
over all groups). Global-norm clipping runs before the transforms
(note: the reference calls clip_grad_norm *before* backward, i.e. on
zeroed grads — a no-op; here clipping is real and on by default).

Also provides ChildTuning-style Bernoulli gradient masking
(``src/optimizer.py:9-107``, mode-D) as a composable transform.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class GroupSpec:
    lr: float = 1e-4
    weight_decay: float = 1e-8
    step_lr: int = 0  # encoder only: top-N blocks at 2x lr
    freeze_layer: int = 0  # encoder only: freeze blocks [0, k)


@dataclass(frozen=True)
class ParamGroupConfig:
    encoder: GroupSpec = field(default_factory=GroupSpec)
    decoder: GroupSpec = field(default_factory=GroupSpec)
    head: GroupSpec = field(default_factory=GroupSpec)
    # optional extra groups used by the AudioSet recipes' policies
    # (set_lr.py / lr_set.py): a separate LR for the CNN branch, the
    # DASM AT decoder and the DASM learnable query bank; None folds them
    # into decoder/head as before
    cnn: Optional[GroupSpec] = None
    at_decoder: Optional[GroupSpec] = None
    query: Optional[GroupSpec] = None
    backbone_depth: int = 12
    clip_grad: float = 20.0
    # PMAM/LoRA mode (pmam/main.py:107 mark_only_lora_as_trainable): LoRA
    # adapters inside an otherwise-frozen backbone train at the decoder LR
    lora_trainable: bool = False


# union of the reference's decoder-group keyword lists: DESED cnn_trans
# (`cnn_trans/setting.py:21` — decoder, cnn_projector,
# transformer_projector, merge_weight, f_pool_module) and the AudioSet
# DASM policy (`lr_set.py:41-51` adds at_projector, norm_before_pool,
# norm_after_merge)
_DECODER_KEYWORDS = (
    "decoder", "f_pool_module", "transformer_projector", "cnn_projector",
    "at_projector", "merge_weight", "norm_before_pool", "norm_after_merge",
)


def _path_str(path) -> str:
    return "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)


def _backbone_block_key(name: str):
    """(layer, block) sort key for a backbone param path, or None.

    Flat ViT backbones name blocks ``blocks_{i}``; the hierarchical
    HTSAT Swin names them as ONE flat module ``layers_{i}_blocks_{j}``
    (htsat.py:328) — and a nested ``layers_{i}/blocks_{j}`` tree must
    work too — the within-layer ``j`` alone would mislabel
    freeze_layer/step_lr policies."""
    m = re.search(r"(?:layers_(\d+)[/_])?blocks_(\d+)", name)
    if m is None:
        return None
    return (int(m.group(1)) if m.group(1) is not None else -1, int(m.group(2)))


def label_params(params, cfg: ParamGroupConfig):
    """Assign each leaf a group label following the reference policy."""
    # global depth-order index over the backbone's blocks (flat or
    # hierarchical), so freeze_layer / step_lr count whole-network depth
    flat_names = [
        _path_str(k)
        for k in flax.traverse_util.flatten_dict(params, sep=None)
    ]
    block_keys = sorted(
        {
            k
            for n in flat_names
            if n.startswith("backbone/") or "/backbone/" in n
            for k in [_backbone_block_key(n)]
            if k is not None
        }
    )
    global_block_idx = {k: i for i, k in enumerate(block_keys)}

    def label_of(path, _):
        name = _path_str(path)
        if cfg.lora_trainable and ("lora_A" in name or "lora_B" in name):
            return "decoder"
        if name.startswith("backbone/") or "/backbone/" in name:
            bk = _backbone_block_key(name)
            block_idx = global_block_idx[bk] if bk is not None else None
            is_final_norm = re.search(r"backbone/norm/", name + "/") is not None
            # freeze policy: blocks below freeze_layer frozen; final norm always live.
            # (lr <= 0 freezes the whole backbone: the reference leaves the final
            # norm 'trainable' but at lr 0, which updates nothing.)
            if cfg.encoder.lr <= 0:
                return "frozen"
            if cfg.encoder.freeze_layer > 0:
                trainable = (
                    (block_idx is not None and block_idx + 1 > cfg.encoder.freeze_layer)
                    or is_final_norm
                )
                if not trainable:
                    return "frozen"
            if cfg.encoder.step_lr:
                depth = len(global_block_idx) or cfg.backbone_depth
                high = (
                    block_idx is not None
                    and depth - block_idx <= cfg.encoder.step_lr
                ) or is_final_norm
                return "encoder_high" if high else "encoder_low"
            return "encoder_low"
        # at_decoder before the generic 'decoder' keyword (substring clash)
        if cfg.at_decoder is not None and "at_decoder" in name:
            return "frozen" if cfg.at_decoder.lr <= 0 else "at_decoder"
        if cfg.query is not None and "at_query" in name:
            return "frozen" if cfg.query.lr <= 0 else "query"
        if cfg.cnn is not None and (name.startswith("cnn/") or "/cnn/" in name):
            return "frozen" if cfg.cnn.lr <= 0 else "cnn"
        for kw in _DECODER_KEYWORDS:
            if kw in name:
                return "frozen" if cfg.decoder.lr <= 0 else "decoder"
        return "frozen" if cfg.head.lr <= 0 else "head"

    flat = flax.traverse_util.flatten_dict(params, sep=None)
    labels = {k: label_of(k, v) for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(labels)


def _adamw(lr: float, weight_decay: float, schedule: Optional[Callable]) -> optax.GradientTransformation:
    chain = [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
    ]
    if schedule is not None:
        chain.append(optax.scale_by_schedule(lambda step: -lr * schedule(step)))
    else:
        chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def build_optimizer(
    params,
    cfg: ParamGroupConfig,
    schedule: Optional[Callable] = None,
) -> Tuple[optax.GradientTransformation, Any]:
    """Return (optimizer, label_tree). ``schedule`` maps step -> LR scale."""
    labels = label_params(params, cfg)
    transforms = {
        "encoder_low": _adamw(cfg.encoder.lr, cfg.encoder.weight_decay, schedule),
        "encoder_high": _adamw(cfg.encoder.lr * 2, cfg.encoder.weight_decay, schedule),
        "decoder": _adamw(cfg.decoder.lr, cfg.decoder.weight_decay, schedule),
        "head": _adamw(cfg.head.lr, cfg.head.weight_decay, schedule),
        "frozen": optax.set_to_zero(),
    }
    if cfg.cnn is not None:
        transforms["cnn"] = _adamw(cfg.cnn.lr, cfg.cnn.weight_decay, schedule)
    if cfg.at_decoder is not None:
        transforms["at_decoder"] = _adamw(cfg.at_decoder.lr, cfg.at_decoder.weight_decay, schedule)
    if cfg.query is not None:
        transforms["query"] = _adamw(cfg.query.lr, cfg.query.weight_decay, schedule)
    tx = optax.multi_transform(transforms, labels)
    if cfg.clip_grad:
        # zero frozen-group gradients BEFORE measuring the global norm:
        # otherwise a frozen backbone's (discarded) gradients inflate the
        # norm and over-clip the live groups' updates. The reference's
        # clip_grad_norm sees grad=None for frozen params, so its norm is
        # live-params-only (and is a no-op anyway — PARITY.md deviations).
        zero_frozen = optax.multi_transform(
            {k: optax.set_to_zero() if k == "frozen" else optax.identity()
             for k in transforms},
            labels,
        )
        tx = optax.chain(zero_frozen, optax.clip_by_global_norm(cfg.clip_grad), tx)
    return tx, labels


def child_tuning_adamw(
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    correct_bias: bool = True,
    reserve_p: float = 1.0,
    mode: Optional[str] = None,
    gradient_mask=None,
    seed: int = 0,
) -> optax.GradientTransformation:
    """Exact functional port of the reference ``ChildTuningAdamW``
    (``src/optimizer.py:9-107``), live-oracle-tested in
    ``tests/test_reference_live.py``.

    Differences from ``optax.adamw`` that make this its own transform:

    * eps is added to ``sqrt(v)`` BEFORE bias correction
      (``denom = sqrt(v) + eps``; optax adds it to ``sqrt(v_hat)``);
    * decoupled weight decay is applied to the ALREADY-UPDATED param
      (``p -= lr*wd*p`` after the addcdiv), so the decay also shrinks
      this step's Adam update;
    * ``mode='ChildTuning-F'`` Bernoulli-masks gradients with keep-prob
      ``reserve_p`` (scaled 1/reserve_p) before the moment updates;
      ``mode='ChildTuning-D'`` applies a fixed ``gradient_mask`` tree
      (leaves broadcastable to the grads; None leaves = unmasked,
      mirroring ``p in self.gradient_mask``).

    Requires params (pass-through of ``optax.apply_updates`` semantics:
    the returned updates are deltas).
    """
    if mode == "ChildTuning-D" and gradient_mask is None:
        raise ValueError("ChildTuning-D requires a gradient_mask tree")

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {
            "count": jnp.zeros([], jnp.int32),
            "mu": zeros,
            "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
            "key": jax.random.PRNGKey(seed),
        }

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("child_tuning_adamw requires params")
        count = state["count"] + 1
        key = state["key"]
        if mode == "ChildTuning-F":
            new_key, sub = jax.random.split(key)
            leaves, treedef = jax.tree_util.tree_flatten(updates)
            subkeys = jax.random.split(sub, len(leaves))
            leaves = [
                g * jax.random.bernoulli(k, reserve_p, g.shape).astype(g.dtype) / reserve_p
                for g, k in zip(leaves, subkeys)
            ]
            updates = jax.tree_util.tree_unflatten(treedef, leaves)
            key = new_key
        elif mode == "ChildTuning-D":
            updates = jax.tree_util.tree_map(
                lambda g, m: g if m is None else g * m,
                updates, gradient_mask,
                is_leaf=lambda x: x is None,
            )

        mu = jax.tree_util.tree_map(
            lambda m, g: m * b1 + g * (1.0 - b1), state["mu"], updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: v * b2 + (g * g) * (1.0 - b2), state["nu"], updates)
        if correct_bias:
            c = count.astype(jnp.float32)
            step_size = lr * jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        else:
            step_size = jnp.asarray(lr, jnp.float32)

        def delta(p, m, v):
            adam = -step_size * m / (jnp.sqrt(v) + eps)
            # wd acts on the post-addcdiv param: p_new = (p + adam)*(1 - lr*wd)
            return adam - lr * weight_decay * (p + adam)

        new_updates = jax.tree_util.tree_map(delta, params, mu, nu)
        return new_updates, {"count": count, "mu": mu, "nu": nu, "key": key}

    return optax.GradientTransformation(init_fn, update_fn)


def child_tuning(p: float = 0.3, seed: int = 0) -> optax.GradientTransformation:
    """ChildTuning-D: keep each gradient coordinate with prob ``p`` (scaled 1/p).

    Functional equivalent of the reference's ``ChildTuningAdamW`` task-free
    mode (``src/optimizer.py:34-55``): a fresh Bernoulli mask per step,
    gradients rescaled by 1/p. Compose before the optimizer:
    ``optax.chain(child_tuning(0.3), adamw)``.
    """

    def init_fn(params):
        return {"key": jax.random.PRNGKey(seed)}

    def update_fn(updates, state, params=None):
        key = state["key"]
        new_key, sub = jax.random.split(key)
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        subkeys = jax.random.split(sub, len(leaves))
        masked = [
            g * jax.random.bernoulli(k, p, g.shape).astype(g.dtype) / p
            for g, k in zip(leaves, subkeys)
        ]
        return jax.tree_util.tree_unflatten(treedef, masked), {"key": new_key}

    return optax.GradientTransformation(init_fn, update_fn)


def update_applied(opt_state):
    """Whether this ``optimizer.update`` call APPLIED an optimizer step.

    Gradient accumulation (``training.accum_steps > 1``) wraps the whole
    transform chain in ``optax.MultiSteps``: intermediate micro-steps
    return zero updates and only every k-th call applies the averaged
    gradient. Train steps use this to keep per-OPTIMIZER-step semantics
    (mean-teacher EMA cadence, consistency-ramp step counters) intact
    under accumulation. Returns ``None`` for plain optimizers — a static
    signal that the unconditional (reference-parity) code path should
    compile, identical to pre-accumulation builds.

    Call with the NEW opt state: optax resets ``mini_step`` to 0 on the
    micro-step that applied the update.
    """
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state.mini_step == 0
    return None


def step_increment(opt_state):
    """``state.step`` increment: 1, or 0/1 under gradient accumulation so
    the counter keeps counting applied optimizer steps."""
    applied = update_applied(opt_state)
    if applied is None:
        return 1
    return applied.astype(jnp.int32)
