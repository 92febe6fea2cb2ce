"""LoRA: low-rank adaptation as a flax Dense drop-in + pure param
transforms.

Replaces the reference's vendored microsoft/LoRA layers
(``src/models/lora/layers.py:13-330``). Differences by design:

  * No train/eval weight merge-unmerge state machine (the reference
    mutates ``weight.data`` on ``train()``/``eval()`` transitions) —
    a pure function computes ``W + (alpha/r) * A @ B`` either on the
    fly (training) or once via :func:`merge_lora` (export/eval),
    matching the reference's merged checkpoints
    (``src/models/lora/layers.py:124-141``).
  * ``mark_only_lora_as_trainable`` becomes an optimizer *label*
    function (compose with ``optax.multi_transform``), and
    ``lora_state_dict`` becomes :func:`lora_params` (tree filter).
"""

from __future__ import annotations

from typing import Any, Dict

import flax
import flax.linen as nn
import jax.numpy as jnp


class LoRADense(nn.Module):
    """Dense with additive low-rank path: y = x W + (alpha/r) x A B."""

    features: int
    rank: int = 4
    alpha: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (d_in, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            # reference init: A ~ kaiming-ish, B = 0 -> identity at start
            lora_a = self.param(
                "lora_A", nn.initializers.normal(stddev=0.02), (d_in, self.rank)
            )
            lora_b = self.param("lora_B", nn.initializers.zeros, (self.rank, self.features))
            scale = self.alpha / self.rank
            y = y + scale * jnp.dot(
                jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)),
                lora_b.astype(self.dtype),
            )
        return y


def merge_lora(params: Dict, alpha_over_rank: Dict[str, float] | float | None = None) -> Dict:
    """Fold every (kernel, lora_A, lora_B) triple into a dense kernel.

    Returns a new tree where ``kernel += scale * A @ B`` and the lora
    leaves are removed — the exported checkpoint is dense, like the
    reference's merged saves. ``alpha_over_rank``: scale per path
    prefix, or one float, or None to infer scale 1.0/r is NOT possible
    from shapes alone — pass the same alpha/r used at train time
    (default 1/rank with alpha inferred as 1 is usually wrong; be
    explicit).
    """
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = dict(flat)
    for key in list(flat):
        if key.endswith("lora_A"):
            prefix = key[: -len("lora_A")]
            a = flat[key]
            b = flat.get(prefix + "lora_B")
            kernel_key = prefix + "kernel"
            if b is None or kernel_key not in flat:
                continue
            rank = a.shape[-1]
            if isinstance(alpha_over_rank, dict):
                scale = alpha_over_rank.get(prefix.rstrip("/"), 1.0 / rank)
            elif alpha_over_rank is None:
                scale = 1.0 / rank
            else:
                scale = float(alpha_over_rank)
            out[kernel_key] = flat[kernel_key] + scale * (a @ b)
            del out[key]
            del out[prefix + "lora_B"]
    return flax.traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})


def lora_label_fn(params: Dict, trainable_extra: tuple = ()) -> Dict:
    """Label tree: 'lora' for lora_A/lora_B (and paths containing any of
    ``trainable_extra``), 'frozen' otherwise — the functional
    ``mark_only_lora_as_trainable``."""

    def label(path_key: str):
        if path_key.endswith("lora_A") or path_key.endswith("lora_B"):
            return "lora"
        if any(extra in path_key for extra in trainable_extra):
            return "lora"
        return "frozen"

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    labels = {tuple(k.split("/")): label(k) for k in flat}
    return flax.traverse_util.unflatten_dict(labels)


def lora_params(params: Dict) -> Dict:
    """Filter the tree down to lora leaves only (lora_state_dict analog)."""
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    kept = {
        tuple(k.split("/")): v
        for k, v in flat.items()
        if k.endswith("lora_A") or k.endswith("lora_B")
    }
    return flax.traverse_util.unflatten_dict(kept)
