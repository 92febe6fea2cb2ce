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
import jax
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


class LoRAMergedDense(nn.Module):
    """Fused multi-head Dense (e.g. qkv) with LoRA on a *subset* of the
    output groups — the reference's ``MergedLinear``
    (``src/models/lora/layers.py:146-233``). ``enable_lora`` has one
    bool per equal slice of ``features``; disabled slices get no
    low-rank delta. Parameters are stored per enabled group
    (``lora_A_g{i}``/``lora_B_g{i}``) so :func:`merge_lora` can fold
    each into its kernel slice."""

    features: int
    enable_lora: tuple = (True, True, True)
    rank: int = 4
    alpha: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_groups = len(self.enable_lora)
        assert self.features % n_groups == 0, "features must split evenly over enable_lora"
        gs = self.features // n_groups
        d_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (d_in, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            scale = self.alpha / self.rank
            deltas = []
            for i, on in enumerate(self.enable_lora):
                if not on:
                    deltas.append(jnp.zeros(x.shape[:-1] + (gs,), self.dtype))
                    continue
                a = self.param(f"lora_A_g{i}", nn.initializers.normal(stddev=0.02), (d_in, self.rank))
                b = self.param(f"lora_B_g{i}", nn.initializers.zeros, (self.rank, gs))
                deltas.append(scale * jnp.dot(
                    jnp.dot(x.astype(self.dtype), a.astype(self.dtype)), b.astype(self.dtype)
                ))
            y = y + jnp.concatenate(deltas, axis=-1)
        return y


class LoRAEmbedding(nn.Module):
    """Embedding with additive low-rank delta (reference
    ``lora.Embedding``, ``src/models/lora/layers.py:61-105``; its init
    zeroes A and draws B normal — preserved)."""

    num_embeddings: int
    features: int
    rank: int = 4
    alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(stddev=0.02),
            (self.num_embeddings, self.features),
        )
        y = jnp.take(table, ids, axis=0).astype(self.dtype)
        if self.rank > 0:
            a = self.param("lora_A", nn.initializers.zeros, (self.num_embeddings, self.rank))
            b = self.param("lora_B", nn.initializers.normal(stddev=0.02), (self.rank, self.features))
            scale = self.alpha / self.rank
            y = y + scale * jnp.dot(jnp.take(a, ids, axis=0).astype(self.dtype), b.astype(self.dtype))
        return y


class LoRAConv(nn.Module):
    """2-D conv whose HWIO kernel carries a rank-``rank`` additive
    delta ``(A @ B).reshape(kh, kw, cin, cout)`` (reference
    ``ConvLoRA``, ``src/models/lora/layers.py:236-330``). Deviation
    (documented): the reference factorizes the (out, in*k*k)
    matricization at rank r*k; we factorize the flattened-HWIO
    matricization at rank ``rank`` — pass ``rank = r * kernel_size``
    for equivalent capacity."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str = "SAME"
    rank: int = 4
    alpha: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        kernel = kernel.astype(self.dtype)
        if self.rank > 0:
            a = self.param("lora_A", nn.initializers.normal(stddev=0.02), (kh * kw * cin, self.rank))
            b = self.param("lora_B", nn.initializers.zeros, (self.rank, self.features))
            scale = self.alpha / self.rank
            kernel = kernel + scale * jnp.dot(
                a.astype(self.dtype), b.astype(self.dtype)
            ).reshape(kh, kw, cin, self.features)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, window_strides=self.strides,
            padding=self.padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
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

    def get_scale(prefix: str, rank: int) -> float:
        if isinstance(alpha_over_rank, dict):
            return alpha_over_rank.get(prefix.rstrip("/"), 1.0 / rank)
        if alpha_over_rank is None:
            return 1.0 / rank
        return float(alpha_over_rank)

    for key in list(flat):
        leaf = key.rsplit("/", 1)[-1]
        if leaf == "lora_A":
            prefix = key[: -len("lora_A")]
            a = flat[key]
            b = flat.get(prefix + "lora_B")
            if b is None:
                continue
            # dense/conv keep the base weight as 'kernel'; embedding as 'embedding'
            base_key = next(
                (prefix + n for n in ("kernel", "embedding") if prefix + n in flat), None
            )
            if base_key is None:
                continue
            base = flat[base_key]
            scale = get_scale(prefix, a.shape[-1])
            delta = scale * (a @ b)
            out[base_key] = base + (delta.reshape(base.shape) if base.ndim == 4 else delta)
            del out[key]
            del out[prefix + "lora_B"]
        elif leaf.startswith("lora_A_g"):
            # LoRAMergedDense: fold each group delta into its kernel slice
            prefix, gi = key[: -len(leaf)], leaf[len("lora_A_g"):]
            a = flat[key]
            b = flat.get(f"{prefix}lora_B_g{gi}")
            kernel_key = prefix + "kernel"
            if b is None or kernel_key not in flat:
                continue
            gs = b.shape[-1]
            lo = int(gi) * gs
            scale = get_scale(prefix, a.shape[-1])
            kernel = jnp.asarray(out[kernel_key])
            out[kernel_key] = kernel.at[:, lo : lo + gs].add(scale * (a @ b))
            del out[key]
            del out[f"{prefix}lora_B_g{gi}"]
    return flax.traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})


def lora_label_fn(params: Dict, trainable_extra: tuple = ()) -> Dict:
    """Label tree: 'lora' for lora_A/lora_B (and paths containing any of
    ``trainable_extra``), 'frozen' otherwise — the functional
    ``mark_only_lora_as_trainable``."""

    def label(path_key: str):
        if path_key.rsplit("/", 1)[-1].startswith(("lora_A", "lora_B")):
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
        if k.rsplit("/", 1)[-1].startswith(("lora_A", "lora_B"))
    }
    return flax.traverse_util.unflatten_dict(kept)
