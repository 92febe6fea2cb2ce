"""Tensor-parallel parameter partitioning over a ('data', 'model') mesh.

The reference has no TP (SURVEY.md §2.4 — ``nn.DataParallel`` only);
this module is the TPU-native extension point: regex rules map flax
param paths to :class:`PartitionSpec`, giving the standard Megatron
column-/row-parallel layout for every transformer block in the zoo:

  * qkv / fc1 kernels   -> P(None, 'model')   (column parallel: output
    features split, no collective on the forward matmul)
  * proj / fc2 kernels  -> P('model', None)   (row parallel: contraction
    split; XLA GSPMD inserts the psum over ICI after the matmul)
  * column-parallel biases shard with their features; everything else
    (norms, embeddings, heads) is replicated.

Nothing here is hand-scheduled: params are ``device_put`` with these
shardings and ``jit`` propagates them — XLA chooses and places the
collectives. Pallas flash kernels are opaque to GSPMD; under TP either
run ``use_flash=False`` (XLA attention) or use :func:`tp_flash_attention`
(shard_map over the head axis — attention is head-parallel, zero
collectives). The model-zoo sizes (<=90 M params) make TP optional;
the mesh exists for scale headroom (e.g. giant AudioSet label spaces).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax

# (path regex, spec) — first match wins; paths use '/' separators.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    # ViT / PaSST blocks
    (r".*/attn/qkv/kernel$", P(None, "model")),
    (r".*/attn/qkv/bias$", P("model")),
    (r".*/attn/proj/kernel$", P("model", None)),
    (r".*/mlp/fc1/kernel$", P(None, "model")),
    (r".*/mlp/fc1/bias$", P("model")),
    (r".*/mlp/fc2/kernel$", P("model", None)),
    # TransformerXL / Conformer attention
    (r".*/in_proj/kernel$", P(None, "model")),
    (r".*/in_proj/bias$", P("model")),
    (r".*/out_proj/kernel$", P("model", None)),
    # Conformer macaron FFNs
    (r".*/(feed_forward|feed_forward_macaron)_1/kernel$", P(None, "model")),
    (r".*/(feed_forward|feed_forward_macaron)_1/bias$", P("model")),
    (r".*/(feed_forward|feed_forward_macaron)_2/kernel$", P("model", None)),
)


def partition_specs(params, rules: Sequence[Tuple[str, P]] = TP_RULES):
    """Param pytree -> PartitionSpec pytree (unmatched leaves replicated)."""
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_of(path, leaf):
        for pat, spec in compiled:
            if pat.match(path):
                # guard: only shard when the named dims divide evenly is
                # checked at device_put; degenerate 1-d leaves fall back
                if len(spec) <= getattr(leaf, "ndim", 0):
                    return spec
        return P()

    specs = {k: spec_of(k, v) for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(specs, sep="/")


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if leaf.shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = TP_RULES):
    """device_put every param leaf with its TP sharding (replicated where
    a rule would not divide evenly). Returns the committed-sharded tree."""
    specs = partition_specs(params, rules)

    def put(leaf, spec):
        if not _divisible(leaf, spec, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, specs)


def make_2d_mesh(n_devices: Optional[int] = None, model_parallel: int = 2) -> Mesh:
    """('data', 'model') mesh: model axis innermost so TP collectives ride
    the fastest ICI links (scaling-book layout)."""
    from transformer4sed_tpu.parallel.mesh import require_devices

    all_devices = jax.devices()
    devices = (
        all_devices if n_devices is None else require_devices(n_devices, all_devices)
    )
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def tp_flash_attention(q, k, v, mesh: Mesh, sm_scale: Optional[float] = None,
                       axis: str = "model"):
    """Flash attention with the head axis sharded over ``axis``.

    Pallas kernels are opaque to GSPMD (it would all-gather the operands
    and replicate the kernel); ``shard_map`` instead runs the kernel on
    each shard's local heads — attention is embarrassingly parallel over
    heads, so no collective is needed at all. q/k/v: [B, H, T, d] with H
    divisible by the axis size.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from transformer4sed_tpu.kernels import flash_attention

    spec = P(None, axis, None, None)
    fn = shard_map(
        lambda q_, k_, v_: flash_attention(q_, k_, v_, sm_scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
