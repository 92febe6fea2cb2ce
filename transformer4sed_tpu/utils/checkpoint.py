"""Checkpointing: full train state via orbax, plus selective warm-start.

Upgrades the reference's ``torch.save(state_dict)``-of-best-models-only
scheme (SURVEY.md §5.4): checkpoints here carry params + teacher EMA +
optimizer state + step + PRNG key, so training is actually resumable,
not just warm-startable. ``load_partial`` reproduces the reference's
``strict=False`` stage hand-off conventions (drop classifier / query /
mlm heads between stages).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Sequence

import flax
import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params) -> str:
    """Save a bare param tree (best-model flushes)."""
    path = os.path.abspath(path)
    _ckptr().save(path, jax.device_get(params), force=True)
    return path


def restore_params(path: str):
    return _ckptr().restore(os.path.abspath(path))


def save_checkpoint(path: str, state) -> str:
    """Save a full train state (flax.struct dataclass or pytree)."""
    path = os.path.abspath(path)
    _ckptr().save(path, jax.device_get(flax.serialization.to_state_dict(state)), force=True)
    return path


def restore_checkpoint(path: str, target):
    """Restore into ``target``'s structure (a template train state)."""
    restored = _ckptr().restore(os.path.abspath(path))
    return flax.serialization.from_state_dict(target, restored)


def load_partial(
    params: Dict,
    restored: Dict,
    drop_patterns: Sequence[str] = (),
) -> Dict:
    """Warm-start: copy leaves from ``restored`` into ``params`` except those
    whose path matches any regex in ``drop_patterns`` (strict=False analog).

    Reference conventions: finetune-from-MLM drops ``classifier.``/
    ``at_adpater.1`` (``recipes/desed/finetune/passt/main.py:60-64``),
    DASM drops query/head keys, PMAM drops ``mlm_mlp.``.
    """
    flat_params = flax.traverse_util.flatten_dict(params, sep="/")
    flat_restored = flax.traverse_util.flatten_dict(restored, sep="/")
    out = dict(flat_params)
    compiled = [re.compile(p) for p in drop_patterns]
    for k, v in flat_restored.items():
        if k not in flat_params:
            continue
        if any(c.search(k) for c in compiled):
            continue
        if np.shape(flat_params[k]) != np.shape(v):
            continue
        out[k] = v
    return flax.traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})
