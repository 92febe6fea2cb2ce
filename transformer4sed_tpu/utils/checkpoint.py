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


_async_ckptr_singleton = None


def _async_ckptr():
    """Singleton orbax AsyncCheckpointer: the array snapshot to host
    memory happens synchronously inside ``save`` (so buffer donation in
    the next train step is safe), the disk write runs on a background
    thread — per-epoch last_state saves stop blocking the epoch loop.
    Falls back to None when the installed orbax lacks async support."""
    global _async_ckptr_singleton
    if _async_ckptr_singleton is None:
        import orbax.checkpoint as ocp

        try:
            _async_ckptr_singleton = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            import atexit

            def _drain():
                # at interpreter shutdown parts of the asyncio machinery
                # may already be gone; the stage loops drain explicitly,
                # this is best-effort belt-and-braces
                try:
                    _async_ckptr_singleton.wait_until_finished()
                except Exception:
                    pass

            atexit.register(_drain)
        except Exception:
            _async_ckptr_singleton = False
    return _async_ckptr_singleton or None


def wait_for_checkpoints():
    """Block until any in-flight async checkpoint write has landed."""
    if _async_ckptr_singleton:
        _async_ckptr_singleton.wait_until_finished()


def save_params(path: str, params) -> str:
    """Save a bare param tree (best-model flushes).

    Multi-host: ALL processes must call this — orbax ``save`` runs
    cross-host sync barriers internally (gating to process 0 would
    deadlock it at the first barrier) and coordinates the single
    writer itself; the path must be on a filesystem all hosts share
    (GCS on Cloud TPU pods)."""
    path = os.path.abspath(path)
    wait_for_checkpoints()  # the same path may have an in-flight write
    _ckptr().save(path, jax.device_get(params), force=True)
    return path


def restore_params(path: str):
    wait_for_checkpoints()
    return _ckptr().restore(os.path.abspath(path))


def save_checkpoint(path: str, state, async_save: bool = True, keep_backup: bool = True) -> str:
    """Save a full train state (flax.struct dataclass or pytree).

    ``async_save``: overlap the disk write with subsequent training
    (arrays are snapshotted to host before returning); pass False to
    block until the write lands. ``keep_backup``: rename an existing
    checkpoint at ``path`` to ``path + '.prev'`` first — orbax
    ``force=True`` deletes the destination before the (possibly
    background) write finalises, so without the backup a preemption in
    that window loses the only resume point.

    Multi-host: ALL processes must call this — orbax ``save`` runs
    cross-host sync barriers internally (a process-0 gate would
    deadlock the primary at the first barrier); only the backup
    rename below is primary-only, and it completes before orbax's
    own save-start barrier releases any writer."""
    path = os.path.abspath(path)
    state_dict = flax.serialization.to_state_dict(state)
    ck = _async_ckptr() if async_save else None
    if ck is not None:
        ck.wait_until_finished()  # one outstanding write; protects overwrites
    if keep_backup and jax.process_index() == 0 and os.path.isdir(path):
        import shutil

        prev = path + ".prev"
        if os.path.isdir(prev):
            shutil.rmtree(prev)
        os.replace(path, prev)
    if ck is not None:
        ck.save(path, jax.device_get(state_dict), force=True)
    else:
        _ckptr().save(path, jax.device_get(state_dict), force=True)
    return path


def restore_checkpoint(path: str, target):
    """Restore into ``target``'s structure (a template train state)."""
    wait_for_checkpoints()
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
