"""Tracing / profiling hooks.

The reference's only timing is wall-clock prints (SURVEY.md §5.1).
Here: a ``jax.profiler`` trace context that dumps a TensorBoard-viewable
trace (XLA ops, HBM, fusion view) and a per-step timer that forces a
device fence (the axon tunnel's ``block_until_ready`` is unreliable, so
the fence pulls one scalar).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/jax-trace'): step(...)`` -> TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_scalar(tree):
    """Cheap traced scalar that data-depends on EVERY leaf of ``tree``.

    Returning only a loss from a jitted train step lets XLA dead-code-
    eliminate the backward/optimizer/EMA (the loss does not depend on
    them) — the measurement trap documented in PARITY.md. Summing one
    element of each leaf forces the whole chain live at negligible cost
    (``exps/profile_train2.py`` methodology; used by ``bench.py`` and
    every ``exps/profile_*`` study).
    """
    return sum(jnp.sum(x[(0,) * x.ndim]) for x in jax.tree_util.tree_leaves(tree))


def timeit_ms(fn, *args, repeats: int = 3) -> float:
    """Best-of-``repeats`` wall time of ``float(fn(*args))`` in ms.

    The ``float()`` is the device fence (``block_until_ready`` is
    unreliable under the axon tunnel); the first call compiles + warms
    and is not timed; min over repeats rejects host-side noise.
    """
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def fence(tree) -> float:
    """Force execution of a pytree; returns a scalar checksum."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


class StepTimer:
    """Rolling per-step wall-clock statistics with device fencing."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            fence(outputs)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
