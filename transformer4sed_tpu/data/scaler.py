"""Feature scaler: dataset-level or instance-level normalisation.

Semantics of the reference ``TorchScaler``
(``src/preprocess/scaler.py:5-121``): 'dataset' statistics are the
mean of per-batch means over a fitting loader (buffered and saved with
checkpoints); 'instance' computes statistics per sample over ``dims``.
Normtypes: standard / mean / minmax (instance only).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class Scaler:
    def __init__(
        self,
        statistic: str = "dataset",
        normtype: str = "standard",
        dims: Tuple[int, ...] = (1, 2),
        eps: float = 1e-8,
    ):
        assert statistic in ("dataset", "instance", None)
        assert normtype in ("standard", "mean", "minmax", None)
        if statistic == "dataset" and normtype == "minmax":
            raise NotImplementedError("dataset+minmax not supported (parity with reference)")
        self.statistic = statistic
        self.normtype = normtype
        self.dims = tuple(dims)
        self.eps = eps
        self.mean: Optional[np.ndarray] = None
        self.mean_squared: Optional[np.ndarray] = None

    def fit(self, batches, transform_func: Callable = lambda b: b):
        """Accumulate batch-mean statistics over an iterable of batches."""
        mean = None
        mean_sq = None
        count = 0
        for batch in batches:
            feats = np.asarray(transform_func(batch))
            m = feats.mean(axis=self.dims, keepdims=True).mean(0, keepdims=True)
            m2 = (feats ** 2).mean(axis=self.dims, keepdims=True).mean(0, keepdims=True)
            mean = m if mean is None else mean + m
            mean_sq = m2 if mean_sq is None else mean_sq + m2
            count += 1
        self.mean = mean / count
        self.mean_squared = mean_sq / count
        return self

    def state_dict(self):
        return {"mean": self.mean, "mean_squared": self.mean_squared}

    def load_state_dict(self, state):
        if self.statistic == "dataset":
            self.mean = np.asarray(state["mean"])
            self.mean_squared = np.asarray(state["mean_squared"])
        return self

    def __call__(self, x):
        if self.statistic is None or self.normtype is None:
            return x
        if self.statistic == "dataset":
            assert self.mean is not None, "Scaler must be fit before use"
            mean = jnp.asarray(self.mean)
            if self.normtype == "mean":
                return x - mean
            if self.normtype == "standard":
                std = jnp.sqrt(jnp.asarray(self.mean_squared) - mean ** 2)
                return (x - mean) / (std + self.eps)
            raise NotImplementedError(self.normtype)
        # instance
        if self.normtype == "mean":
            return x - jnp.mean(x, axis=self.dims, keepdims=True)
        if self.normtype == "standard":
            # torch.std is Bessel-corrected (ddof=1) — live-oracle pinned
            return (x - jnp.mean(x, axis=self.dims, keepdims=True)) / (
                jnp.std(x, axis=self.dims, keepdims=True, ddof=1) + self.eps
            )
        lo = jnp.min(x, axis=self.dims, keepdims=True)
        hi = jnp.max(x, axis=self.dims, keepdims=True)
        return (x - lo) / (hi - lo + self.eps)
