"""Model and prediction statistics.

``count_parameters`` counts leaves of a flax param tree (optionally only
those labelled trainable) — the analog of
``src/utils/statistics/model_statistic.py:3``. ``ProbMeanValue``
accumulates per-class positive/negative probability histograms and mean
probabilities over strong/weak predictions for threshold analysis
(``src/utils/statistics/mean_statistic.py:7-104``).
"""

from __future__ import annotations

import pickle
from collections import namedtuple
from typing import Dict, Optional

import jax
import numpy as np

MeanProb = namedtuple(
    "MeanProb", ("weak_pos_mean", "weak_neg_mean", "strong_pos_mean", "strong_neg_mean")
)


def count_parameters(params, labels=None, trainable_only: bool = True) -> int:
    """Total number of scalars in a param tree.

    ``labels``: optional label tree (from ``train.optim.label_params``);
    with ``trainable_only`` the 'frozen' group is excluded.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    if labels is not None and trainable_only:
        lflat = flax.traverse_util.flatten_dict(labels, sep="/")
        flat = {k: v for k, v in flat.items() if lflat.get(k) != "frozen"}
    return int(sum(np.prod(np.shape(v)) for v in flat.values()))


class ProbMeanValue:
    """Per-class probability histograms/means for pos vs neg frames."""

    def __init__(self, n_bins: int, class_num: int = 10):
        self.n_bins = n_bins
        self.bins = np.linspace(0, 1, n_bins + 1)
        self.class_num = class_num
        self.hist = {
            key: {i: np.zeros(n_bins) for i in range(class_num)}
            for key in ("strong_pos", "strong_neg", "weak_pos", "weak_neg")
        }
        self._means = {k: [] for k in ("weak_pos", "weak_neg", "strong_pos", "strong_neg")}

    def _mean_p(self, preds: np.ndarray, labels: np.ndarray):
        """Per-class mean probability over positive / negative entries."""
        pos = np.where(labels > 0.5, preds, np.nan)
        neg = np.where(labels <= 0.5, preds, np.nan)
        axes = tuple(i for i in range(preds.ndim) if i != 1)
        import warnings

        # a class with no positives (or no negatives) in the batch is a
        # valid all-NaN slice, not warning-worthy
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.filterwarnings("ignore", message="Mean of empty slice")
            return np.nanmean(pos, axis=axes), np.nanmean(neg, axis=axes)

    def _hist(self, preds: np.ndarray, labels: np.ndarray, key_pos: str, key_neg: str):
        for c in range(self.class_num):
            p = preds[:, c].reshape(-1)
            l = labels[:, c].reshape(-1)
            self.hist[key_pos][c] += np.histogram(p[l > 0.5], bins=self.bins)[0]
            self.hist[key_neg][c] += np.histogram(p[l <= 0.5], bins=self.bins)[0]

    def update_buffer(self, preds, labels, weak_preds, labels_weak):
        """preds/labels: [B, C, T] strong; weak_preds/labels_weak: [B, C]."""
        preds, labels = np.asarray(preds), np.asarray(labels)
        weak_preds, labels_weak = np.asarray(weak_preds), np.asarray(labels_weak)
        wp, wn = self._mean_p(weak_preds, labels_weak)
        sp, sn = self._mean_p(preds, labels)
        self._means["weak_pos"].append(wp)
        self._means["weak_neg"].append(wn)
        self._means["strong_pos"].append(sp)
        self._means["strong_neg"].append(sn)
        self._hist(preds, labels, "strong_pos", "strong_neg")
        self._hist(weak_preds, labels_weak, "weak_pos", "weak_neg")

    def compute_mean_prob(self) -> MeanProb:
        import warnings

        # all-NaN per-class slices (class never observed) are a valid
        # outcome, not worth a "Mean of empty slice" RuntimeWarning
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.filterwarnings("ignore", message="Mean of empty slice")
            return MeanProb(
                *(
                    np.nanmean(np.stack(self._means[k], axis=0), axis=0)
                    for k in ("weak_pos", "weak_neg", "strong_pos", "strong_neg")
                )
            )

    def save_hist(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.hist, f)
