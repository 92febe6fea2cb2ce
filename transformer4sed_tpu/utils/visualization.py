"""Host-side plotting: waveforms, spectrograms, event timelines,
prediction grids (reference ``src/utils/visualization``).

matplotlib is imported lazily and all functions accept an ``ax`` or
save path, so the module stays importable on headless TPU hosts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_waveform(wav: np.ndarray, sr: int, path: Optional[str] = None, ax=None):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 2))
    t = np.arange(len(wav)) / sr
    ax.plot(t, np.asarray(wav), linewidth=0.5)
    ax.set_xlabel("time (s)")
    if path:
        ax.figure.savefig(path, bbox_inches="tight")
    return ax


def plot_spectrogram(mel: np.ndarray, path: Optional[str] = None, ax=None, hop_s: float = 0.01):
    """mel: [F, T] log-mel."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 3))
    mel = np.asarray(mel)
    ax.imshow(mel, origin="lower", aspect="auto",
              extent=[0, mel.shape[1] * hop_s, 0, mel.shape[0]])
    ax.set_xlabel("time (s)")
    ax.set_ylabel("mel bin")
    if path:
        ax.figure.savefig(path, bbox_inches="tight")
    return ax


def plot_events(
    events: Sequence[Tuple[float, float, str]],
    classes: Sequence[str],
    clip_len: float,
    path: Optional[str] = None,
    ax=None,
    color: str = "tab:blue",
):
    """Timeline of (onset, offset, label) events as horizontal bars."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 0.4 * len(classes) + 1))
    index = {c: i for i, c in enumerate(classes)}
    for onset, offset, label in events:
        if label in index:
            ax.barh(index[label], offset - onset, left=onset, height=0.6, color=color, alpha=0.7)
    ax.set_yticks(range(len(classes)))
    ax.set_yticklabels(classes)
    ax.set_xlim(0, clip_len)
    ax.set_xlabel("time (s)")
    if path:
        ax.figure.savefig(path, bbox_inches="tight")
    return ax


def plot_prediction_grid(
    strong: np.ndarray,
    classes: Sequence[str],
    clip_len: float,
    ground_truth: Optional[Sequence[Tuple[float, float, str]]] = None,
    path: Optional[str] = None,
):
    """[C, T] frame probabilities as a heatmap with optional GT overlay."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 0.4 * len(classes) + 1))
    strong = np.asarray(strong)
    ax.imshow(strong, origin="lower", aspect="auto", vmin=0, vmax=1,
              extent=[0, clip_len, -0.5, len(classes) - 0.5], cmap="magma")
    if ground_truth:
        index = {c: i for i, c in enumerate(classes)}
        for onset, offset, label in ground_truth:
            if label in index:
                ax.plot([onset, offset], [index[label]] * 2, color="cyan", linewidth=3)
    ax.set_yticks(range(len(classes)))
    ax.set_yticklabels(classes)
    ax.set_xlabel("time (s)")
    if path:
        fig.savefig(path, bbox_inches="tight")
    return ax


def plot_psd_roc(efpr: np.ndarray, etpr: np.ndarray, psds: float, path: str, max_efpr: float = 100.0):
    """PSD-ROC curve (reference saves these next to PSDS results)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.step(efpr, etpr, where="post")
    ax.set_xlim(0, max_efpr)
    ax.set_ylim(0, 1)
    ax.set_xlabel("eFPR (per hour)")
    ax.set_ylabel("eTPR")
    ax.set_title(f"PSDS = {psds:.4f}")
    fig.savefig(path, bbox_inches="tight")
