"""Post-processing filters as vectorized, jit-friendly jnp ops.

The reference smooths per-class frame scores with scipy's 1-D median /
maximum filter on the host (``src/codec/decoder.py:88-94``), one class
at a time inside a Python loop. Here the whole ``[B, T, C]`` score
tensor is filtered on device: windows are gathered with a static index
matrix (symmetric/reflect padding to match scipy's default boundary
mode) and reduced with a sort/max on the VPU. Per-class widths are
grouped by unique width so each group is one fused XLA op.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np


def _window_indices(t: int, width: int, mode: str = "reflect") -> np.ndarray:
    """Static gather indices implementing scipy ndimage boundary modes.

    ``reflect``: edge-duplicating reflection (d c b a | a b c d | d c b a)
    — scipy's default, used by the reference's scipy decode path
    (``src/codec/decoder.py:92``). ``nearest``: edge replication
    (a a a a | a b c d | d d d d) — torch ``F.pad(mode='replicate')``,
    used by the reference's ``median_filter_torch``
    (``src/postprocess/filter.py:32``). For window ``width`` centred per
    scipy's convention (origin 0: left half = width // 2).
    """
    left = width // 2
    idx = np.arange(t)[:, None] + np.arange(width)[None, :] - left
    if mode == "nearest":
        idx = np.clip(idx, 0, t - 1)
    elif mode == "reflect":
        # reflect with edge duplication: map i -> reflected index in [0, t)
        period = 2 * t
        idx = np.mod(idx, period)
        idx = np.where(idx < 0, idx + period, idx)
        idx = np.where(idx >= t, period - 1 - idx, idx)
    else:
        raise ValueError(f"unknown boundary mode {mode!r}")
    return idx.astype(np.int32)


def _sliding_windows(x: jnp.ndarray, width: int, axis: int, mode: str) -> jnp.ndarray:
    """Gather sliding windows of ``width`` along ``axis`` -> new trailing dim."""
    idx = jnp.asarray(_window_indices(x.shape[axis], width, mode))
    return jnp.take(x, idx, axis=axis)  # inserts the window dim right after `axis`


def median_filter(x: jnp.ndarray, width: int, axis: int = 1, mode: str = "reflect") -> jnp.ndarray:
    """1-D median filter along ``axis`` (scipy boundary-mode parity)."""
    if width <= 1:
        return x
    win = _sliding_windows(x, width, axis, mode)
    return jnp.median(win, axis=axis + 1)


def max_filter(x: jnp.ndarray, width: int, axis: int = 1, mode: str = "reflect") -> jnp.ndarray:
    """1-D maximum filter along ``axis`` (scipy boundary-mode parity)."""
    if width <= 1:
        return x
    win = _sliding_windows(x, width, axis, mode)
    return jnp.max(win, axis=axis + 1)


def apply_class_filter(
    scores: jnp.ndarray,
    widths: Union[int, Sequence[int]],
    kind: str = "median",
    mode: str = "reflect",
) -> jnp.ndarray:
    """Filter ``[..., T, C]`` scores per class with per-class window widths.

    Classes sharing a width are processed together so the number of XLA
    ops is bounded by the number of distinct widths, not the number of
    classes (unlike the reference's per-class host loop,
    ``src/codec/decoder.py:89-94``).
    """
    n_classes = scores.shape[-1]
    t_axis = scores.ndim - 2
    if isinstance(widths, (int, np.integer)):
        widths = [int(widths)] * n_classes
    widths = list(widths)
    if len(widths) != n_classes:
        raise ValueError(f"got {len(widths)} widths for {n_classes} classes")
    if kind == "median":
        fn = median_filter
    elif kind == "max":
        fn = max_filter
    else:
        raise ValueError(f"unknown filter kind {kind!r}; expected 'median' or 'max'")

    out = scores
    for width in sorted(set(widths)):
        if width <= 1:
            continue
        class_mask = np.array([w == width for w in widths])
        filtered = fn(scores, width, axis=t_axis, mode=mode)
        out = jnp.where(jnp.asarray(class_mask), filtered, out)
    return out
