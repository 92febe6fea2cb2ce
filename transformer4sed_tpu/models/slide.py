"""Sliding-window overlap-add encoding (global/local fusion).

The reference loops windows of ``win_width`` mel frames at ``step``
through the backbone one by one and overlap-adds count-normalised
embeddings into the output grid (``src/models/encoder_slide_window.py:16-36``).

TPU redesign: windows are pure data parallelism — all same-width
windows are *stacked into the batch dimension* and encoded in ONE
backbone call (MXU utilisation scales with batch), then scattered back
with static slices. Ragged tail windows (shorter than ``win_width``)
form their own group. Positions never covered by any window stay 0
(the reference's NaN -> 0 normalisation).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, List, Tuple

import jax.numpy as jnp


def window_layout(input_len: int, win_width: int, step: int) -> List[Tuple[int, int]]:
    """(start, width) of each window, matching the reference loop bounds."""
    return [
        (left, min(win_width, input_len - left))
        for left in range(0, input_len + step - win_width, step)
    ]


def slide_window_encode(
    encode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mel: jnp.ndarray,
    emb_len: int,
    win_width: int = 512,
    step: int = 49,
) -> jnp.ndarray:
    """Overlap-add encode. ``mel``: [B, F, T]; returns [B, emb_len, D].

    ``encode_fn`` maps a [N, F, W] mel window batch to [N, t_out, D]
    frame embeddings (backbone + f-pool + interpolate).
    """
    b, _, input_len = mel.shape
    scale = emb_len / input_len
    layout = window_layout(input_len, win_width, step)

    groups = defaultdict(list)
    for start, width in layout:
        groups[width].append(start)

    embedding = None
    counts = None
    for width, starts in groups.items():
        stacked = jnp.concatenate([mel[:, :, s : s + width] for s in starts], axis=0)
        outs = encode_fn(stacked)  # [B * n_windows, t_out, D]
        t_out, d = outs.shape[1], outs.shape[2]
        outs = outs.reshape(len(starts), b, t_out, d)
        if embedding is None:
            embedding = jnp.zeros((b, emb_len, d), dtype=outs.dtype)
            counts = jnp.zeros((b, emb_len, 1), dtype=outs.dtype)
        for i, s in enumerate(starts):
            out_left = round(s * scale)
            out_right = min(emb_len, out_left + t_out)
            seg = outs[i, :, : out_right - out_left]
            embedding = embedding.at[:, out_left:out_right].add(seg)
            counts = counts.at[:, out_left:out_right].add(1.0)

    return jnp.where(counts > 0, embedding / jnp.maximum(counts, 1.0), 0.0)
