"""Linear time interpolation with torch.nn.functional.interpolate parity.

The reference upsamples the 100-frame embedding grid x10 to 1000 frames
with ``F.interpolate(mode='linear')`` (align_corners=False) —
``src/models/passt/passt_sed.py:13-34,258-259``. The equivalent here
is a static gather + lerp that XLA fuses into neighbouring ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resize_time(seq: jnp.ndarray, t_out: int, mode: str = "linear") -> jnp.ndarray:
    """Resize [B, T, C] -> [B, t_out, C] along time to an arbitrary
    static length (up or down), align_corners=False: output i samples
    input coordinate (i + 0.5) * T/t_out - 0.5, edge-clamped — matching
    ``F.interpolate(mode='linear')`` for non-integer ratios too."""
    t = seq.shape[1]
    if t_out == t:
        return seq
    scale = t / t_out
    if mode == "nearest":
        idx = np.clip(np.floor(np.arange(t_out) * scale), 0, t - 1).astype(np.int32)
        return jnp.take(seq, jnp.asarray(idx), axis=1)
    # clamp coords BEFORE the floor so edge outputs replicate the edge
    # frame instead of extrapolating (w stays in [0, 1])
    coords = np.clip((np.arange(t_out) + 0.5) * scale - 0.5, 0.0, t - 1)
    lo = np.floor(coords).astype(np.int32)
    hi = np.minimum(lo + 1, t - 1)
    w_hi = (coords - lo).astype(np.float32)
    lo_v = jnp.take(seq, jnp.asarray(lo), axis=1)
    hi_v = jnp.take(seq, jnp.asarray(hi), axis=1)
    w = jnp.asarray(w_hi)[None, :, None]
    return lo_v * (1.0 - w) + hi_v * w


def interpolate_time(seq: jnp.ndarray, ratio: int, mode: str = "linear") -> jnp.ndarray:
    """Upsample [B, T, C] -> [B, T*ratio, C] along time (integer ratio)."""
    if ratio == 1:
        return seq
    return resize_time(seq, seq.shape[1] * ratio, mode)
