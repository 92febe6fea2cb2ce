"""Linear time interpolation with torch.nn.functional.interpolate parity.

The reference upsamples the 100-frame embedding grid x10 to 1000 frames
with ``F.interpolate(mode='linear')`` (align_corners=False) —
``src/models/passt/passt_sed.py:13-34,258-259``. The equivalent here
is a static gather + lerp that XLA fuses into neighbouring ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interpolate_time(seq: jnp.ndarray, ratio: int, mode: str = "linear") -> jnp.ndarray:
    """Upsample [B, T, C] -> [B, T*ratio, C] along time.

    align_corners=False convention: output i samples input coordinate
    (i + 0.5)/ratio - 0.5, edge-clamped.
    """
    if ratio == 1:
        return seq
    t = seq.shape[1]
    t_out = t * ratio
    coords = (np.arange(t_out) + 0.5) / ratio - 0.5
    if mode == "nearest":
        idx = np.clip(np.floor((np.arange(t_out)) / ratio), 0, t - 1).astype(np.int32)
        return jnp.take(seq, jnp.asarray(idx), axis=1)
    coords = np.clip(coords, 0.0, t - 1)
    lo = np.floor(coords).astype(np.int32)
    hi = np.minimum(lo + 1, t - 1)
    w_hi = (coords - lo).astype(np.float32)
    lo_v = jnp.take(seq, jnp.asarray(lo), axis=1)
    hi_v = jnp.take(seq, jnp.asarray(hi), axis=1)
    w = jnp.asarray(w_hi)[None, :, None]
    return lo_v * (1.0 - w) + hi_v * w
