"""Shared SED model output contract.

Every SED model in the zoo produces the same triple as the reference's
``SEDModel`` ABC (``src/models/sed_model.py:7-24``): per-frame strong
probabilities, clip-level weak probabilities from linear-softmax
pooling, and a dict of auxiliary outputs. Here it is a typed struct
(flax modules return it from ``__call__``) rather than an inheritance
contract.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SEDOutput:
    """Output contract for SED models.

    Attributes:
      strong: [B, C, T] per-frame probabilities in (0, 1).
      weak: [B, C] clip-level probabilities (linear-softmax pooled).
      at_out: optional [B, C] audio-tagging branch output.
      frame_before_mask: [B, T, D] decoder input before MLM masking
        (MLM reconstruction target).
      mask_id_seq: [B, T] bool mask positions (MLM mode).
      mlm_pred: [B, T, out_dim] MLM reconstruction (MLM mode).
      extras: anything else a model wants to expose.
    """

    strong: Optional[jnp.ndarray] = None
    weak: Optional[jnp.ndarray] = None
    at_out: Optional[jnp.ndarray] = None
    frame_before_mask: Optional[jnp.ndarray] = None
    mask_id_seq: Optional[jnp.ndarray] = None
    mlm_pred: Optional[jnp.ndarray] = None
    extras: Dict[str, Any] = flax.struct.field(default_factory=dict)
