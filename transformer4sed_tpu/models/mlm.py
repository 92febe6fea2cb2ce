"""BERT-style masking of frame-token sequences for masked-reconstruction
pretraining (MAT-SED stage 1) — PRNG-keyed, static shapes.

Parity target: ``MlmModule`` (``src/models/transformer/mask.py:49-107``):
  * ``strategy='random'``: iid Bernoulli(mask_rate) over frames.
  * ``strategy='block'``: split T into ``T // block_width`` segments,
    draw one uniform per segment and mask the ``~mask_rate`` fraction
    with the smallest draws (via the sorted-threshold construction, so
    the masked count per sample matches the reference exactly).
  * Masked positions are replaced by the mask token with prob
    ``mask_style[0]``, by a random token from the flattened batch with
    prob ``mask_style[1]``, else kept.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MLMMasker:
    mask_rate: float = 0.75
    mask_style: Tuple[float, float, float] = (0.8, 0.1, 0.1)
    strategy: str = "block"
    block_width: int = 10

    def mask_ids(self, key: jax.Array, batch: int, seq_len: int) -> jnp.ndarray:
        """[B, T] bool mask of positions to corrupt."""
        if self.strategy == "random":
            noise = jax.random.uniform(key, (batch, seq_len))
            return noise <= self.mask_rate
        if self.strategy == "block":
            num_seg = seq_len // self.block_width
            noise = jax.random.uniform(key, (batch, num_seg))
            kth = min(int(num_seg * self.mask_rate), num_seg - 1)
            threshold = jnp.sort(noise, axis=1)[:, kth : kth + 1]
            seg_mask = noise <= threshold  # [B, num_seg]
            frame_mask = jnp.repeat(seg_mask, self.block_width, axis=1)  # [B, num_seg*bw]
            pad = seq_len - num_seg * self.block_width
            if pad:
                frame_mask = jnp.concatenate(
                    [frame_mask, jnp.zeros((batch, pad), dtype=bool)], axis=1
                )
            return frame_mask
        raise ValueError(f"unknown mask strategy {self.strategy!r}")

    def __call__(
        self, key: jax.Array, token_seq: jnp.ndarray, mask_token: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Corrupt ``token_seq`` [B, T, C]; returns (masked_seq, mask_id_seq)."""
        b, t, c = token_seq.shape
        kmask, kprob, krand = jax.random.split(key, 3)
        mask_id = self.mask_ids(kmask, b, t)

        probs = jax.random.uniform(kprob, (b, t))
        p_tok = self.mask_style[0]
        p_rand = self.mask_style[1]
        use_token = mask_id & (probs < p_tok)
        use_random = mask_id & (probs >= p_tok) & (probs < p_tok + p_rand)

        rand_src = jax.random.randint(krand, (b, t), 0, b * t)
        random_tokens = token_seq.reshape(b * t, c)[rand_src]

        out = jnp.where(use_token[..., None], mask_token.reshape(1, 1, c), token_seq)
        out = jnp.where(use_random[..., None], random_tokens, out)
        return out, mask_id
