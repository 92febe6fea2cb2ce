"""Audio-query prototype extraction for DASM's audio modality.

Per-class audio queries are the label-weighted mean of HTSAT
fine-grained frame embeddings over strongly-labelled data
(reference ``recipes/audioset_strong/detect_any_sound/queries_extract/
extract_audio_queries.py:38-106``). The per-class Python loop there
becomes one masked matmul per batch: ``sums += labels @ embeddings``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def extract_audio_queries(
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterable,
    n_classes: int,
    embed_dim: int,
    frame_labels_key: str = "label",
    cap_classes: Sequence[int] = (),
    cap_threshold: int = 0,
) -> np.ndarray:
    """Accumulate per-class mean frame embeddings.

    Args:
      embed_fn: maps a wav batch [B, S] (or mel) to frame embeddings
        [B, T', D].
      batches: dicts with 'wav' and frame labels [B, C, T_lab]; labels are
        max-pooled/resampled to T' inside.
      cap_classes / cap_threshold: the reference caps over-represented
        classes (``exp_event_set``) once their frame count passes the
        threshold; same semantics here.

    Returns [C, D] query matrix (zero rows for classes never observed).
    """
    sums = np.zeros((n_classes, embed_dim), np.float64)
    counts = np.zeros((n_classes,), np.int64)
    cap = set(int(c) for c in cap_classes)

    @jax.jit
    def batch_stats(emb, labels):
        # emb [B, T', D]; labels [B, C, T_lab] -> align label grid to T'
        t_emb = emb.shape[1]
        t_lab = labels.shape[-1]
        idx = jnp.clip((jnp.arange(t_emb) * t_lab) // t_emb, 0, t_lab - 1)
        lab = jnp.take(labels, idx, axis=2)  # [B, C, T']
        lab = (lab > 0.5).astype(jnp.float32)
        s = jnp.einsum("bct,btd->cd", lab, emb)
        n = jnp.sum(lab, axis=(0, 2))
        return s, n

    for batch in batches:
        emb = embed_fn(jnp.asarray(batch["wav"]))
        s, n = batch_stats(emb, jnp.asarray(batch[frame_labels_key]))
        s, n = np.asarray(s, np.float64), np.asarray(n, np.int64)
        for c in range(n_classes):
            if c in cap and counts[c] > cap_threshold:
                continue
            sums[c] += s[c]
            counts[c] += n[c]

    means = np.zeros_like(sums, dtype=np.float32)
    nonzero = counts > 0
    means[nonzero] = (sums[nonzero] / counts[nonzero, None]).astype(np.float32)
    return means
