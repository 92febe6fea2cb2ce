"""PMAM pseudo-label generation: GMM posteriors per frame -> per-clip TSVs.

Reference: ``recipes/desed/pmam/generate_pseudo_label.py:93-215`` — the
frozen network's tapped frame features go through ``predict_proba`` and
are written per clip at the label frame rate (100 Hz: onset/offset
columns + one probability column per prototype). Those TSVs feed
``FrameWiseLabeledDataset``.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def frame_probs_to_tsv(path: str, probs: np.ndarray, label_sr: float = 100.0) -> None:
    """Write [T, K] frame posteriors as onset/offset + prototype columns."""
    t, k = probs.shape
    interval = 1.0 / label_sr
    onset = np.arange(t) * interval
    offset = onset + interval
    header = "onset\toffset\t" + "\t".join(f"proto_{i}" for i in range(k))
    table = np.concatenate([onset[:, None], offset[:, None], probs], axis=1)
    np.savetxt(path, table, delimiter="\t", header=header, comments="", fmt="%.6f")


def generate_pseudo_labels(
    model,
    variables,
    gmm,
    mel_batches: Iterable,
    filename_batches: Iterable,
    out_dir: str,
    feature_layer: str = "transformer_0",
    label_sr: float = 100.0,
    model_kwargs: Optional[dict] = None,
) -> int:
    """Tap frame features, compute GMM posteriors, write one TSV per clip.

    Returns the number of clips written.
    """
    import re

    from transformer4sed_tpu.pmam.features import _flatten_intermediates

    os.makedirs(out_dir, exist_ok=True)
    model_kwargs = model_kwargs or {}

    m = re.match(r"transformer_(\d+)", feature_layer)
    block_name = f"encoder_blocks_{int(m.group(1))}" if m else None

    @jax.jit
    def forward(mel, rng):
        rngs = {"mlm": rng, "patchout": rng, "dropout": rng}
        if block_name is not None:
            out, state = model.apply(
                variables,
                mel,
                capture_intermediates=lambda mdl, _: mdl.name == block_name,
                mutable=["intermediates"],
                rngs=rngs,
                **model_kwargs,
            )
            flat = _flatten_intermediates(state["intermediates"])
            return [v for k, v in flat.items() if block_name in k][0]
        return model.apply(variables, mel, rngs=rngs, **model_kwargs).frame_before_mask

    count = 0
    base_key = jax.random.PRNGKey(0)
    for i, (mel, filenames) in enumerate(zip(mel_batches, filename_batches)):
        feats = np.asarray(forward(jnp.asarray(mel), jax.random.fold_in(base_key, i)))  # [B, T, C]
        b, t, c = feats.shape
        probs = gmm.predict_proba(feats.reshape(-1, c)).reshape(b, t, -1)
        for j, name in enumerate(filenames):
            stem = os.path.splitext(os.path.basename(name))[0]
            frame_probs_to_tsv(os.path.join(out_dir, f"{stem}.tsv"), probs[j], label_sr)
            count += 1
    return count
