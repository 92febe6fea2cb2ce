"""PMAM frame-feature extraction via flax intermediate capture.

The reference pulls frame embeddings with torch *forward hooks* on
decoder blocks or the interpolate module, with random-offset temporal
downsampling (``recipes/desed/pmam/extractor_feature.py:64-125``).
Hooks are implicit control flow; here the same taps come from flax's
``capture_intermediates`` — explicit, jit-compatible, and only the
requested module output is materialised.

Feature-layer names: ``transformer_{k}`` (output of decoder XL block k)
or ``after_interpolate`` (frame embedding fed to the decoder, i.e.
``SEDOutput.frame_before_mask``).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sample_features(key: jax.Array, features: jnp.ndarray, downsample_rate: int) -> jnp.ndarray:
    """Random-offset temporal downsampling (extractor_feature.py:64-69).

    features: [L, C] flattened frame features; takes one random frame per
    ``downsample_rate`` interval.
    """
    length = features.shape[0]
    intervals = jnp.arange(0, length, downsample_rate)
    offsets = jax.random.randint(key, (intervals.shape[0],), 0, downsample_rate)
    idx = jnp.minimum(intervals + offsets, length - 1)
    return features[idx]


def extract_frame_features(
    model,
    variables,
    mel_batches: Iterable,
    feature_layer: str = "transformer_0",
    downsample_rate: int = 4,
    key: Optional[jax.Array] = None,
    model_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """Run the frozen model over mel batches, tap ``feature_layer``,
    downsample, and return a [N, C] numpy feature array."""
    key = key if key is not None else jax.random.PRNGKey(0)
    model_kwargs = model_kwargs or {}

    m = re.match(r"transformer_(\d+)", feature_layer)
    if m:
        block_name = f"encoder_blocks_{int(m.group(1))}"

        def capture_filter(mdl, method_name):
            return mdl.name == block_name

        def pick(intermediates):
            flat = _flatten_intermediates(intermediates)
            matches = [v for k, v in flat.items() if block_name in k]
            if not matches:
                raise KeyError(f"no intermediate matching {block_name!r}; have {list(flat)}")
            return matches[0]

    elif feature_layer == "after_interpolate":
        capture_filter = False  # not needed; use frame_before_mask
        pick = None
    else:
        raise RuntimeError(f"unknown feature layer {feature_layer!r}")

    @jax.jit
    def forward(mel, rng):
        rngs = {"mlm": rng, "patchout": rng, "dropout": rng}
        if capture_filter:
            out, state = model.apply(
                variables, mel, capture_intermediates=capture_filter,
                mutable=["intermediates"], rngs=rngs, **model_kwargs
            )
            return pick(state["intermediates"])
        out = model.apply(variables, mel, rngs=rngs, **model_kwargs)
        return out.frame_before_mask

    chunks = []
    for i, mel in enumerate(mel_batches):
        feats = forward(jnp.asarray(mel), jax.random.fold_in(key, 10_000 + i))  # [B, T, C]
        flat = feats.reshape(-1, feats.shape[-1])
        sampled = sample_features(jax.random.fold_in(key, i), flat, downsample_rate)
        chunks.append(np.asarray(sampled))
    return np.concatenate(chunks, axis=0)


def _flatten_intermediates(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_intermediates(v, path))
        else:
            # sow stores tuples of outputs
            val = v[0] if isinstance(v, (tuple, list)) else v
            out[path] = val
    return out
