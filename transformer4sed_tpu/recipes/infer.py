"""Single-clip inference: the "serve" path.

CLI equivalent of the reference's ``detect_any_sound.ipynb`` flow
(SURVEY.md §3.5): load a wav -> frontend -> model forward (optionally
with external text/audio queries and an open-vocab attention mask) ->
threshold + median filter -> (event, onset, offset) list.

Usage:
  python -m transformer4sed_tpu.recipes.infer \
      --config_dir config/mat-sed/finetune1.yaml \
      --ckpt exps/ft1/best/best_teacher \
      --wav clip.wav [--threshold 0.5] [--query queries.npy]
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def infer_clip(
    model,
    frontend,
    params,
    wav: np.ndarray,
    codec,
    threshold: float = 0.5,
    median_filter=7,
    model_kwargs: Optional[dict] = None,
    query=None,
    query_type: Optional[str] = None,
    tgt_mask=None,
) -> Tuple[List[Tuple[str, float, float]], np.ndarray, np.ndarray]:
    """One padded clip -> (events, strong_scores [C, T], weak [C])."""
    from transformer4sed_tpu.core.filters import apply_class_filter
    from transformer4sed_tpu.data.audio_io import pad_wav

    model_kwargs = dict(model_kwargs or {})
    if query is not None:
        model_kwargs["query"] = query
        model_kwargs["query_type"] = query_type
    if tgt_mask is not None:
        model_kwargs["tgt_mask"] = tgt_mask

    wav_p, pad_mask = pad_wav(np.asarray(wav, np.float32), int(codec.audio_len * codec.sr), codec)
    mel = frontend.normalize(frontend(jnp.asarray(wav_p[None])))
    out = model.apply(
        {"params": params}, mel, pad_mask=jnp.asarray(pad_mask[None]), **model_kwargs
    )
    scores = jnp.transpose(out.strong, (0, 2, 1))  # [1, T, C]
    filtered = apply_class_filter(scores, median_filter, kind="median")
    binary = np.asarray(filtered[0] > threshold).astype(np.float32)
    events = [(label, onset, offset) for label, onset, offset in codec.decode_strong(binary)]
    return events, np.asarray(out.strong[0]), np.asarray(out.weak[0])


def main(argv=None):
    from transformer4sed_tpu.data.audio_io import load_audio
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model
    from transformer4sed_tpu.utils.checkpoint import restore_params
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    parser = argparse.ArgumentParser(description="single-clip SED inference")
    parser.add_argument("--config_dir", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--wav", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--query", default=None, help=".npy query embeddings (open-vocab)")
    parser.add_argument("--query_type", default=None, choices=[None, "text", "audio"])
    args = parser.parse_args(argv)

    config = load_yaml_with_include(args.config_dir)
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    params = restore_params(args.ckpt)
    wav = load_audio(args.wav, codec.sr)
    query = None if args.query is None else jnp.asarray(np.load(args.query))
    model_name = config.get("model_name", "PaSST_SED")
    events, strong, weak = infer_clip(
        model, frontend, params, wav, codec,
        threshold=args.threshold,
        median_filter=common.median_filter_from_config(config, codec),
        model_kwargs=config.get(model_name, {}).get("test_kwargs", {}),
        query=query,
        query_type=args.query_type,
    )
    print(json.dumps({"events": events, "weak": weak.tolist()}, indent=2))


if __name__ == "__main__":
    main()
