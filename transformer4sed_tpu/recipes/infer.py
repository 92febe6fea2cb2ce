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
    model_state=None,
) -> Tuple[List[Tuple[str, float, float]], np.ndarray, np.ndarray]:
    """One padded clip -> (events, strong_scores [C, T], weak [C]).
    ``model_state``: non-params collections (HTSAT bn0 BatchNorm stats)."""
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
        {"params": params, **(model_state or {})}, mel,
        pad_mask=jnp.asarray(pad_mask[None]), **model_kwargs
    )
    scores = jnp.transpose(out.strong, (0, 2, 1))  # [1, T, C]
    filtered = apply_class_filter(scores, median_filter, kind="median")
    binary = np.asarray(filtered[0] > threshold).astype(np.float32)
    events = [(label, onset, offset) for label, onset, offset in codec.decode_strong(binary)]
    return events, np.asarray(out.strong[0]), np.asarray(out.weak[0])


def infer_long_audio(
    model,
    frontend,
    params,
    wav: np.ndarray,
    codec,
    threshold: float = 0.5,
    median_filter=7,
    stride: Optional[float] = None,
    segment_length: float = 1.0,
    model_kwargs: Optional[dict] = None,
    query=None,
    query_type: Optional[str] = None,
    model_state=None,
) -> Tuple[List[Tuple[str, float, float]], np.ndarray]:
    """Arbitrary-length audio -> events, via sliding 10-s windows whose
    frame scores are overlap-added into per-segment scores (the
    reference's MAESTRO long-file path, ``src/codec/decoder.py:138-190``).

    Windows of ``codec.audio_len`` seconds advance by ``stride`` (default
    half a window); all windows run as ONE batched forward. Returns
    (events, segment_scores [n_segments, C]).
    """
    from transformer4sed_tpu.core.filters import apply_class_filter
    from transformer4sed_tpu.data.audio_io import pad_wav
    from transformer4sed_tpu.eval.scores import ClipScores, segment_scores_overlap_add

    model_kwargs = dict(model_kwargs or {})
    if query is not None:
        model_kwargs["query"] = query
        model_kwargs["query_type"] = query_type

    wav = np.asarray(wav, np.float32)
    win = int(codec.audio_len * codec.sr)
    stride_s = stride if stride is not None else codec.audio_len / 2
    hop = max(int(stride_s * codec.sr), 1)
    duration = len(wav) / codec.sr
    starts = list(range(0, max(len(wav) - win, 0) + hop, hop)) or [0]

    chunks, pad_masks, clip_ids = [], [], []
    for s in starts:
        piece, pm = pad_wav(wav[s : s + win], win, codec)
        chunks.append(piece)
        pad_masks.append(pm)
        on_cs = int(round(s / codec.sr * 100))
        off_cs = int(round(min((s + win) / codec.sr, duration) * 100))
        clip_ids.append(f"clip-{on_cs}-{off_cs}")

    mel = frontend.normalize(frontend(jnp.asarray(np.stack(chunks))))
    out = model.apply(
        {"params": params, **(model_state or {})}, mel,
        pad_mask=jnp.asarray(np.stack(pad_masks)), **model_kwargs
    )
    scores = jnp.transpose(out.strong, (0, 2, 1))  # [W, T, C]
    filtered = np.asarray(apply_class_filter(scores, median_filter, kind="median"))

    t_frames = filtered.shape[1]
    # clip-relative timestamps: the overlap-add places clips by the
    # onset/offset encoded in the clip id
    frame_scores = {
        cid: ClipScores(
            filtered[i], np.linspace(0.0, codec.audio_len, t_frames + 1), codec.labels
        )
        for i, cid in enumerate(clip_ids)
    }
    segs = segment_scores_overlap_add(
        frame_scores, {"clip": duration}, codec.labels, segment_length=segment_length
    )["clip"]
    binary = (segs.scores > threshold).astype(np.float32)  # [n_seg, C]
    events = []
    for ci, label in enumerate(codec.labels):
        on = None
        for si in range(binary.shape[0]):
            if binary[si, ci] and on is None:
                on = segs.timestamps[si]
            elif not binary[si, ci] and on is not None:
                events.append((label, float(on), float(segs.timestamps[si])))
                on = None
        if on is not None:
            events.append((label, float(on), float(segs.timestamps[-1])))
    return events, segs.scores


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
    parser.add_argument("--long", action="store_true",
                        help="arbitrary-length audio via sliding windows + overlap-add")
    parser.add_argument("--stride", type=float, default=None,
                        help="window stride in seconds (default half a window)")
    args = parser.parse_args(argv)

    config = load_yaml_with_include(args.config_dir)
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    params = restore_params(args.ckpt)
    model_state = common.sibling_model_state(args.ckpt)
    wav = load_audio(args.wav, codec.sr)
    query = None if args.query is None else jnp.asarray(np.load(args.query))
    model_name = config.get("model_name", "PaSST_SED")
    if args.long:
        events, _ = infer_long_audio(
            model, frontend, params, wav, codec,
            threshold=args.threshold,
            median_filter=common.median_filter_from_config(config, codec),
            stride=args.stride,
            model_kwargs=config.get(model_name, {}).get("test_kwargs", {}),
            query=query,
            query_type=args.query_type,
            model_state=model_state,
        )
        print(json.dumps({"events": events}, indent=2))
        return
    events, strong, weak = infer_clip(
        model, frontend, params, wav, codec,
        threshold=args.threshold,
        median_filter=common.median_filter_from_config(config, codec),
        model_kwargs=config.get(model_name, {}).get("test_kwargs", {}),
        query=query,
        query_type=args.query_type,
        model_state=model_state,
    )
    print(json.dumps({"events": events, "weak": weak.tolist()}, indent=2))


if __name__ == "__main__":
    main()
