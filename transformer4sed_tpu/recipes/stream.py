"""Streaming (online) SED: score a live audio stream incrementally.

Beyond the reference (whose closest path is offline long-file
overlap-add, ``src/codec/decoder.py:138-190``): a push-based scorer for
real-time serving. Audio arrives in arbitrary-size chunks; fixed
``codec.audio_len``-second windows advance by ``hop_seconds`` through a
host ring buffer, each window runs through ONE compiled jit forward
(same static shape every call), and frame scores overlap-add into a
running timeline. Frames that no future window can still touch are
*finalized* and emitted — latency is bounded by one window length.

Usage::

    scorer = StreamingScorer(model, frontend, params, codec)
    for chunk in microphone():              # any chunk sizes
        for t0, scores in scorer.push(chunk):   # finalized frames
            ...
    for t0, scores in scorer.flush():       # drain the tail
        ...
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StreamingScorer:
    """Incremental overlap-add scorer over a live waveform stream.

    Emits ``(frame_onset_seconds, scores[C])`` rows in time order, each
    exactly once, independent of how the input was chunked.
    """

    def __init__(
        self,
        model,
        frontend,
        params,
        codec,
        hop_seconds: Optional[float] = None,  # default: window / 5
        median_filter=7,
        model_kwargs: Optional[dict] = None,
        model_state=None,
    ):
        from transformer4sed_tpu.core.filters import apply_class_filter

        self.codec = codec
        self.win = int(codec.audio_len * codec.sr)
        if hop_seconds is None:
            hop_seconds = codec.audio_len / 5.0
        self.hop = max(int(hop_seconds * codec.sr), 1)
        if self.hop > self.win:
            raise ValueError(
                f"hop_seconds ({hop_seconds}) must not exceed the window "
                f"length ({codec.audio_len}s) — gaps between windows would "
                "silently drop audio"
            )
        self.params = params
        self.model_state = model_state
        model_kwargs = dict(model_kwargs or {})
        if isinstance(median_filter, list):
            median_filter = tuple(median_filter)

        @jax.jit
        def forward(params, model_state, wav):
            mel = frontend.normalize(frontend(wav))
            out = model.apply({"params": params, **(model_state or {})}, mel, **model_kwargs)
            scores = jnp.transpose(out.strong, (0, 2, 1))  # [1, T, C]
            return apply_class_filter(scores, median_filter, kind="median")[0]

        self._forward = forward
        self._buffer = np.zeros(0, np.float32)
        self._consumed = 0  # samples dropped from the left of the buffer
        self._next_win = 0  # sample index of the next window start
        # accumulators hold frames [_frame_base, _frame_base + len);
        # finalized rows are compacted away so live streams stay bounded
        self._acc: Optional[np.ndarray] = None  # [frames, C] running sums
        self._cnt: Optional[np.ndarray] = None
        self._frame_base = 0
        self._emitted = 0  # finalized frame count (absolute)
        self._frames_per_win: Optional[int] = None

    # -- internals ------------------------------------------------------------------

    def _frame_of(self, sample: int) -> int:
        """Timeline frame index of a sample position (window frame grid)."""
        return int(round(sample / self.win * self._frames_per_win))

    def _grow(self, n_frames_rel: int):
        if self._acc is None or n_frames_rel > self._acc.shape[0]:
            new = max(n_frames_rel, 2 * (self._acc.shape[0] if self._acc is not None else 256))
            acc = np.zeros((new, self._n_classes), np.float32)
            cnt = np.zeros((new, 1), np.float32)
            if self._acc is not None:
                acc[: self._acc.shape[0]] = self._acc
                cnt[: self._cnt.shape[0]] = self._cnt
            self._acc, self._cnt = acc, cnt

    def _run_window(self, start: int, wav: np.ndarray):
        scores = np.asarray(self._forward(self.params, self.model_state, jnp.asarray(wav[None])))
        if self._frames_per_win is None:
            self._frames_per_win = scores.shape[0]
            self._n_classes = scores.shape[1]
        f0 = self._frame_of(start) - self._frame_base
        if f0 < 0:
            # frames below the compacted base were already finalized and
            # are never revised (flush's tail window can reach back)
            scores = scores[-f0:]
            f0 = 0
        if not scores.shape[0]:
            return
        self._grow(f0 + scores.shape[0])
        self._acc[f0 : f0 + scores.shape[0]] += scores
        self._cnt[f0 : f0 + scores.shape[0]] += 1.0

    def _finalize_until(self, frame_end: int) -> List[Tuple[float, np.ndarray]]:
        out = []
        if self._acc is None:
            return out
        frame_end = min(frame_end, self._frame_base + self._acc.shape[0])
        sec_per_frame = self.codec.audio_len / self._frames_per_win
        for f in range(self._emitted, frame_end):
            rel = f - self._frame_base
            if self._cnt[rel, 0] > 0:
                out.append((f * sec_per_frame, self._acc[rel] / self._cnt[rel, 0]))
        self._emitted = max(self._emitted, frame_end)
        # compact: drop finalized rows so a 24/7 stream stays O(window)
        drop = self._emitted - self._frame_base
        if drop > 0:
            self._acc = self._acc[drop:].copy()
            self._cnt = self._cnt[drop:].copy()
            self._frame_base = self._emitted
        return out

    # -- public API -----------------------------------------------------------------

    def push(self, chunk: np.ndarray) -> List[Tuple[float, np.ndarray]]:
        """Feed a waveform chunk; returns newly finalized
        ``(frame_onset_seconds, scores[C])`` rows."""
        self._buffer = np.concatenate([self._buffer, np.asarray(chunk, np.float32)])
        total = self._consumed + len(self._buffer)
        while self._next_win + self.win <= total:
            lo = self._next_win - self._consumed
            self._run_window(self._next_win, self._buffer[lo : lo + self.win])
            self._next_win += self.hop
        # drop samples neither a future hop window nor the end-anchored
        # flush window can need: the flush window starts at total - win,
        # which always lies at or after total - win >= consumed-candidate
        # (the hop loop guarantees next_win > total - win)
        keep_sample = max(total - self.win, 0)
        drop = keep_sample - self._consumed
        if drop > 0:
            self._buffer = self._buffer[drop:]
            self._consumed += drop
        # frames strictly before the next window start are final
        if self._frames_per_win is None:
            return []
        return self._finalize_until(self._frame_of(self._next_win))

    def flush(self) -> List[Tuple[float, np.ndarray]]:
        """End of stream: score one final window anchored at the stream
        end (zero-padded if the stream is shorter than a window) and
        emit everything remaining.

        Frames already finalized by :meth:`push` are NOT revised — the
        tail window only refines unemitted frames. This is the streaming
        trade-off (bounded latency); when the stream length lands on the
        hop grid the result is identical to offline overlap-add."""
        total = self._consumed + len(self._buffer)
        last_hop_start = self._next_win - self.hop if self._next_win > 0 else None
        start = max(total - self.win, 0)
        if total > self._next_win and start != last_hop_start:
            # final window ends exactly at the stream end (zero-padded for
            # streams shorter than a window); push keeps >= one window of
            # history, so start >= consumed always holds. Skipped when the
            # stream length lands on the hop grid (the window was already
            # scored — a duplicate forward would not change the mean)
            lo = start - self._consumed
            assert lo >= 0, "streaming buffer dropped samples the flush window needs"
            wav = self._buffer[lo:]
            if len(wav) < self.win:
                wav = np.concatenate([wav, np.zeros(self.win - len(wav), np.float32)])
            self._run_window(start, wav[: self.win])
        if self._frames_per_win is None:
            return []
        end_frame = self._frame_of(total) if total else 0
        return self._finalize_until(end_frame)

    def stream(self, chunks) -> Iterator[Tuple[float, np.ndarray]]:
        """Convenience: iterate finalized rows over a chunk iterable,
        including the flush."""
        for chunk in chunks:
            yield from self.push(chunk)
        yield from self.flush()


def main(argv=None):
    """CLI: stream a wav file through the scorer (simulated live input),
    printing one JSON line per finalized frame row::

        python -m transformer4sed_tpu.recipes.stream \
            --config_dir config/mat-sed/finetune1.yaml --ckpt <orbax> \
            --wav long.wav [--hop 2.0] [--chunk 0.5] [--threshold 0.5]

    With --threshold, prints detected (event, onset, offset) segments
    instead of raw frame scores.
    """
    import argparse
    import json
    import os

    from transformer4sed_tpu.data.audio_io import load_audio
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model
    from transformer4sed_tpu.utils.checkpoint import restore_params
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    parser = argparse.ArgumentParser(description="streaming SED over a wav file")
    parser.add_argument("--config_dir", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--wav", required=True)
    parser.add_argument("--hop", type=float, default=None, help="window hop seconds (default window/5)")
    parser.add_argument("--chunk", type=float, default=0.5, help="simulated input chunk seconds")
    parser.add_argument("--threshold", type=float, default=None,
                        help="emit thresholded events instead of frame scores")
    args = parser.parse_args(argv)

    config = load_yaml_with_include(args.config_dir)
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    params = restore_params(args.ckpt)
    model_state = common.sibling_model_state(args.ckpt)
    model_name = config.get("model_name", "PaSST_SED")

    scorer = StreamingScorer(
        model, frontend, params, codec, hop_seconds=args.hop,
        median_filter=common.median_filter_from_config(config, codec),
        model_kwargs=config.get(model_name, {}).get("test_kwargs", {}),
        model_state=model_state,
    )
    wav = load_audio(args.wav, codec.sr)
    chunk = max(int(args.chunk * codec.sr), 1)
    chunks = (wav[i : i + chunk] for i in range(0, len(wav), chunk))

    open_events = {}  # label -> onset (threshold mode)
    last_t = 0.0
    for t0, scores in scorer.stream(chunks):
        if args.threshold is None:
            print(json.dumps({"t": round(t0, 4), "scores": [round(float(s), 5) for s in scores]}))
            continue
        last_t = t0
        for ci, label in enumerate(codec.labels):
            on = scores[ci] > args.threshold
            if on and label not in open_events:
                open_events[label] = t0
            elif not on and label in open_events:
                print(json.dumps({"event": label, "onset": round(open_events.pop(label), 4),
                                  "offset": round(t0, 4)}))
    for label, onset in sorted(open_events.items(), key=lambda kv: kv[1]):
        print(json.dumps({"event": label, "onset": round(onset, 4), "offset": round(last_t, 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
