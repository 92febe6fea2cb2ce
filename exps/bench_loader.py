"""Host data-pipeline throughput: threaded loader + native WAV decode.

Measures the input pipeline ALONE (decode -> pad/truncate -> collate ->
8-way-sharded device_put), answering "can one host feed 8 chips?": the
measured full train step runs ~48 clips/s/chip (CLAUDE.md), so an
8-chip host needs >= 384 clips/s from the loader. Results + analysis in
docs/DATA.md. Equivalent of the reference's 6-worker torch DataLoader
(``recipes/desed/setting.py`` train loaders).

Usage:
  python exps/bench_loader.py [--n_files 128] [--batch 48] [--workers 6]
      [--epochs 4] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_files", type=int, default=128)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--sr", type=int, default=32000)
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--workers", type=int, default=6)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--devices", type=int, default=8,
                        help="virtual CPU devices for the sharded consumer")
    parser.add_argument("--dir", default="/tmp/bench_loader_wavs")
    parser.add_argument("--no_device_put", action="store_true",
                        help="measure pure host pipeline (no sharded put)")
    args = parser.parse_args()

    import jax

    if not args.no_device_put:
        from transformer4sed_tpu.parallel import ensure_virtual_devices

        ensure_virtual_devices(args.devices)

    import numpy as np
    from scipy.io import wavfile

    from transformer4sed_tpu.core.codec import LabelCodec
    from transformer4sed_tpu.data import DataLoader, RandomSampler, UnlabeledDataset

    os.makedirs(args.dir, exist_ok=True)
    n_samples = int(args.duration * args.sr)
    rng = np.random.RandomState(0)
    for i in range(args.n_files):
        path = os.path.join(args.dir, f"clip{i:04d}.wav")
        if not os.path.exists(path):
            wav = (rng.randn(n_samples) * 0.05 * 32767).astype(np.int16)
            wavfile.write(path, args.sr, wav)

    codec = LabelCodec(
        labels=("a",) * 10, audio_len=args.duration, frame_len=1024,
        frame_hop=320, net_pooling=1, sr=args.sr,
    )
    ds = UnlabeledDataset(args.dir, False, codec)
    loader = DataLoader(
        ds, sampler=RandomSampler(len(ds), 0), batch_size=args.batch,
        num_workers=args.workers, drop_last=True,
    )

    if args.no_device_put:
        put = lambda b: b  # noqa: E731
        fence = lambda b: None  # noqa: E731
    else:
        from transformer4sed_tpu.parallel import make_mesh, put_batch

        mesh = make_mesh(args.devices)
        put = lambda b: put_batch({"wav": b["wav"], "pad_mask": b["pad_mask"]}, mesh)  # noqa: E731
        fence = lambda b: b["wav"].block_until_ready()  # noqa: E731

    # warmup epoch (thread pool spin-up, file cache)
    for batch in loader:
        fence(put(batch))

    n_clips = 0
    t0 = time.perf_counter()
    last = None
    for _ in range(args.epochs):
        for batch in loader:
            last = put(batch)
            n_clips += len(batch["wav"])
    if last is not None:
        fence(last)
    dt = time.perf_counter() - t0

    clips_per_sec = n_clips / dt
    audio_mb_per_sec = clips_per_sec * n_samples * 2 / 1e6  # int16 source bytes
    print(json.dumps({
        "metric": "loader_clips_per_sec",
        "value": round(clips_per_sec, 1),
        "unit": "10s_clips/sec/host",
        "workers": args.workers,
        "batch": args.batch,
        "sharded_over": None if args.no_device_put else args.devices,
        "audio_mb_per_sec": round(audio_mb_per_sec, 1),
        "x_train_rate_48cps": round(clips_per_sec / 48.0, 2),
    }))


if __name__ == "__main__":
    main()
