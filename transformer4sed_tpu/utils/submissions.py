"""DCASE submission validation + recursive resampling CLI.

Equivalents of ``src/utils/validate_submissions.py:12-60`` and
``src/utils/resample.py:10-49`` without the librosa/sed_scores_eval
dependencies: the validator checks the submission directory layout
(score TSVs per clip, consistent class columns, probability range), the
resampler walks a tree of WAVs and rewrites them at a target rate.
"""

from __future__ import annotations

import os
from glob import glob
from typing import List, Sequence

DESED_CLASSES = (
    "Alarm_bell_ringing",
    "Blender",
    "Cat",
    "Dishes",
    "Dog",
    "Electric_shaver_toothbrush",
    "Frying",
    "Running_water",
    "Speech",
    "Vacuum_cleaner",
)


def validate_submission_scores(
    scores_dir: str, expected_classes: Sequence[str] = DESED_CLASSES
) -> List[str]:
    """Validate a directory of per-clip score TSVs; returns problem list."""
    import pandas as pd

    problems = []
    paths = sorted(glob(os.path.join(scores_dir, "*.tsv")))
    if not paths:
        return [f"no .tsv score files in {scores_dir}"]
    for path in paths:
        try:
            df = pd.read_csv(path, sep="\t")
        except Exception as exc:  # noqa: BLE001
            problems.append(f"{path}: unreadable ({exc})")
            continue
        cols = list(df.columns)
        if cols[:2] != ["onset", "offset"]:
            problems.append(f"{path}: first columns must be onset/offset, got {cols[:2]}")
            continue
        if set(cols[2:]) != set(expected_classes):
            problems.append(
                f"{path}: class columns {sorted(set(cols[2:]) ^ set(expected_classes))} mismatch"
            )
        values = df[cols[2:]].to_numpy()
        if values.size and (values.min() < 0 or values.max() > 1):
            problems.append(f"{path}: scores outside [0, 1]")
        if (df["offset"].to_numpy() < df["onset"].to_numpy()).any():
            problems.append(f"{path}: offset < onset")
    return problems


def resample_tree(in_dir: str, out_dir: str, target_sr: int, verbose: bool = True) -> int:
    """Recursively resample every .wav under ``in_dir`` into ``out_dir``."""
    import numpy as np
    from scipy.io import wavfile

    from transformer4sed_tpu.data.audio_io import load_audio

    count = 0
    for root, _, files in os.walk(in_dir):
        for name in files:
            if not name.lower().endswith(".wav"):
                continue
            src = os.path.join(root, name)
            rel = os.path.relpath(src, in_dir)
            dst = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            wav = load_audio(src, target_sr)
            wavfile.write(dst, target_sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))
            count += 1
            if verbose and count % 100 == 0:
                print(f"resampled {count} files...")
    return count


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="recursive WAV resampler")
    parser.add_argument("--in_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--sr", type=int, default=32000)
    args = parser.parse_args(argv)
    n = resample_tree(args.in_dir, args.out_dir, args.sr)
    print(f"resampled {n} files to {args.sr} Hz")


if __name__ == "__main__":
    main()


def download_zenodo(url: str, out_dir: str) -> str:
    """Dataset artifact downloader (reference ``src/utils/download.py`` wget
    wrapper). Uses urllib; honours an existing file."""
    import urllib.request

    os.makedirs(out_dir, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1]
    dst = os.path.join(out_dir, name)
    if os.path.exists(dst):
        return dst
    urllib.request.urlretrieve(url, dst)
    return dst
