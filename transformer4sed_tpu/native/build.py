"""Lazy build + load of the native (C++) runtime components.

Single-file C++ sources are compiled with g++ on first use and cached
next to the source (or in ``$T4S_NATIVE_CACHE``). Callers must handle a
``None`` return (no compiler / sandboxed build) and fall back to the
NumPy implementation — the native path is a pure accelerator, never a
hard dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_CACHE: dict = {}

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(src_path: str, tag: str) -> Optional[str]:
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get("T4S_NATIVE_CACHE", _SRC_DIR)
    so_path = os.path.join(cache_dir, f"_{tag}_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src_path, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
        return so_path
    except (OSError, subprocess.CalledProcessError):
        return None


def load_psds_core() -> Optional[ctypes.CDLL]:
    """The PSDS sweep library, or None when it cannot be built."""
    with _LOCK:
        if "psds" in _CACHE:
            return _CACHE["psds"]
        lib = None
        so = _build(os.path.join(_SRC_DIR, "psds_core.cpp"), "psds_core")
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
                i64p = ctypes.POINTER(ctypes.c_int64)
                lib.psds_class_sweep.restype = None
                lib.psds_class_sweep.argtypes = [
                    ctypes.POINTER(ctypes.c_float), i64p,      # scores, score_off
                    ctypes.POINTER(ctypes.c_double), i64p,     # stamps, stamp_off
                    ctypes.c_int64,                            # n_clips
                    ctypes.POINTER(ctypes.c_double), i64p,     # gt, gt_off
                    ctypes.c_int64, ctypes.c_int64,            # n_classes, class_idx
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,  # thresholds
                    ctypes.c_double, ctypes.c_double, ctypes.c_double,  # dtc/gtc/cttc
                    ctypes.c_int,                              # compute_ct
                    i64p, i64p, i64p,                          # tp, fp, ct
                ]
                dp = ctypes.POINTER(ctypes.c_double)
                lib.psds_class_exact.restype = ctypes.c_int64
                lib.psds_class_exact.argtypes = [
                    ctypes.POINTER(ctypes.c_float), i64p,      # scores, score_off
                    dp, i64p,                                  # stamps, stamp_off
                    ctypes.c_int64,                            # n_clips
                    dp, i64p,                                  # gt, gt_off
                    ctypes.c_int64, ctypes.c_int64,            # n_classes, class_idx
                    dp, ctypes.c_int,                          # gt_dur_hours, compute_ct
                    ctypes.c_double, ctypes.c_double, ctypes.c_double,  # dtc/gtc/cttc
                    dp, i64p, i64p, dp,                        # thr/tp/fp/ctr out
                ]
            except OSError:
                lib = None
        _CACHE["psds"] = lib
        return lib


def load_wav_core() -> Optional[ctypes.CDLL]:
    """The native waveform loader, or None when it cannot be built."""
    with _LOCK:
        if "wav" in _CACHE:
            return _CACHE["wav"]
        lib = None
        so = _build(os.path.join(_SRC_DIR, "wav_core.cpp"), "wav_core")
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
                lib.t4s_load_wav.restype = ctypes.c_int
                lib.t4s_load_wav.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
                ]
                lib.t4s_load_wav_batch.restype = None
                lib.t4s_load_wav_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                    ctypes.c_int, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ]
            except OSError:
                lib = None
        _CACHE["wav"] = lib
        return lib
