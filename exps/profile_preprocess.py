"""Micro-breakdown of the train-step preprocess segment (frontend + aug).

The r4 segment profile attributed 28.6 ms @ B=24 to preprocess — ~10x
the pro-rata inference frontend cost (8 ms @ B=128, one view). This
study splits that segment into its production pieces to find where the
milliseconds actually go:

  (a) full make_preprocess (frontend + frame_shift + mixup + 2 views)
  (b) frontend + normalize only (one view of the same wav)
  (c) b + frame_shift
  (d) b + feature_transformation (2 views)
  (e) STFT frame-gather + DFT matmul only (stft_magnitude)

Each is its own scan-`inner` jit forced through a scalar on the output,
methodology of exps/profile_train_segments.py. Run on the TPU chip.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transformer4sed_tpu.utils.profiling import force_scalar, timeit_ms as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()

    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.frontend import augment
    from transformer4sed_tpu.frontend.mel import hann_window, stft_magnitude
    from transformer4sed_tpu.train.mean_teacher import MeanTeacherConfig, make_preprocess

    b, inner = args.batch, args.inner
    dev = jax.devices()[0]
    frontend = PasstFrontend()
    s = w = b // 3
    cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=b - 2 * s)
    preprocess = make_preprocess(frontend, cfg)

    wav = jax.device_put(
        jnp.asarray(np.random.RandomState(1).randn(b, 320000).astype(np.float32) * 0.1), dev)
    labels = jax.device_put(jnp.zeros((b, 10, 1000)), dev)
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    def scan_jit(body):
        @jax.jit
        def run(wav, labels, key):
            def step(k, _):
                k, sub = jax.random.split(k)
                out = body(wav, labels, sub)
                return k, force_scalar(out)
            k, accs = jax.lax.scan(step, key, None, length=inner)
            return accs[-1]
        return run

    pieces = {
        "full_preprocess": scan_jit(
            lambda wv, lb, k: preprocess({"wav": wv, "labels": lb}, k)),
        "frontend_only": scan_jit(
            lambda wv, lb, k: frontend.normalize(frontend(wv, key=k, training=True))),
        "frontend+frame_shift": scan_jit(
            lambda wv, lb, k: augment.frame_shift(
                k, frontend.normalize(frontend(wv, key=k, training=True)), lb,
                net_pooling=cfg.net_pooling, max_shift_frame=cfg.max_shift_frame)),
        "frontend+2views": scan_jit(
            lambda wv, lb, k: augment.feature_transformation(
                k, frontend.normalize(frontend(wv, key=k, training=True)),
                n_transform=cfg.n_transform, choice=cfg.transform_choice,
                filter_db_range=cfg.filter_db_range, filter_bands=cfg.filter_bands,
                filter_minimum_bandwidth=cfg.filter_minimum_bandwidth,
                filter_type=cfg.filter_type, freq_mask_ratio=cfg.freq_mask_ratio,
                noise_snrs=cfg.noise_snrs, norm_std=5.0)),
        "stft_only": scan_jit(
            lambda wv, lb, k: stft_magnitude(
                wv, frontend.n_fft, frontend.hop_length, frontend.win_length,
                jnp.asarray(hann_window(frontend.win_length, periodic=False)))),
    }
    for name, fn in pieces.items():
        ms = timeit(fn, wav, labels, key) / inner
        print(f"{name:24s} {ms:7.2f} ms/step  (B={b}, scan-{inner})", flush=True)


if __name__ == "__main__":
    main()
