"""Sustained-training soak: N full mean-teacher steps on the flagship.

Stability evidence beyond the 10-step bench window: runs the exact
`bench.measure_train` step configuration for `--steps` (default 500)
optimizer steps on learnable synthetic data (tone events on a noise
floor, so the strong loss has signal to fit), in scan-of-50 chunks, and
checks:

  * every chunk's losses are finite;
  * the classification loss DECREASES over the run (learnability);
  * per-chunk wall time stays flat (no recompiles, no host-side drift).

Run: `python exps/soak_train.py [--steps 500] [--batch 24]` (on the TPU).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
        make_multi_step,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=50)
    args = ap.parse_args()

    model = PaSST_SED(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=jnp.bfloat16,
    )
    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]
    params = jax.device_put(params, dev)

    b = args.batch
    s = w = b // 3
    cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=b - 2 * s)
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))
    step = make_mean_teacher_step(
        lambda p, m, train, rngs, **kw: model.apply({"params": p}, m, train=train, rngs=rngs, **kw),
        frontend, opt, cfg,
    )
    multi = make_multi_step(step, args.chunk)

    # learnable synthetic data: 880 Hz tone events -> class 0
    rng = np.random.RandomState(0)
    sr, n_samples, n_frames = 32000, 320000, 1000
    wav = rng.randn(b, n_samples).astype(np.float32) * 0.02
    labels = np.zeros((b, 10, n_frames), np.float32)
    t = np.arange(n_samples // 2) / sr
    tone = (0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    for i in range(s):  # strong-labeled span gets the event
        wav[i, : n_samples // 2] += tone
        labels[i, 0, : n_frames // 2] = 1.0
    batches = {
        "wav": jax.device_put(jnp.broadcast_to(jnp.asarray(wav), (args.chunk, b, n_samples)), dev),
        "labels": jax.device_put(jnp.broadcast_to(jnp.asarray(labels), (args.chunk, b, 10, n_frames)), dev),
    }
    state = jax.device_put(create_mean_teacher_state(params, opt), dev)

    @jax.jit
    def run_chunk(st, bts, k):
        final, metrics = multi(st, bts, k)
        return final, metrics["loss_class_strong"], metrics["loss_total"]

    n_chunks = args.steps // args.chunk
    key = jax.random.PRNGKey(0)
    first_strong = last_strong = None
    times = []
    for c in range(n_chunks):
        t0 = time.perf_counter()
        state, strong, total = run_chunk(state, batches, jax.random.fold_in(key, c))
        strong = np.asarray(strong)
        total = np.asarray(total)  # fences the chunk
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total).all(), f"non-finite loss in chunk {c}: {total}"
        if first_strong is None:
            first_strong = float(strong[:5].mean())
        last_strong = float(strong[-5:].mean())
        print(f"chunk {c}: strong {strong[0]:.4f}->{strong[-1]:.4f} "
              f"total {total[-1]:.4f}  {times[-1]:.2f}s "
              f"({args.chunk * b / times[-1]:.1f} clips/s)", flush=True)
    warm = times[1:] if len(times) > 1 else times
    spread = max(warm) / min(warm) - 1
    print(f"\nsoak {args.steps} steps @ B={b}: strong loss {first_strong:.4f} -> "
          f"{last_strong:.4f} ({first_strong / max(last_strong, 1e-9):.1f}x), "
          f"chunk time {min(warm):.2f}-{max(warm):.2f}s "
          f"(spread {spread * 100:.1f}%)")
    assert last_strong < first_strong, "strong loss failed to decrease over the soak"
    # regression gate: warm-chunk wall time must stay flat — drift means a
    # recompile, memory creep, or host-side leak (r4 measured 0.2%)
    assert spread < 0.10, f"per-chunk wall time drifted {spread * 100:.1f}% (>10%)"


if __name__ == "__main__":
    main()
