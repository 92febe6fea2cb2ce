"""Decompose the train-step MFU gap (36% train vs 48.9% inference MFU).

Each variant is a 10-step lax.scan forced through the final carry
(the tunnel-robust methodology of bench.py:measure_train), so the
numbers compose with BENCH train_step_ms:

  full        — the real step (aug on)                       [baseline]
  no-aug      — n_transform=0, mixup off, shift off          -> aug cost
  B=48 / B=96 — batch scaling headroom beyond the B=24 headline
                (flagship drop rates and patchout default to 0, so there
                is no dropout variant to isolate)

Run: `python exps/profile_train3.py` (on the TPU).
"""

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


def force_scalar(tree):
    return sum(jnp.sum(x[(0,) * x.ndim]) for x in jax.tree_util.tree_leaves(tree))


def build_model(**kw):
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    cfg = dict(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=jnp.bfloat16,
    )
    cfg.update(kw)
    return PaSST_SED(**cfg)


def measure(model, frontend, params, cfg_kw, batch_size, n_inner=10):
    import optax

    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
        make_multi_step,
    )

    dev = jax.devices()[0]
    s = w = batch_size // 3
    cfg = MeanTeacherConfig(
        strong_num=s, weak_num=w, unlabel_num=batch_size - 2 * s, **cfg_kw)
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))
    step = make_mean_teacher_step(
        lambda p, m, train, rngs, **kw: model.apply(
            {"params": p}, m, train=train, rngs=rngs, **kw),
        frontend, opt, cfg,
    )
    multi = make_multi_step(step, n_inner)
    state = jax.device_put(create_mean_teacher_state(params, opt), dev)
    wav = jnp.asarray(
        np.random.RandomState(1).randn(batch_size, 320000).astype(np.float32) * 0.1)
    batches = {
        "wav": jax.device_put(jnp.broadcast_to(wav, (n_inner,) + wav.shape), dev),
        "labels": jax.device_put(jnp.zeros((n_inner, batch_size, 10, 1000)), dev),
    }
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    @jax.jit
    def forced(st, bts, k):
        final, metrics = multi(st, bts, k)
        return (metrics["loss_total"][-1] + force_scalar(final.params)
                + force_scalar(final.teacher_params))

    float(forced(state, batches, key))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(forced(state, batches, key))
        best = min(best, time.perf_counter() - t0)
    return best / n_inner * 1000.0


def main():
    from transformer4sed_tpu.frontend import PasstFrontend

    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    model = build_model()
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]

    no_aug = dict(n_transform=0, mixup_prob=0.0, max_shift_frame=0)

    t_full = measure(model, frontend, params, {}, 24)
    print(f"full B=24       : {t_full:7.1f} ms/step ({24 / t_full * 1000:5.1f} clips/s)", flush=True)

    t_noaug = measure(model, frontend, params, no_aug, 24)
    print(f"no-aug B=24     : {t_noaug:7.1f} ms/step (aug cost {t_full - t_noaug:+.1f} ms)", flush=True)

    for b in (48, 96):
        t_b = measure(model, frontend, params, {}, b)
        print(f"full B={b:<3d}      : {t_b:7.1f} ms/step ({b / t_b * 1000:5.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
