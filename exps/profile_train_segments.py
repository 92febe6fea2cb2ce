"""Per-segment breakdown of the mean-teacher train step + remat A/B.

VERDICT r3 task 3: the 399.8 ms / B=24 step sits at 38% train-MFU vs
48.9% inference MFU, and PARITY asserted "remat would not pay at a
compute-bound operating point" while ALSO reporting that B=96 fails to
compile (HBM) — not a compute-bound symptom. This study answers both:

1. Segment shares at a given batch: cumulative DCE-proof jits of
     (a) preprocess (frontend + aug, both views)
     (b) + teacher forward (no-grad kernel path)
     (c) + student forward (loss value, no grad)
     (d) + value_and_grad (adds the backward)
     (e) full step (adds AdamW + EMA + clip)
   built from the PRODUCTION make_preprocess / make_loss_fn pieces, so
   the differences attribute the real step's time. (Segment jits are
   separately-optimized programs, so shares are attribution estimates,
   not exact slices of one executable.)

2. Remat A/B: the same full step with PaSST(remat=True) at batches the
   plain step cannot fit (B >= 96) — if HBM, not FLOPs, gates batch
   scaling, recompute buys throughput.

Run on the TPU chip: `python exps/profile_train_segments.py [--batches 24 48]
[--remat-batches 24 96 192] [--inner 10]`. Prints one line per
measurement as it lands (compiles through the axon tunnel are slow; run
in background).

Matches the hot loop of the reference's
``recipes/desed/finetune/train.py:129-213``.
"""

from __future__ import annotations

import argparse
import json
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

from transformer4sed_tpu.utils.profiling import force_scalar, timeit_ms as timeit  # noqa: E402


def build(model):
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend

    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))
    return frontend, params, opt


def make_batch(b, dev):
    wav = jnp.asarray(np.random.RandomState(1).randn(b, 320000).astype(np.float32) * 0.1)
    return {
        "wav": jax.device_put(wav, dev),
        "labels": jax.device_put(jnp.zeros((b, 10, 1000)), dev),
    }


def segments(model, frontend, params, opt, b, dev):
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_loss_fn,
        make_mean_teacher_step,
        make_preprocess,
    )

    s = w = b // 3
    cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=b - 2 * s)

    def model_apply(p, m, train=False, rngs=None, **kw):
        return model.apply({"params": p}, m, train=train, rngs=rngs, **kw)

    preprocess = make_preprocess(frontend, cfg)
    loss_fn = make_loss_fn(model_apply, cfg)
    step = make_mean_teacher_step(model_apply, frontend, opt, cfg)

    state = jax.device_put(create_mean_teacher_state(params, opt), dev)
    batch = make_batch(b, dev)
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    def tch_fwd(tp, tch_mel, ktch):
        rngs = {k: jax.random.fold_in(ktch, i)
                for i, k in enumerate(("patchout", "dropout", "mlm"))}
        tch = model_apply(tp, tch_mel, train=True, rngs=rngs)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, tch)

    # (a) preprocess only
    def f_pre(st, bt, k):
        kpre, kstu, ktch = jax.random.split(k, 3)
        outs = preprocess(bt, kpre)
        return force_scalar([o for o in outs])

    # (b) + teacher forward
    def f_tch(st, bt, k):
        kpre, kstu, ktch = jax.random.split(k, 3)
        stu_mel, tch_mel, labels, weak = preprocess(bt, kpre)
        tch = tch_fwd(st.teacher_params, tch_mel, ktch)
        return force_scalar([stu_mel, labels, weak]) + force_scalar(
            [x for x in (tch.strong, tch.weak, tch.at_out) if x is not None]
        )

    # (c) + student forward (loss value only)
    def f_stu(st, bt, k):
        kpre, kstu, ktch = jax.random.split(k, 3)
        stu_mel, tch_mel, labels, weak = preprocess(bt, kpre)
        tch = tch_fwd(st.teacher_params, tch_mel, ktch)
        total, _ = loss_fn(st.params, None, stu_mel, labels, weak, tch, kstu, st.step)
        return total

    # (d) + backward
    def f_grad(st, bt, k):
        kpre, kstu, ktch = jax.random.split(k, 3)
        stu_mel, tch_mel, labels, weak = preprocess(bt, kpre)
        tch = tch_fwd(st.teacher_params, tch_mel, ktch)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, None, stu_mel, labels, weak, tch, kstu, st.step
        )
        return total + force_scalar(grads)

    # (e) full step
    def f_full(st, bt, k):
        new_state, metrics = step(st, bt, k)
        return (metrics["loss_total"] + force_scalar(new_state.params)
                + force_scalar(new_state.teacher_params)
                + force_scalar(new_state.opt_state))

    out = {}
    for name, f in (("pre", f_pre), ("pre+tch", f_tch), ("pre+tch+stu", f_stu),
                    ("pre+tch+grad", f_grad), ("full", f_full)):
        ms = timeit(jax.jit(f), state, batch, key)
        out[name] = ms
        print(f"  B={b} {name:14s} {ms:8.1f} ms", flush=True)
    shares = {
        "preprocess": out["pre"],
        "teacher_fwd": out["pre+tch"] - out["pre"],
        "student_fwd": out["pre+tch+stu"] - out["pre+tch"],
        "backward": out["pre+tch+grad"] - out["pre+tch+stu"],
        "opt+ema": out["full"] - out["pre+tch+grad"],
        "full": out["full"],
    }
    print(f"  B={b} shares: " + json.dumps({k: round(v, 1) for k, v in shares.items()}),
          flush=True)
    return shares


def full_step_ms(model, frontend, params, opt, b, dev, n_inner=10):
    """bench.py-methodology scan-``n_inner`` full-step time (ms/step)."""
    import optax  # noqa: F401

    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
        make_multi_step,
    )

    s = w = b // 3
    cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=b - 2 * s)
    step = make_mean_teacher_step(
        lambda p, m, train, rngs, **kw: model.apply(
            {"params": p}, m, train=train, rngs=rngs, **kw),
        frontend, opt, cfg,
    )
    multi = make_multi_step(step, n_inner)
    state = jax.device_put(create_mean_teacher_state(params, opt), dev)
    batch = make_batch(b, dev)
    batches = {
        "wav": jnp.broadcast_to(batch["wav"], (n_inner,) + batch["wav"].shape),
        "labels": jnp.broadcast_to(batch["labels"], (n_inner,) + batch["labels"].shape),
    }
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    @jax.jit
    def forced(st, bts, k):
        final, metrics = multi(st, bts, k)
        return (metrics["loss_total"][-1] + force_scalar(final.params)
                + force_scalar(final.teacher_params) + force_scalar(final.opt_state))

    return timeit(forced, state, batches, key) / n_inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[24])
    ap.add_argument("--remat-batches", type=int, nargs="*", default=[24, 96, 192])
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--skip-segments", action="store_true")
    a = ap.parse_args()

    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    kw = dict(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=jnp.bfloat16,
    )
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    model = PaSST_SED(**kw)
    frontend, params, opt = build(model)
    params_dev = jax.device_put(params, dev)

    if not a.skip_segments:
        print("== segment shares (plain) ==", flush=True)
        for b in a.batches:
            segments(model, frontend, params_dev, opt, b, dev)

    print("== full-step scan-%d: plain vs remat ==" % a.inner, flush=True)
    model_r = PaSST_SED(**kw, remat=True)
    for b in a.remat_batches:
        for name, m in (("plain", model), ("remat", model_r)):
            try:
                ms = full_step_ms(m, frontend, params_dev, opt, b, dev, a.inner)
                print(f"  B={b:4d} {name:6s} {ms:8.1f} ms/step "
                      f"({b / ms * 1000:6.1f} clips/s)", flush=True)
            except Exception as e:  # OOM at large B is data, not failure
                print(f"  B={b:4d} {name:6s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
