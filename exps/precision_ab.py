"""bf16 vs f32 training A/B on the flagship MAT-SED configuration.

The flagship bench trains with bf16 compute (f32 params + optimizer
state), while the reference trains f32 end-to-end
(``/root/reference/recipes/desed/finetune/train.py:194-199`` under
default autocast-off). This study quantifies what that policy costs in
numerics, on the chip, with everything else held fixed:

  * SAME init, SAME batches, SAME PRNG keys; only the model compute
    dtype differs (params/opt are f32 in both arms).
  * per-step loss trajectories for N full mean-teacher steps
    (frontend + aug + student fwd/bwd + teacher fwd + AdamW + EMA);
  * gradient agreement probes at chunk boundaries: cosine similarity
    and norm ratio of the bf16 vs f32 gradient evaluated at the SAME
    (f32-trajectory) state;
  * same-params compute error: eval-mode forward of one param set
    under both dtypes (student and teacher trees);
  * cross-trajectory divergence: f32 eval-mode forward of the two
    final param sets against each other;
  * synthetic-eval PSDS1/PSDS2 per arm (tone-event mini val set,
    median filter, the production decode path) and the delta;
  * wall-clock per step for both arms (the price of f32).

Results + the production precision policy live in docs/PRECISION.md;
the CPU-scale regression bound lives in tests/test_precision.py.

Run: ``python exps/precision_ab.py [--steps 200] [--batch 24]`` (on the
TPU; compiles the f32 train step fresh — run in background).
"""

import argparse
import functools
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


def make_train_data(batch, chunk, n_frames=1000, n_classes=10, sr=32000, n_samples=320000):
    """Learnable synthetic batch (soak_train.py recipe + a 2nd class):
    880 Hz tone -> class 0, 2.2 kHz tone -> class 1, on a noise floor."""
    rng = np.random.RandomState(0)
    s = batch // 3
    wav = rng.randn(batch, n_samples).astype(np.float32) * 0.02
    labels = np.zeros((batch, n_classes, n_frames), np.float32)
    t = np.arange(n_samples // 2) / sr
    tone0 = (0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    tone1 = (0.3 * np.sin(2 * np.pi * 2200 * t)).astype(np.float32)
    for i in range(s):
        if i % 2 == 0:
            wav[i, : n_samples // 2] += tone0
            labels[i, 0, : n_frames // 2] = 1.0
        else:
            wav[i, n_samples // 2 :] += tone1
            labels[i, 1, n_frames // 2 :] = 1.0
    return {
        "wav": jnp.broadcast_to(jnp.asarray(wav), (chunk, batch, n_samples)),
        "labels": jnp.broadcast_to(jnp.asarray(labels), (chunk, batch, n_classes, n_frames)),
    }


def make_val_data(n_clips=24, sr=32000, n_samples=320000):
    """Tone-event val clips with ground-truth event lists for PSDS."""
    rng = np.random.RandomState(7)
    wav = rng.randn(n_clips, n_samples).astype(np.float32) * 0.02
    gt, durations = {}, {}
    for i in range(n_clips):
        fname = f"val_{i:02d}"  # stem keys (what the decode path emits)
        events = []
        if i % 4 != 3:  # 3 of 4 clips carry one event; rest are noise-only
            cls = i % 2
            onset = float(rng.uniform(0.5, 4.0))
            length = float(rng.uniform(2.0, 5.0))
            offset = min(onset + length, 10.0)
            a, b = int(onset * sr), int(offset * sr)
            freq = 880.0 if cls == 0 else 2200.0
            t = np.arange(b - a) / sr
            wav[i, a:b] += (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            events.append((onset, offset, f"c{cls}"))
        gt[fname] = events
        durations[fname] = 10.0
    return jnp.asarray(wav), gt, durations


def main():
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_loss_fn,
        make_mean_teacher_step,
        make_multi_step,
        make_preprocess,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-model smoke of the harness itself (CPU-runnable)")
    args = ap.parse_args()

    kw = dict(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True,
    )
    if args.tiny:
        kw.update(embed_dim=192, decoder_dim=192, backbone_depth=2,
                  backbone_num_heads=6, passt_feature_layer=2,
                  decoder_layer_num=1, use_flash=False)
    models = {
        "bf16": PaSST_SED(dtype=jnp.bfloat16, **kw),
        "f32": PaSST_SED(dtype=jnp.float32, **kw),
    }
    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        # params are f32 regardless of compute dtype (flax param_dtype
        # default), so ONE init serves both arms
        params = models["f32"].init({"params": jax.random.PRNGKey(0)}, mel0)["params"]
    # host master copy: each arm device_puts its OWN buffers (the donated
    # chunk step frees its input state's buffers, shared init included)
    params = jax.tree_util.tree_map(np.asarray, params)

    b = args.batch
    s = w = b // 3
    cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=b - 2 * s)
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))

    batches = jax.device_put(make_train_data(b, args.chunk), dev)
    # grad probes run next to the full f32 state + the batch stack; at
    # B=24 the probe's fwd+bwd peak OOMs a 16 GB chip, so probe at half
    # batch (same [s|w|u] composition) — grad agreement is what's
    # measured, not throughput
    pb = b // 2
    ps = pw = pb // 3
    probe_cfg = MeanTeacherConfig(strong_num=ps, weak_num=pw, unlabel_num=pb - 2 * ps)
    base = jax.device_get(jax.tree_util.tree_map(lambda x: x[0], batches))
    rows = np.concatenate([np.arange(0, ps), np.arange(s, s + pw),
                           np.arange(s + w, s + w + (pb - 2 * ps))])
    batch0 = jax.device_put(
        jax.tree_util.tree_map(lambda x: x[rows], base), dev)
    val_wav, gt, durations = make_val_data()
    val_wav = jax.device_put(val_wav, dev)

    def apply_of(m):
        return lambda p, mel, train, rngs, **k2: m.apply(
            {"params": p}, mel, train=train, rngs=rngs, **k2)

    # jitted helpers built ONCE per arm ------------------------------------
    from jax.flatten_util import ravel_pytree

    chunk_fns, grad_fns, fwd_fns = {}, {}, {}
    for name, model in models.items():
        step = make_mean_teacher_step(apply_of(model), frontend, opt, cfg)
        multi = make_multi_step(step, args.chunk)

        # donate the carried state: each chunk reuses the previous
        # chunk's buffers in place (the f32 arm would otherwise OOM next
        # to the bf16 arm's leftovers + the 1.5 GB batch stack)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(st, bts, k, multi=multi):
            final, metrics = multi(st, bts, k)
            return final, metrics["loss_class_strong"], metrics["loss_total"]

        loss_fn = make_loss_fn(apply_of(model), probe_cfg)
        preprocess = make_preprocess(frontend, probe_cfg)

        @jax.jit
        def grad_at(st, batch, k, loss_fn=loss_fn, preprocess=preprocess, model=model):
            """Flattened gradient at a given state (dtype-isolating probe)."""
            kpre, kstu, ktch = jax.random.split(k, 3)
            stu_mel, tch_mel, labels, weak_tags = preprocess(batch, kpre)
            tch_rngs = {kk: jax.random.fold_in(ktch, i)
                        for i, kk in enumerate(("patchout", "dropout", "mlm"))}
            tch = model.apply({"params": st.teacher_params}, tch_mel, train=True,
                              rngs=tch_rngs)
            tch = jax.tree_util.tree_map(jax.lax.stop_gradient, tch)
            grads = jax.grad(lambda p: loss_fn(p, None, stu_mel, labels, weak_tags,
                                               tch, kstu, st.step)[0])(st.params)
            return ravel_pytree(grads)[0]

        @jax.jit
        def fwd(p, wavs, model=model):
            mel = frontend.normalize(frontend(wavs))
            out = model.apply({"params": p}, mel, temp_w=0.5)
            return out.strong.astype(jnp.float32), out.weak.astype(jnp.float32)

        chunk_fns[name], grad_fns[name], fwd_fns[name] = run_chunk, grad_at, fwd

    n_chunks = args.steps // args.chunk
    key = jax.random.PRNGKey(0)
    results = {}
    # run the f32 arm LAST so its chunk-boundary states can feed the grad
    # probes inline (storing every boundary state would not fit HBM)
    cosines, norm_ratios = [], []
    for name in ("bf16", "f32"):
        run_chunk = chunk_fns[name]
        arm_params = jax.device_put(params, dev)
        state = create_mean_teacher_state(arm_params, opt)
        losses_strong, losses_total, times = [], [], []
        for c in range(n_chunks):
            t0 = time.perf_counter()
            state, strongc, totalc = run_chunk(state, batches, jax.random.fold_in(key, c))
            strongc, totalc = np.asarray(strongc), np.asarray(totalc)
            dt = time.perf_counter() - t0
            if c > 0:
                times.append(dt)
            losses_strong.append(strongc)
            losses_total.append(totalc)
            print(f"[{name}] chunk {c}: strong {strongc[0]:.4f}->{strongc[-1]:.4f} "
                  f"total {totalc[-1]:.4f}  {dt:.2f}s", flush=True)
            assert np.isfinite(totalc).all(), f"non-finite loss in {name} chunk {c}"
            if name == "f32":
                pk = jax.random.fold_in(jax.random.PRNGKey(99), c)
                g32 = np.asarray(grad_fns["f32"](state, batch0, pk), np.float64)
                g16 = np.asarray(grad_fns["bf16"](state, batch0, pk), np.float64)
                cos = float(g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-30))
                ratio = float(np.linalg.norm(g16) / (np.linalg.norm(g32) + 1e-30))
                cosines.append(cos)
                norm_ratios.append(ratio)
                print(f"  grad probe @step {(c + 1) * args.chunk}: cosine {cos:.6f} "
                      f"|g16|/|g32| {ratio:.4f}", flush=True)
        results[name] = {
            "strong": np.concatenate(losses_strong),
            "total": np.concatenate(losses_total),
            # offload to host + free the device state: only the param
            # trees are needed later (eval forwards / PSDS), and keeping
            # a full arm state (params+teacher+opt ~2 GB) resident OOMs
            # the other arm's larger program
            "params": jax.device_get(state.params),
            "teacher_params": jax.device_get(state.teacher_params),
            "step_s": (min(times) if times else dt) / args.chunk,
        }
        del state

    # ---- loss-trajectory delta -------------------------------------------
    f32_t, bf16_t = results["f32"]["total"], results["bf16"]["total"]
    traj_abs = np.abs(f32_t - bf16_t)
    traj_rel = traj_abs / np.maximum(np.abs(f32_t), 1e-9)
    print(f"\nloss_total trajectory delta over {args.steps} steps: "
          f"mean|Δ| {traj_abs.mean():.5f}  max|Δ| {traj_abs.max():.5f}  "
          f"mean rel {traj_rel.mean() * 100:.3f}%  max rel {traj_rel.max() * 100:.3f}%")

    # ---- eval-mode forwards ------------------------------------------------
    # (a) same params, different compute dtype (pure compute error)
    p_ref = results["f32"]["params"]
    t_ref = results["f32"]["teacher_params"]
    s32, _ = fwd_fns["f32"](p_ref, val_wav)
    s16, _ = fwd_fns["bf16"](p_ref, val_wav)
    stu_compute_err = float(jnp.abs(s32 - s16).max())
    t32, _ = fwd_fns["f32"](t_ref, val_wav)
    t16, _ = fwd_fns["bf16"](t_ref, val_wav)
    tch_compute_err = float(jnp.abs(t32 - t16).max())
    print(f"\nsame-params eval forward max|Δ| (bf16 vs f32 compute): "
          f"student {stu_compute_err:.5f}  teacher {tch_compute_err:.5f}")

    # (b) cross-trajectory: both final param sets through the f32 forward
    sB, _ = fwd_fns["f32"](results["bf16"]["params"], val_wav)
    traj_fwd_err = float(jnp.abs(s32 - sB).max())
    tB, _ = fwd_fns["f32"](results["bf16"]["teacher_params"], val_wav)
    traj_tch_err = float(jnp.abs(t32 - tB).max())
    print(f"cross-trajectory final forward max|Δ| (f32 eval of both arms): "
          f"student {traj_fwd_err:.5f}  teacher {traj_tch_err:.5f}")

    # ---- synthetic-eval PSDS -----------------------------------------------
    from transformer4sed_tpu.core.codec import LabelCodec
    from transformer4sed_tpu.eval.decode import batched_decode_preds
    from transformer4sed_tpu.eval.psds import compute_psds_from_scores

    codec = LabelCodec(labels=[f"c{i}" for i in range(10)], audio_len=10.0,
                       frame_len=1024, frame_hop=320, sr=32000)
    filenames = sorted(gt.keys())
    psds = {}
    for name in ("f32", "bf16"):
        # each arm scored through ITS OWN production forward (the policy
        # under test: the bf16 arm serves in bf16)
        strong, _ = fwd_fns[name](results[name]["params"], val_wav)
        strong = np.asarray(strong, np.float32)
        _, post = batched_decode_preds(strong, filenames, codec, filter=7,
                                       filter_type="median")
        p1, _ = compute_psds_from_scores(post, gt, durations, dtc_threshold=0.7,
                                         gtc_threshold=0.7, alpha_st=1.0)
        p2, _ = compute_psds_from_scores(post, gt, durations, dtc_threshold=0.1,
                                         gtc_threshold=0.1, cttc_threshold=0.3,
                                         alpha_ct=0.5, alpha_st=1.0)
        psds[name] = (p1, p2)
        print(f"[{name}] synthetic val PSDS1 {p1:.4f} PSDS2 {p2:.4f}")

    summary = {
        "steps": args.steps,
        "batch": args.batch,
        "loss_traj_mean_abs": float(traj_abs.mean()),
        "loss_traj_max_abs": float(traj_abs.max()),
        "loss_traj_mean_rel": float(traj_rel.mean()),
        "loss_traj_max_rel": float(traj_rel.max()),
        "final_loss_f32": float(f32_t[-1]),
        "final_loss_bf16": float(bf16_t[-1]),
        "grad_cosine_min": min(cosines),
        "grad_cosine_mean": float(np.mean(cosines)),
        "grad_norm_ratio_range": [min(norm_ratios), max(norm_ratios)],
        "same_params_fwd_max_abs_student": stu_compute_err,
        "same_params_fwd_max_abs_teacher": tch_compute_err,
        "cross_traj_fwd_max_abs_student": traj_fwd_err,
        "cross_traj_fwd_max_abs_teacher": traj_tch_err,
        "psds1_f32": psds["f32"][0], "psds2_f32": psds["f32"][1],
        "psds1_bf16": psds["bf16"][0], "psds2_bf16": psds["bf16"][1],
        "psds1_delta": psds["bf16"][0] - psds["f32"][0],
        "psds2_delta": psds["bf16"][1] - psds["f32"][1],
        "step_s_f32": results["f32"]["step_s"],
        "step_s_bf16": results["bf16"]["step_s"],
        "f32_slowdown": results["f32"]["step_s"] / results["bf16"]["step_s"],
        "device_kind": jax.devices()[0].device_kind,
    }
    print("\n" + json.dumps(summary))


if __name__ == "__main__":
    main()
