"""Component-level timing of the mean-teacher TRAIN step on TPU.

Breaks the 'full step' number from exps/profile_train.py into:
frontend (training-time fmin/fmax mel aug), preprocess (frame_shift +
mixup + FilterAugment views), student fwd+bwd, teacher fwd, optimizer
update + EMA. Run: `python exps/profile_train_components.py [B]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))  # fence (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1000


def main():
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend, augment
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    dtype = jnp.bfloat16
    model = PaSST_SED(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=dtype,
    )
    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]
    params = jax.device_put(params, dev)

    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))
    s = wn = max(b // 3, 1)
    u = b - 2 * s
    cfg = MeanTeacherConfig(strong_num=s, weak_num=wn, unlabel_num=u)

    wav = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1), dev)
    labels = jax.device_put(jnp.zeros((b, 10, 1000)), dev)
    key = jax.random.PRNGKey(0)

    # 1. frontend, training mode (random fmin/fmax mel aug) + normalize
    fe_train = jax.jit(lambda w, k: frontend.normalize(frontend(w, key=k, training=True)))
    t_fe = timeit(fe_train, wav, key)
    mel = fe_train(wav, key)
    # 1b. frontend eval mode for contrast
    fe_eval = jax.jit(lambda w: frontend.normalize(frontend(w)))
    t_fe_eval = timeit(fe_eval, wav)

    # 2. augmentation alone: frame_shift + mixup spans + 2-view transform
    def aug_only(mel, labels, k):
        kshift, ktrans = jax.random.split(k)
        m, lab = augment.frame_shift(kshift, mel, labels, net_pooling=1, max_shift_frame=90)
        views = augment.feature_transformation(
            ktrans, m, n_transform=2, choice=(1, 0, 0, 0),
            filter_db_range=(-0.5, 0.5), filter_bands=(3, 6),
            filter_minimum_bandwidth=6, filter_type="step", norm_std=5.0,
        )
        return views

    aug_j = jax.jit(aug_only)
    t_aug = timeit(aug_j, mel, labels, key)

    # 3. student fwd+bwd (loss+grad on fixed mel, no preprocess)
    def stu_loss(p, m, k):
        rngs = {kk: jax.random.fold_in(k, i) for i, kk in enumerate(("patchout", "dropout", "mlm"))}
        out = model.apply({"params": p}, m, train=True, rngs=rngs)
        return jnp.mean(out.strong) + jnp.mean(out.weak) + jnp.mean(out.at_out)

    stu_grad = jax.jit(lambda p, m, k: jax.grad(stu_loss)(p, m, k))
    t_stu = timeit(stu_grad, params, mel, key, n=5)

    # 4. teacher fwd only (train-mode forward, no grad)
    tch_fwd = jax.jit(lambda p, m, k: model.apply(
        {"params": p}, m, train=True,
        rngs={kk: jax.random.fold_in(k, i) for i, kk in enumerate(("patchout", "dropout", "mlm"))},
    ).strong)
    t_tch = timeit(tch_fwd, params, mel, key)

    # 5. optimizer update + EMA on a fixed grad tree
    from transformer4sed_tpu.core.ema import ema_update

    grads = stu_grad(params, mel, key)
    opt_state = jax.device_put(opt.init(params), dev)

    def opt_ema(p, g, os_):
        upd, nos = opt.update(g, os_, p)
        np_ = optax.apply_updates(p, upd)
        nt = ema_update(np_, p, jnp.int32(100), 0.999)
        return np_, nt, nos

    opt_j = jax.jit(opt_ema)
    t_opt = timeit(opt_j, params, grads, opt_state, n=5)

    # 6. the real full step for reference
    step = make_mean_teacher_step(
        lambda p, m, train, rngs, **kw: model.apply({"params": p}, m, train=train, rngs=rngs, **kw),
        frontend, opt, cfg,
    )
    state = jax.device_put(create_mean_teacher_state(params, opt), dev)
    batch = {"wav": wav, "labels": labels}
    full_j = jax.jit(lambda st, bt, k: step(st, bt, k)[1]["loss_total"])
    t_full = timeit(full_j, state, batch, key, n=5)

    print(f"B={b} bf16 train-step breakdown")
    print(f"frontend train (mel aug):   {t_fe:7.1f} ms   (eval mode: {t_fe_eval:.1f})")
    print(f"augment (shift+2 views):    {t_aug:7.1f} ms")
    print(f"student fwd+bwd:            {t_stu:7.1f} ms")
    print(f"teacher fwd:                {t_tch:7.1f} ms")
    print(f"adamw + EMA:                {t_opt:7.1f} ms")
    print(f"sum of parts:               {t_fe + t_aug + t_stu + t_tch + t_opt:7.1f} ms")
    print(f"full step (one jit):        {t_full:7.1f} ms   ({b / t_full * 1000:.1f} clips/s)")


if __name__ == "__main__":
    main()
