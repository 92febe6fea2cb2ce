"""Mean-teacher train-step throughput at several batch sizes on TPU.

DEPRECATED in favour of `exps/profile_train2.py`: this script returns
only the final loss from the scan, so the LAST iteration's optimizer/
EMA update is dead code, and it takes a single timing sample. Use
profile_train2's forced-dependency scalar for honest numbers.

Full-size MAT-SED (PaSST 768/12 + 3L XL) single-chip training step:
frontend + augmentation + student/teacher forward + 6 losses + AdamW +
EMA, one jit. Run: `python exps/profile_train.py [B ...]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import optax

    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
    )

    batches = [int(x) for x in sys.argv[1:]] or [12, 24, 48]
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
        mel = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel)["params"]

    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))

    for b in batches:
        s, w, u = max(b // 3, 1), max(b // 3, 1), b - 2 * max(b // 3, 1)
        cfg = MeanTeacherConfig(strong_num=s, weak_num=w, unlabel_num=u)
        base_step = make_mean_teacher_step(
            lambda p, mel, train, rngs, **kw: model.apply(
                {"params": p}, mel, train=train, rngs=rngs, **kw
            ),
            frontend, opt, cfg,
        )
        # multi-step scan: the axon tunnel materialises jit outputs on the
        # client, so 1 host round-trip per n steps keeps state device-side
        n = 10
        from transformer4sed_tpu.train.mean_teacher import make_multi_step

        # return only a scalar so no state/metrics pytree crosses the tunnel
        multi = jax.jit(
            lambda st, bts, k: make_multi_step(base_step, n)(st, bts, k)[1]["loss_total"][-1]
        )
        state = jax.device_put(create_mean_teacher_state(params, opt), dev)
        batches = {
            "wav": jax.device_put(jnp.asarray(
                np.random.RandomState(0).randn(n, b, 320000).astype(np.float32) * 0.1), dev),
            "labels": jax.device_put(jnp.zeros((n, b, 10, 1000)), dev),
        }
        key = jax.random.PRNGKey(0)

        try:
            _ = float(multi(state, batches, key))  # compile + warmup
            t0 = time.perf_counter()
            _ = float(multi(state, batches, jax.random.fold_in(key, 1)))
            dt = (time.perf_counter() - t0) / n
            print(f"B={b:3d}: {dt * 1000:7.1f} ms/step  {b / dt:6.1f} clips/s/chip")
        except Exception as e:
            print(f"B={b:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
