"""AudioSet-strong supervised FULL train step throughput on TPU.

The third measured training path next to the MAT-SED mean-teacher and
MLM numbers in PARITY.md: HTSAT_CNN (447 classes, the
``config/audioset_strong`` shape) through ``make_supervised_step`` —
fused log-mel frontend + frame_shift/mixup/FilterAugment + forward +
backward + AdamW + BatchNorm-stat update in ONE jit. DCE-proof: the
timing fence reads the *updated* params (returning only the loss lets
XLA dead-code-eliminate backward+optimizer — PARITY.md methodology).

Run: ``python exps/profile_audioset_train.py [B]``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force_scalar(tree):
    """Cheap scalar that data-depends on every leaf of ``tree``."""
    return sum(jnp.sum(x[(0,) * x.ndim]) for x in jax.tree_util.tree_leaves(tree))


def main():
    import optax

    from transformer4sed_tpu.models.htsat import HTSATFrontend
    from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.audioset_strong import (
        SupervisedConfig,
        make_supervised_step,
    )
    from transformer4sed_tpu.train.mlm import MLMState

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = jnp.bfloat16
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    frontend = HTSATFrontend()
    model = HTSAT_CNN(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=3, dtype=dtype,
    )
    model_apply = common.make_model_apply(model, True)

    wav = np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel0)
        out0, _ = model_apply(
            variables["params"], mel0,
            model_state={k: v for k, v in variables.items() if k != "params"},
        )
    t_out = out0.strong.shape[-1]
    params = jax.device_put(variables["params"], dev)
    model_state = jax.device_put(
        {k: v for k, v in variables.items() if k != "params"}, dev
    )

    labels = (np.random.RandomState(1).rand(b, 447, t_out) > 0.995).astype(np.float32)
    batch = {
        "wav": jax.device_put(jnp.asarray(wav), dev),
        "labels": jax.device_put(jnp.asarray(labels), dev),
    }

    tx = optax.adamw(1e-4, weight_decay=1e-4)
    state = MLMState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), model_state=model_state,
    )
    state = jax.device_put(state, dev)

    raw_step = make_supervised_step(model_apply, frontend, tx, SupervisedConfig())

    @jax.jit
    def step(state, batch, key):
        new_state, metrics = raw_step(state, batch, key)
        fence = metrics["loss_class_strong"] + force_scalar(new_state.params)
        return new_state, fence

    key = jax.random.PRNGKey(0)
    state, fence = step(state, batch, key)  # compile + warmup
    float(fence)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, fence = step(state, batch, jax.random.fold_in(key, i))
    float(fence)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"HTSAT_CNN supervised FULL train step (447 classes, T_out={t_out}): "
        f"B={b} {dt * 1000:.1f} ms/step = {b / dt:.1f} clips/s/chip"
    )


if __name__ == "__main__":
    main()
