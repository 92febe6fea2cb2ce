"""Sliding-window (finetune2) forward throughput on TPU.

The finetune2 stage evaluates with ``encoder_win=True``: a global
backbone pass plus an overlap-add local pass over 512-frame windows
(step 49 -> 10 full + 1 ragged window batched through the backbone),
fused as ``mix_rate*local + (1-mix_rate)*global``. This measures that
forward against the global-only one. Run: `python exps/profile_window.py [B]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
    wav = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1), dev)

    fe = jax.jit(lambda w: frontend.normalize(frontend(w)))
    mel = fe(wav)

    g = jax.jit(lambda p, m: model.apply({"params": p}, m, temp_w=0.5).strong)
    t_global = timeit(g, params, mel)

    win = jax.jit(lambda p, m: model.apply(
        {"params": p}, m, temp_w=0.5, encoder_win=True, mix_rate=0.5,
        win_param=(512, 49),
    ).strong)
    t_win = timeit(win, params, mel)

    print(f"B={b} bf16")
    print(f"global-only forward:        {t_global:7.1f} ms  ({b / t_global * 1000:6.1f} clips/s)")
    print(f"encoder_win (finetune2):    {t_win:7.1f} ms  ({b / t_win * 1000:6.1f} clips/s)")
    print(f"window overhead factor:     {t_win / t_global:.2f}x")


if __name__ == "__main__":
    main()
