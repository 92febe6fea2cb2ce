"""HTSAT-family inference throughput on TPU.

Measures the CLAP-tiny HTSAT backbone (Swin window attention + freq
folding), the HTSAT_CNN closed-set head, and DASM_HTSAT open-vocab
scoring at batch 64 in bf16 — the second backbone family next to the
PaSST numbers in PARITY.md. Run: `python exps/profile_htsat.py [B]`.
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
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from transformer4sed_tpu.models.htsat import HTSATFrontend, create_htsat_model
    from transformer4sed_tpu.models.htsat_heads import DASM_HTSAT, HTSAT_CNN

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dtype = jnp.bfloat16
    frontend = HTSATFrontend()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    wav = np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))

    fe = jax.jit(lambda w: frontend.normalize(frontend(w)))
    wav_dev = jax.device_put(jnp.asarray(wav), dev)
    t_fe = timeit(fe, wav_dev)
    mel = fe(wav_dev)

    # 1. bare backbone
    bb = create_htsat_model("tiny", dtype=dtype)
    with jax.default_device(cpu):
        bvars = bb.init({"params": jax.random.PRNGKey(0)}, mel0)
    bvars = jax.device_put(bvars, dev)
    bb_fn = jax.jit(lambda v, m: bb.apply(v, m)["fine_grained_embedding"])
    t_bb = timeit(bb_fn, bvars, mel)

    # 2. HTSAT_CNN closed-set head (XL decoder)
    model = HTSAT_CNN(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=2, decoder_pos_emd_len=1024, htsat_config="tiny",
        dtype=dtype,
    )
    with jax.default_device(cpu):
        mvars = model.init({"params": jax.random.PRNGKey(0)}, mel0)
    mvars = jax.device_put(mvars, dev)
    m_fn = jax.jit(lambda v, m: model.apply(v, m, temp_w=0.1).strong)
    t_model = timeit(m_fn, mvars, mel)

    # 3. DASM_HTSAT open-vocab scoring (query cross-attention decoder)
    dasm = DASM_HTSAT(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=2, decoder_pos_emd_len=1024, htsat_config="tiny",
        at_decoder_layer=2, dtype=dtype,
    )
    with jax.default_device(cpu):
        dvars = dasm.init({"params": jax.random.PRNGKey(0)}, mel0)
    dvars = jax.device_put(dvars, dev)
    d_fn = jax.jit(lambda v, m: dasm.apply(v, m, temp_w=0.5).strong)
    t_dasm = timeit(d_fn, dvars, mel)

    print(f"B={b} bf16 (CLAP-tiny HTSAT)")
    print(f"frontend (wav->mel):          {t_fe:7.1f} ms")
    print(f"HTSAT backbone:               {t_bb:7.1f} ms  ({b / t_bb * 1000:6.1f} clips/s)")
    print(f"HTSAT_CNN full (447 cls):     {t_model:7.1f} ms  ({b / t_model * 1000:6.1f} clips/s)")
    print(f"DASM_HTSAT full (447 q):      {t_dasm:7.1f} ms  ({b / t_dasm * 1000:6.1f} clips/s)")


if __name__ == "__main__":
    main()
