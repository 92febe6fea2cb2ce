"""Component-level timing of the flagship MAT-SED inference path on TPU.

Times each stage of the B=64 bench forward separately (frontend, backbone
attention/MLP split, f_pool+interp, XL decoder, classifier+pools) so
optimization effort goes where the milliseconds are. Run on the real
chip: `python exps/profile_components.py [B]`.
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
    _ = float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))  # fence
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dtype = jnp.bfloat16
    model = PaSST_SED(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=dtype,
    )
    frontend = PasstFrontend()

    wav = np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mel_host = frontend.normalize(frontend(wav[:2]))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel_host)["params"]
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    wav = jax.device_put(jnp.asarray(wav), dev)

    # 1. frontend
    fe = jax.jit(lambda w: frontend.normalize(frontend(w)))
    t_fe = timeit(fe, wav)
    mel = fe(wav)

    # 2. full forward
    full = jax.jit(lambda p, m: model.apply({"params": p}, m, temp_w=0.5).strong)
    t_full = timeit(full, params, mel)

    # 3. backbone only
    bb = jax.jit(
        lambda p, m: model.apply(
            {"params": p}, m, temp_w=0.5,
            method=lambda self, mel, temp_w: self.backbone(mel[:, None], train=False)["layer10_out"],
        )
    )
    try:
        t_bb = timeit(bb, params, mel)
    except Exception as e:  # method-binding may differ; fall back
        print("backbone-only tap failed:", e)
        t_bb = float("nan")

    # 4. isolated flash attention at backbone shape
    from transformer4sed_tpu.kernels import flash_attention

    t_tokens = 1190
    qkv = [
        jax.device_put(jnp.asarray(np.random.randn(b, 12, t_tokens, 64), dtype), dev)
        for _ in range(3)
    ]
    fa = jax.jit(lambda q, k, v: flash_attention(q, k, v, sm_scale=0.125))
    t_attn = timeit(fa, *qkv)

    # 5. XL decoder at decoder shape
    from transformer4sed_tpu.models.xl import TransformerXLDecoder

    xl = TransformerXLDecoder(decoder_layer_num=3, num_heads=12, use_flash=True, dtype=dtype)
    x1000 = jax.device_put(jnp.asarray(np.random.randn(b, 1000, 768), dtype), dev)
    with jax.default_device(cpu):
        xp = xl.init(jax.random.PRNGKey(0), x1000[:1])["params"]
    xp = jax.device_put(xp, dev)
    xl_fn = jax.jit(lambda p, x: xl.apply({"params": p}, x))
    t_xl = timeit(xl_fn, xp, x1000)

    print(f"B={b} bf16")
    print(f"frontend (wav->mel norm):      {t_fe:7.1f} ms")
    print(f"full forward (mel->probs):     {t_full:7.1f} ms")
    print(f"backbone (12 blocks):          {t_bb:7.1f} ms")
    print(f"  flash attn x1 (T=1190):      {t_attn:7.1f} ms  (x12 = {12*t_attn:.1f})")
    print(f"XL decoder (3L, T=1000):       {t_xl:7.1f} ms")
    print(f"glue (full - backbone - XL):   {t_full - t_bb - t_xl:7.1f} ms")
    print(f"end-to-end clips/s at B={b}:   {b / ((t_fe + t_full) / 1000):7.1f}")


if __name__ == "__main__":
    main()
