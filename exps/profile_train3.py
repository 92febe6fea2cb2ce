"""Decompose the train-step MFU gap (36% train vs 48.9% inference MFU).

Each variant reuses ``bench.measure_train`` (the driver-visible
methodology: a 10-step lax.scan forced through the final carry), so the
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure_train  # noqa: E402  (repo-root import)


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


def main():
    from transformer4sed_tpu.frontend import PasstFrontend

    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    model = build_model()
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]

    no_aug = dict(n_transform=0, mixup_prob=0.0, max_shift_frame=0)

    t_full, _ = measure_train(model, frontend, params, batch_size=24)
    print(f"full B=24       : {t_full:7.1f} ms/step ({24 / t_full * 1000:5.1f} clips/s)", flush=True)

    t_noaug, _ = measure_train(model, frontend, params, batch_size=24, cfg_overrides=no_aug)
    print(f"no-aug B=24     : {t_noaug:7.1f} ms/step (aug cost {t_full - t_noaug:+.1f} ms)", flush=True)

    for b in (48, 96):
        t_b, _ = measure_train(model, frontend, params, batch_size=b)
        print(f"full B={b:<3d}      : {t_b:7.1f} ms/step ({b / t_b * 1000:5.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
