"""Backward-pass decomposition of the mean-teacher train step.

profile_train_segments.py attributed 226 ms of the 423 ms B=24 step to
the backward — 2.68x the 84.5 ms student forward vs the ~2x theoretical
(attention saved-O recompute adds ~0.5x on the attention share only).
This study splits the backward by architecture piece via
differentiation scope (grads w.r.t. a params SUBSET let XLA dead-code
eliminate the other piece's weight-grad AND, for the decoder-only
scope, the whole backbone backward), and A/Bs the Pallas kernels
against XLA at the training batch:

  fwd            loss value only
  grad[dec]      + decoder/head backward only (backbone params constant)
  grad[all]      + backbone backward too
  grad[all,xla]  use_flash=False everywhere

Run on the chip: `python exps/profile_train_bwd.py [B]`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transformer4sed_tpu.utils.profiling import force_scalar, timeit_ms as timeit  # noqa: E402


def main():
    from transformer4sed_tpu.core import losses as L
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    kw = dict(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        dtype=jnp.bfloat16,
    )
    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    model = PaSST_SED(**kw, use_flash=True)
    model_xla = PaSST_SED(**kw, use_flash=False)
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel0)["params"]
    params = jax.device_put(params, dev)

    wav = jnp.asarray(np.random.RandomState(1).randn(b, 320000).astype(np.float32) * 0.1)
    mel = jax.jit(lambda w: frontend.normalize(frontend(w)))(jax.device_put(wav, dev))
    labels = jax.device_put(jnp.asarray(
        (np.random.RandomState(2).rand(b, 10, 1000) > 0.9).astype(np.float32)), dev)

    def split(params):
        bb = {"backbone": params["backbone"]}
        rest = {k: v for k, v in params.items() if k != "backbone"}
        return bb, rest

    def loss_of(m):
        def loss(bb, rest, mel, labels):
            p = {**bb, **rest}
            out = m.apply({"params": p}, mel, temp_w=1.0)
            return (L.bce(out.strong, labels) + L.bce(out.weak, labels.max(-1))
                    + L.bce(out.at_out, labels.max(-1)))

        return loss

    bb, rest = split(params)

    results = {}
    for name, m in (("pallas", model), ("xla", model_xla)):
        loss = loss_of(m)
        f_fwd = jax.jit(lambda bb, rest: loss(bb, rest, mel, labels))
        f_dec = jax.jit(lambda bb, rest: force_scalar(
            jax.grad(loss, argnums=1)(bb, rest, mel, labels)))
        f_all = jax.jit(lambda bb, rest: force_scalar(
            jax.grad(loss, argnums=(0, 1))(bb, rest, mel, labels)))
        t_fwd = timeit(f_fwd, bb, rest)
        t_dec = timeit(f_dec, bb, rest)
        t_all = timeit(f_all, bb, rest)
        results[name] = (t_fwd, t_dec, t_all)
        print(f"B={b} [{name:6s}] fwd {t_fwd:7.1f} | fwd+dec_bwd {t_dec:7.1f} "
              f"(dec_bwd {t_dec - t_fwd:6.1f}) | fwd+full_bwd {t_all:7.1f} "
              f"(bb_bwd {t_all - t_dec:6.1f}, bwd/fwd {(t_all - t_fwd) / t_fwd:4.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
