"""Per-segment breakdown of the AudioSet-strong supervised train step.

bench.py reports the HTSAT_CNN supervised step at 186.9 ms @ B=64 =
10.9% train MFU — far below the mean-teacher flagship's 42.2%. This
study attributes the milliseconds so the figure is explained (or a
lever found): cumulative scan-amortised jits of

  (a) frontend + aug (frame_shift / mixup / FilterAugment)
  (b) + forward (loss value, grads DCE'd)
  (c) + value_and_grad (adds the backward)
  (d) full step (adds AdamW + BN-stat update)

and a batch sweep of the full step (the recipe trains at B=64; if the
tiny-Swin is bandwidth-bound, larger B should raise clips/s until HBM
runs out). All measurements are 10-step `lax.scan`s forced through a
scalar reading the final carry — single-call timings through the axon
tunnel carry ~25 ms of dispatch (see exps/profile_preprocess.py).

Run on the TPU chip: ``python exps/profile_audioset_segments.py
[--batches 64 128] [--inner 10]``. Matches the hot loop of the
reference's ``recipes/audioset_strong/base/htsat_cnn/train.py``.
"""

from __future__ import annotations

import argparse
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
    import optax

    # the benchmarked configuration is DEFINED in bench.py — import it so
    # this profiler always explains exactly the driver-visible metric
    from bench import audioset_bench_setup
    from transformer4sed_tpu.recipes.audioset_strong import (
        SupervisedConfig,
        make_supervised_loss_fn,
        make_supervised_preprocess,
        make_supervised_step,
    )
    from transformer4sed_tpu.train.mlm import MLMState

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64])
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()
    inner = args.inner

    dev = jax.devices()[0]
    frontend, model, model_apply, params, model_state, t_out = audioset_bench_setup()
    cfg = SupervisedConfig()
    loss_fn = make_supervised_loss_fn(model_apply, frontend, cfg)
    tx = optax.adamw(1e-4, weight_decay=1e-4)

    def scan_jit(body):
        # HTSATFrontend takes no key, so a constant closed-over batch
        # would let XLA hoist the whole frontend out of the scan (the
        # mean-teacher profilers are safe: PasstFrontend's fmin/fmax aug
        # is keyed). Perturb the wav per-iteration by a key-derived
        # epsilon so every step's frontend is live, like bench.py's
        # scanned-xs batches.
        @jax.jit
        def run(batch, key):
            def step(k, _):
                k, sub = jax.random.split(k)
                eps = 1e-12 * jax.random.uniform(jax.random.fold_in(sub, 99), ())
                bt = dict(batch, wav=batch["wav"] + eps)
                return k, force_scalar(body(bt, sub))
            _, accs = jax.lax.scan(step, key, None, length=inner)
            return accs[-1]
        return run

    raw_step = make_supervised_step(model_apply, frontend, tx, cfg)

    for b in args.batches:
        wav = jax.device_put(jnp.asarray(
            np.random.RandomState(0).randn(b, 320000).astype(np.float32) * 0.1), dev)
        labels = jax.device_put(jnp.asarray(
            (np.random.RandomState(1).rand(b, 447, t_out) > 0.995).astype(np.float32)), dev)
        batch = {"wav": wav, "labels": labels}
        key = jax.device_put(jax.random.PRNGKey(0), dev)

        pre_only = make_supervised_preprocess(frontend, cfg)

        def fwd_only(bt, k):
            loss, _ = loss_fn(params, model_state, bt, k)
            return loss

        def fwd_bwd(bt, k):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, model_state, bt, k)
            return loss, grads

        state = jax.device_put(MLMState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32), model_state=model_state), dev)

        @jax.jit
        def full(st, bt, k):
            def step(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                eps = 1e-12 * jax.random.uniform(jax.random.fold_in(sub, 99), ())
                st, metrics = raw_step(st, dict(bt, wav=bt["wav"] + eps), sub)
                return (st, k), metrics["loss_class_strong"] + force_scalar(st.params)
            (st, _), accs = jax.lax.scan(step, (st, k), None, length=inner)
            return accs[-1]

        pieces = [
            ("frontend+aug", scan_jit(pre_only), (batch, key)),
            ("+forward", scan_jit(fwd_only), (batch, key)),
            ("+backward", scan_jit(fwd_bwd), (batch, key)),
            ("full step", full, (state, batch, key)),
        ]
        for name, fn, a in pieces:
            ms = timeit(fn, *a) / inner
            print(f"B={b:4d} {name:14s} {ms:7.1f} ms/step ({b / ms * 1000:.1f} clips/s)",
                  flush=True)


if __name__ == "__main__":
    main()
