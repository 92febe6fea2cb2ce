"""Make the AudioSet "bandwidth-bound" verdict falsifiable (VERDICT r4
item 5): compute BYTES MOVED per HTSAT_CNN train step from XLA's own
cost model and derive the implied HBM-roofline floor in ms against the
chip's bandwidth — docs/KERNELS.md §AudioSet previously argued the
10.9%-MFU step is bandwidth-bound only qualitatively.

Method: lower + compile the EXACT step `bench.measure_audioset_train`
measures (same `audioset_bench_setup`, same shapes/batch), then read
`compiled.cost_analysis()["bytes accessed"]` (XLA's post-fusion HBM
traffic estimate: every buffer read/written by every fused computation)
and `["flops"]`. Floors:

  t_hbm  = bytes / BW_HBM      (819 GB/s on v5e)
  t_mxu  = flops / PEAK_BF16   (197 TFLOP/s on v5e)

If max(t_hbm, t_mxu) is close to the measured step time, the
architecture-bound claim stands quantified; if it is well below, the
gap is unexplained and fusion levers are on the table.

Run on the TPU: `python exps/audioset_roofline.py [--batch 64]`
(compile-only — no step execution, safe to run back-to-back with
other TPU work but still single-client).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e (TPU v5 lite): HBM2 bandwidth and dense bf16 peak
HBM_BYTES_PER_SEC = {"v5 lite": 819e9, "v5p": 2765e9, "v4": 1228e9,
                     "v6 lite": 1640e9}


def main():
    import optax

    from bench import _PEAK_FLOPS, audioset_bench_setup, audioset_flops_per_clip
    from transformer4sed_tpu.recipes.audioset_strong import (
        SupervisedConfig,
        make_supervised_step,
    )
    from transformer4sed_tpu.train.mlm import MLMState

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    b = args.batch

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    bw = next((v for k, v in HBM_BYTES_PER_SEC.items() if k in kind), None)
    peak = next((v for k, v in _PEAK_FLOPS.items() if k in kind), None)

    frontend, model, model_apply, params, model_state, t_dec = audioset_bench_setup()
    wav = jnp.zeros((b, 320000), jnp.float32)
    labels = jnp.zeros((b, 447, t_dec), jnp.float32)
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    state = MLMState(params=params, opt_state=tx.init(params),
                     step=jnp.zeros((), jnp.int32), model_state=model_state)
    raw_step = make_supervised_step(model_apply, frontend, tx, SupervisedConfig())

    def analyze(name, fn, *fn_args):
        compiled = jax.jit(fn).lower(*fn_args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
        t_hbm = by / bw * 1000 if bw else float("nan")
        t_mxu = fl / peak * 1000 if peak else float("nan")
        print(f"{name}: flops={fl:.3e}  bytes={by:.3e}  "
              f"t_hbm={t_hbm:.1f}ms  t_mxu={t_mxu:.1f}ms  "
              f"floor={max(t_hbm, t_mxu):.1f}ms", flush=True)
        mem = {k: v for k, v in ca.items() if "bytes" in k}
        return {"flops": fl, "bytes": by, "t_hbm_ms": t_hbm, "t_mxu_ms": t_mxu,
                "floor_ms": max(t_hbm, t_mxu), "detail": mem}

    # full train step (what the bench measures at 186.7 ms @ B=64, r4)
    res_step = analyze("train_step", raw_step, state, {"wav": wav, "labels": labels},
                       jax.random.PRNGKey(0))

    # forward only (8.8% MFU per docs/KERNELS.md): eval-mode apply
    def fwd(p, ms, w):
        mel = frontend.normalize(frontend(w))
        out, _ = model_apply(p, mel, train=False, model_state=ms, temp_w=1.0)
        return out.strong

    res_fwd = analyze("forward", fwd, params, model_state, wav)

    # DASM_HTSAT open-vocab scoring (the third flagship, 12.8% MFU):
    # same falsifiability standard for its bandwidth-bound reading
    from bench import measure_dasm_ov  # noqa: F401  (kept same config source)
    from transformer4sed_tpu.models.htsat import HTSATFrontend
    from transformer4sed_tpu.models.htsat_heads import DASM_HTSAT

    h_frontend = HTSATFrontend()
    dasm = DASM_HTSAT(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=2, decoder_pos_emd_len=1024, htsat_config="tiny",
        at_decoder_layer=2, dtype=jnp.bfloat16,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        mel0 = h_frontend.normalize(h_frontend(np.zeros((1, 320000), np.float32)))
        dvars = dasm.init({"params": jax.random.PRNGKey(0)}, mel0)

    def dasm_score(v, w):
        mel = h_frontend.normalize(h_frontend(w))
        return dasm.apply(v, mel, temp_w=0.5).strong

    res_dasm = analyze("dasm_ov_forward", dasm_score, dvars, wav)

    analytic = audioset_flops_per_clip(t_dec) * b
    print(json.dumps({
        "batch": b,
        "device_kind": getattr(dev, "device_kind", "?"),
        "hbm_bytes_per_sec": bw,
        "peak_flops": peak,
        "train_step": res_step,
        "forward": res_fwd,
        "dasm_ov_forward": res_dasm,
        "analytic_fwd_flops": analytic,
        "xla_vs_analytic_fwd_flops": res_fwd["flops"] / analytic if analytic else None,
    }, default=float))


if __name__ == "__main__":
    main()
