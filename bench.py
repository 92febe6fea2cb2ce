"""Benchmark: MAT-SED DESED inference throughput (10-s clips/sec/chip).

Runs the flagship full-size model (PaSST 768/12 + 3-layer XL context
net, the ``docs/mat-sed`` configuration) end-to-end — waveform ->
fused log-mel -> backbone -> decoder -> frame/clip probabilities — on
whatever device jax provides, and prints ONE JSON line.

The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` is measured against a fixed eager-PyTorch-equivalent
estimate recorded in BASELINE.md methodology: the DESED validation
forward at batch 24 on the reference's 2-GPU rig processes ~O(10)
clips/s; absent a hard number we report vs_baseline=1.0 at 40 clips/s
per chip and scale linearly. The emitted JSON labels this with
``baseline_kind: "estimated"``.

Also emits ``mfu``: analytic forward FLOPs/clip (counted below from the
model dimensions — matmul/attention terms only, a slight lower bound
since frontend FFT + elementwise work is excluded) divided by measured
time and the chip's peak bf16 FLOP/s.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the train-step jit is large; cached compiles
# bring repeat bench runs from minutes to seconds
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# DCE-defeating scalar (exps/profile_train2.py methodology) — the shared
# definition lives with the other profiling primitives
from transformer4sed_tpu.utils.profiling import force_scalar as _force_scalar  # noqa: E402

# peak dense bf16 FLOP/s per chip, by device_kind substring
_PEAK_FLOPS = {
    "v5 lite": 197e12,  # v5e
    "v5p": 459e12,
    "v5": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,  # Trillium
    "v6e": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_FLOPS.items():
        if sub in kind:
            return peak
    return None


def flops_per_clip() -> float:
    """Analytic forward FLOPs for one 10-s clip through the flagship
    MAT-SED configuration (PaSST 768/12/12 @ (128, 998) mel, stride-10
    patch-16 -> 12x99 grid + 2 tokens; 3-layer XL context net at T=1000).

    Per transformer block (2 FLOPs per MAC):
      qkv 6ND^2 + scores 2N^2D + attnV 2N^2D + proj 2ND^2 + mlp 16ND^2
      = 24 N D^2 + 4 N^2 D;  XL adds the linear_pos projection (+2ND^2).
    """
    d = 768
    n_enc = 12 * 99 + 2          # PaSST tokens (12x99 grid + cls/dist)
    n_dec = 1000                 # XL context length after x10 interp
    patch = 2 * (12 * 99) * d * (16 * 16)          # conv patchify MACs*2
    enc = 12 * (24 * n_enc * d * d + 4 * n_enc * n_enc * d)
    dec = 3 * (26 * n_dec * d * d + 4 * n_dec * n_dec * d)
    interp_heads = 2 * n_dec * d * 10              # classifier (C=10)
    at_adapter = 24 * n_enc * d * d / 12           # one block-equivalent
    return float(patch + enc + dec + interp_heads + at_adapter)


def _swin_tiny_flops() -> float:
    """HTSAT tiny Swin backbone FLOPs (spec 256 / patch 4 / embed 96 /
    depths (2,2,6,2) / window 8). Swin block: qkv+proj 8ND^2 + mlp(x4)
    16ND^2 + windowed scores/PV 4*N*M*D (M = window^2 = 64)."""
    m = 64  # window^2
    swin = 0.0
    tokens, dim = 64 * 64, 96  # spec 256 / patch 4
    for depth in (2, 2, 6, 2):
        swin += depth * (24 * tokens * dim * dim + 4 * tokens * m * dim)
        tokens, dim = tokens // 4, dim * 2  # PatchMerging
    return swin


def audioset_flops_per_clip(t_dec: int) -> float:
    """Analytic forward FLOPs for one 10-s clip through the AudioSet-strong
    supervised flagship (HTSAT_CNN: tiny Swin backbone + 3-layer XL
    decoder at the x10-interpolated grid, 447 classes). Matmul/attention
    terms only — frontend FFT, interpolation and norms excluded (slight
    lower bound).

    XL decoder block at expand_rate 1: (6+2+2+4) N D^2 dense + 4 N^2 D
    attention (same convention as :func:`flops_per_clip`).
    """
    d = 768
    dec = 3 * (14 * t_dec * d * d + 4 * t_dec * t_dec * d)
    head = 2 * t_dec * d * 447
    proj = 2 * (t_dec) * d * d  # transformer_projector at the interpolated grid
    return float(_swin_tiny_flops() + dec + head + proj)


def dasm_flops_per_clip(t_dec: int, t_at: int, n_q: int = 447) -> float:
    """Analytic forward FLOPs for one 10-s clip through DASM_HTSAT
    open-vocab scoring (447 queries; the ACM MM 2025 flagship,
    reference ``recipes/audioset_strong/detect_any_sound/``). Terms
    follow ``models/htsat_heads.py:DASM_HTSAT.__call__``: tiny Swin
    backbone; transformer/at projectors; ``decoder_layer_num=2`` XL SED
    decoder on the x10 grid (t_dec); 2 cross-attention-first AT-decoder
    layers (queries x t_at pre-interp frames, expand_rate 1); sed_head +
    3-layer mask-embedding MLP + score einsum. Matmul/attention only.
    """
    d = 768
    proj = 2 * t_dec * d * d + 2 * t_at * d * d  # transformer/at projectors
    xl = 2 * (14 * t_dec * d * d + 4 * t_dec * t_dec * d)
    at_layer = (16 * n_q * d * d     # cross q/out + self qkv/out projections
                + 4 * t_at * d * d   # cross k/v projections
                + 4 * n_q * t_at * d  # cross scores + PV
                + 4 * n_q * n_q * d  # self scores + PV
                + 4 * n_q * d * d)   # ffn at expand_rate 1
    heads = (2 * t_dec * d * d       # sed_head
             + 6 * n_q * d * d       # mask_embedding MLP (3 layers)
             + 4 * n_q * d * d       # at_head MLP (2 layers)
             + 2 * n_q * t_dec * d)  # strong-score einsum
    return float(_swin_tiny_flops() + proj + xl + 2 * at_layer + heads)


def measure_dasm_ov(batch_size: int = 64, repeats: int = 3, iters: int = 10):
    """DASM_HTSAT open-vocabulary scoring throughput: wav -> HTSAT mel ->
    Swin backbone -> 447-query AT decoder + XL SED decoder -> strong
    scores, one jit (the ``exps/profile_htsat.py`` configuration, kept
    identical so its segment profile keeps explaining this number).
    Returns (forward_ms, clips_per_sec, t_dec, t_at).
    """
    from transformer4sed_tpu.models.htsat import HTSATFrontend
    from transformer4sed_tpu.models.htsat_heads import DASM_HTSAT

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    frontend = HTSATFrontend()
    dasm = DASM_HTSAT(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=2, decoder_pos_emd_len=1024, htsat_config="tiny",
        at_decoder_layer=2, dtype=jnp.bfloat16,
    )
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        dvars = dasm.init({"params": jax.random.PRNGKey(0)}, mel0)
        out0 = dasm.apply(dvars, mel0, temp_w=0.5)
    t_dec = int(out0.strong.shape[-1])
    t_at = t_dec // dasm.backbone_upsample_ratio  # pre-interp frame count
    dvars = jax.device_put(dvars, dev)
    wav = jax.device_put(jnp.asarray(
        np.random.RandomState(5).randn(batch_size, 320000).astype(np.float32) * 0.1), dev)

    @jax.jit
    def score(v, w):
        mel = frontend.normalize(frontend(w))
        out = dasm.apply(v, mel, temp_w=0.5)
        return out.strong, out.strong.sum()

    _, fence = score(dvars, wav)
    float(fence)  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            _, fence = score(dvars, wav)
        float(fence)
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return dt * 1000.0, batch_size / dt, t_dec, t_at


def audioset_bench_setup():
    """HTSAT_CNN supervised-flagship construction (CPU init, params on
    the accelerator) — ONE definition of the benchmarked configuration,
    shared by :func:`measure_audioset_train` and
    ``exps/profile_audioset_segments.py`` so the profiler always
    explains exactly the model the driver measures. Returns
    (frontend, model, model_apply, params, model_state, t_dec).
    """
    from transformer4sed_tpu.models.htsat import HTSATFrontend
    from transformer4sed_tpu.models.htsat_heads import HTSAT_CNN
    from transformer4sed_tpu.recipes import common

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    frontend = HTSATFrontend()
    model = HTSAT_CNN(
        class_num=447, decoder_dim=768, num_heads=12, decoder="transformerXL",
        decoder_layer_num=3, dtype=jnp.bfloat16,
    )
    model_apply = common.make_model_apply(model, True)
    with jax.default_device(cpu):
        mel0 = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel0)
        out0, _ = model_apply(
            variables["params"], mel0,
            model_state={k: v for k, v in variables.items() if k != "params"},
        )
    t_dec = int(out0.strong.shape[-1])
    params = jax.device_put(variables["params"], dev)
    model_state = jax.device_put(
        {k: v for k, v in variables.items() if k != "params"}, dev)
    return frontend, model, model_apply, params, model_state, t_dec


def measure_audioset_train(batch_size: int = 64, n_inner: int = 10, repeats: int = 3):
    """AudioSet-strong supervised FULL train step (HTSAT frontend + aug +
    HTSAT_CNN fwd/bwd + AdamW + BatchNorm stats, one jit) clips/s/chip,
    DCE-proof via the scan methodology of :func:`measure_train`.

    Matches the hot loop of the reference's
    ``recipes/audioset_strong/base/htsat_cnn/train.py``. Returns
    (step_ms, clips_per_sec, t_dec).
    """
    import optax

    from transformer4sed_tpu.recipes.audioset_strong import (
        SupervisedConfig,
        make_supervised_step,
    )
    from transformer4sed_tpu.train.mlm import MLMState

    dev = jax.devices()[0]
    frontend, model, model_apply, params, model_state, t_dec = audioset_bench_setup()

    wav = jnp.asarray(
        np.random.RandomState(3).randn(batch_size, 320000).astype(np.float32) * 0.1)
    labels = jnp.asarray(
        (np.random.RandomState(4).rand(batch_size, 447, t_dec) > 0.995).astype(np.float32))
    batches = {
        "wav": jax.device_put(jnp.broadcast_to(wav, (n_inner,) + wav.shape), dev),
        "labels": jax.device_put(jnp.broadcast_to(labels, (n_inner,) + labels.shape), dev),
    }
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    state = jax.device_put(
        MLMState(params=params, opt_state=tx.init(params),
                 step=jnp.zeros((), jnp.int32), model_state=model_state), dev)
    raw_step = make_supervised_step(model_apply, frontend, tx, SupervisedConfig())

    @jax.jit
    def forced(st, bts, k):
        def body(s, inp):
            b, kk = inp
            s2, metrics = raw_step(s, b, kk)
            return s2, metrics["loss_class_strong"]

        keys = jax.random.split(k, n_inner)
        final, losses = jax.lax.scan(body, st, (bts, keys))
        return (losses[-1] + _force_scalar(final.params)
                + _force_scalar(final.opt_state) + _force_scalar(final.model_state))

    key = jax.device_put(jax.random.PRNGKey(0), dev)
    float(forced(state, batches, key))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forced(state, batches, key))
        best = min(best, time.perf_counter() - t0)
    dt = best / n_inner
    return dt * 1000.0, batch_size / dt, t_dec




def measure_streaming(model, frontend, params, hop_seconds: float = 2.0,
                      audio_seconds: float = 60.0):
    """Online streaming scorer (recipes.stream.StreamingScorer): push a
    long waveform in and measure the real-time factor and per-window
    forward latency at B=1 (the serving regime ``exps/profile_stream.py``
    profiles — made driver-visible in r5). Returns
    (rtf, ms_per_window, hop_seconds)."""
    from transformer4sed_tpu.core.codec import LabelCodec
    from transformer4sed_tpu.recipes.stream import StreamingScorer

    codec = LabelCodec(
        labels=tuple(f"c{i}" for i in range(model.class_num)), audio_len=10.0,
        frame_len=1024, frame_hop=320, sr=32000,
    )
    scorer = StreamingScorer(
        model, frontend, params, codec, hop_seconds=hop_seconds,
        median_filter=7, model_kwargs={"temp_w": 0.5},
    )
    sr = codec.sr
    wav = np.random.RandomState(6).randn(int(audio_seconds * sr)).astype(np.float32) * 0.05
    scorer.push(wav[: int(12 * sr)])  # warm up / compile the window forward
    t0 = time.perf_counter()
    scorer.push(wav[int(12 * sr):])
    scorer.flush()
    dt = time.perf_counter() - t0
    n_hops = max(int((audio_seconds - 12) / hop_seconds), 1)
    return (audio_seconds - 12) / dt, dt / n_hops * 1000.0, hop_seconds


def measure_train(model, frontend, params, batch_size: int = 24, n_inner: int = 10,
                  n_samples: int = 320000, repeats: int = 3, cfg_overrides=None):
    """Full mean-teacher train step (frontend + aug + student fwd/bwd +
    teacher fwd + clip + AdamW + EMA) clips/s/chip, DCE-proof.

    Matches the hot loop of the reference's
    ``recipes/desed/finetune/train.py:129-213``. Returns
    (step_ms, clips_per_sec).

    Methodology: ONE jit call runs ``n_inner`` steps in a lax.scan and
    returns a scalar forced from the FINAL carry (so every step's
    backward + optimizer + EMA is live). Per-call host-side timing of
    repeated single-step dispatches was unusable under the axon tunnel
    (same code measured 0.64 s, 2.7 s and 42 s per step on different
    runs); the scan amortises dispatch to one round trip and matches
    exps/profile_train2.py's stable scan-10 figure. min over repeats
    rejects residual host noise.
    """
    import optax

    from transformer4sed_tpu.train.mean_teacher import (
        MeanTeacherConfig,
        create_mean_teacher_state,
        make_mean_teacher_step,
        make_multi_step,
    )

    dev = jax.devices()[0]
    s = w = batch_size // 3
    cfg = MeanTeacherConfig(
        strong_num=s, weak_num=w, unlabel_num=batch_size - 2 * s,
        **(cfg_overrides or {}),  # exps/profile_train3.py A/B variants
    )
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(1e-4))
    step = make_mean_teacher_step(
        lambda p, m, train, rngs, **kw: model.apply({"params": p}, m, train=train, rngs=rngs, **kw),
        frontend, opt, cfg,
    )
    multi = make_multi_step(step, n_inner)
    state = jax.device_put(create_mean_teacher_state(params, opt), dev)
    n_frames = model.decoder_pos_emd_len  # strong-label grid length
    wav = jnp.asarray(
        np.random.RandomState(1).randn(batch_size, n_samples).astype(np.float32) * 0.1)
    batches = {
        "wav": jax.device_put(jnp.broadcast_to(wav, (n_inner,) + wav.shape), dev),
        "labels": jax.device_put(
            jnp.zeros((n_inner, batch_size, model.class_num, n_frames)), dev),
    }
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    @jax.jit
    def forced(st, bts, k):
        final, metrics = multi(st, bts, k)
        return (metrics["loss_total"][-1] + _force_scalar(final.params)
                + _force_scalar(final.teacher_params)
                + _force_scalar(final.opt_state))

    float(forced(state, batches, key))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forced(state, batches, key))  # fence INSIDE the timed region
        best = min(best, time.perf_counter() - t0)
    dt = best / n_inner
    return dt * 1000.0, batch_size / dt


def main():
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    batch = 128  # measured: +2% over B=64, flat beyond
    n_samples = 320000  # 10 s @ 32 kHz

    model = PaSST_SED(
        class_num=10,
        embed_dim=768,
        decoder_dim=768,
        backbone_depth=12,
        backbone_num_heads=12,
        passt_feature_layer=10,
        decoder="transformerXL",
        decoder_layer_num=3,
        decoder_pos_emd_len=1000,
        at_adapter=True,
        use_flash=True,
        dtype=jnp.bfloat16,
    )
    frontend = PasstFrontend()

    wav = jnp.asarray(np.random.RandomState(0).randn(batch, n_samples).astype(np.float32))
    # init on CPU (the accelerator compile pipeline is reserved for the
    # benchmarked forward; init would be a second large compile)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mel = frontend.normalize(frontend(np.zeros((1, n_samples), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel)["params"]
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def forward(params, wav):
        mel = frontend.normalize(frontend(wav))
        out = model.apply({"params": params}, mel, temp_w=0.5)
        # reduce to a scalar so the timing fence below forces full execution
        # (block_until_ready is unreliable under the axon tunnel platform)
        return out.strong, out.weak, out.strong.sum()

    # compile + warmup (float() forces a real device sync)
    strong, weak, fence = forward(params, wav)
    float(fence)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        strong, weak, fence = forward(params, wav)
    float(fence)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt

    # frontend-only throughput (BASELINE.md north-star: mel-frames/sec) —
    # the PaSST wav -> log-mel MXU-DFT pipeline in isolation (the AST
    # Kaldi-fbank frontend is a separate kernel, models/ast.py)
    @jax.jit
    def frontend_only(wav):
        mel = frontend.normalize(frontend(wav))
        return mel, mel.sum()

    mel, fe_fence = frontend_only(wav)
    float(fe_fence)
    n_frames = int(mel.shape[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        mel, fe_fence = frontend_only(wav)
    float(fe_fence)
    fe_dt = time.perf_counter() - t0
    mel_frames_per_sec = batch * iters * n_frames / fe_dt
    baseline_clips_per_sec = 40.0
    fpc = flops_per_clip()
    peak = _peak_flops(jax.devices()[0])
    mfu = (fpc * clips_per_sec / peak) if peak else None

    # full mean-teacher TRAIN step (VERDICT r2 item 2: driver-visible
    # training throughput). Analytic train FLOPs/clip ~ 4x forward:
    # student fwd (1x) + bwd (2x) + teacher fwd (1x); optimizer/EMA are
    # bandwidth, not FLOPs. Skippable for quick runs: T4S_BENCH_SKIP_TRAIN=1.
    train_fields = {}
    if os.environ.get("T4S_BENCH_SKIP_TRAIN", "0") != "1":
        train_batch = 24
        train_ms, train_cps = measure_train(model, frontend, params, train_batch)
        train_mfu = (4.0 * fpc * train_cps / peak) if peak else None
        train_fields = {
            "train_clips_per_sec_per_chip": round(train_cps, 2),
            "train_step_ms": round(train_ms, 1),
            "train_batch": train_batch,
            "train_mfu": round(train_mfu, 4) if train_mfu is not None else None,
        }

    # AudioSet-strong supervised training flagship (HTSAT_CNN, 447 classes)
    # — the second driver-visible training metric (VERDICT r3 item 7).
    # Train FLOPs/clip = 3x forward (fwd + ~2x bwd; no teacher).
    if os.environ.get("T4S_BENCH_SKIP_AUDIOSET", "0") != "1":
        as_batch = 64
        as_ms, as_cps, t_dec = measure_audioset_train(as_batch)
        as_fpc = audioset_flops_per_clip(t_dec)
        as_mfu = (3.0 * as_fpc * as_cps / peak) if peak else None
        train_fields.update({
            "audioset_train_clips_per_sec_per_chip": round(as_cps, 2),
            "audioset_train_step_ms": round(as_ms, 1),
            "audioset_train_batch": as_batch,
            "audioset_flops_per_clip": as_fpc,
            "audioset_train_mfu": round(as_mfu, 4) if as_mfu is not None else None,
        })

    # Online streaming scorer (serving regime, B=1 windows): real-time
    # factor on one chip — the last measured flagship made driver-visible.
    if os.environ.get("T4S_BENCH_SKIP_STREAM", "0") != "1":
        rtf, ms_win, hop_s = measure_streaming(model, frontend, params)
        train_fields.update({
            "stream_rtf": round(rtf, 1),
            "stream_ms_per_window": round(ms_win, 1),
            "stream_hop_seconds": hop_s,
        })

    # DASM_HTSAT open-vocabulary scoring (447 queries) — the reference's
    # third published system (ACM MM 2025, detect_any_sound/) made
    # driver-visible (VERDICT r4 item 6).
    if os.environ.get("T4S_BENCH_SKIP_DASM", "0") != "1":
        dasm_batch = 64
        dasm_ms, dasm_cps, dasm_t, dasm_t_at = measure_dasm_ov(dasm_batch)
        dasm_fpc = dasm_flops_per_clip(dasm_t, dasm_t_at)
        dasm_mfu = (dasm_fpc * dasm_cps / peak) if peak else None
        train_fields.update({
            "dasm_ov_clips_per_sec_per_chip": round(dasm_cps, 2),
            "dasm_ov_forward_ms": round(dasm_ms, 1),
            "dasm_ov_batch": dasm_batch,
            "dasm_ov_flops_per_clip": dasm_fpc,
            "dasm_ov_mfu": round(dasm_mfu, 4) if dasm_mfu is not None else None,
        })

    print(
        json.dumps(
            {
                "metric": "matsed_desed_inference_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "10s_clips/sec/chip",
                "vs_baseline": round(clips_per_sec / baseline_clips_per_sec, 3),
                "baseline_kind": "estimated",
                "flops_per_clip": fpc,
                "mfu": round(mfu, 4) if mfu is not None else None,
                "mel_frames_per_sec": round(mel_frames_per_sec, 1),
                **train_fields,
                "device_kind": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
