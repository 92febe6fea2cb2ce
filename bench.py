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
per chip and scale linearly.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED

    batch = 64
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
    baseline_clips_per_sec = 40.0
    print(
        json.dumps(
            {
                "metric": "matsed_desed_inference_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "10s_clips/sec/chip",
                "vs_baseline": round(clips_per_sec / baseline_clips_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
