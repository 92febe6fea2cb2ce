"""Streaming scorer latency on TPU: ms per window forward (B=1) and the
real-time factor at a given hop. Run: `python exps/profile_stream.py`."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from transformer4sed_tpu.core.codec import LabelCodec
    from transformer4sed_tpu.frontend import PasstFrontend
    from transformer4sed_tpu.models.passt_sed import PaSST_SED
    from transformer4sed_tpu.recipes.stream import StreamingScorer

    codec = LabelCodec(
        labels=tuple(f"c{i}" for i in range(10)), audio_len=10.0,
        frame_len=1024, frame_hop=320, sr=32000,
    )
    model = PaSST_SED(
        class_num=10, embed_dim=768, decoder_dim=768, backbone_depth=12,
        backbone_num_heads=12, passt_feature_layer=10, decoder="transformerXL",
        decoder_layer_num=3, decoder_pos_emd_len=1000, at_adapter=True,
        use_flash=True, dtype=jnp.bfloat16,
    )
    frontend = PasstFrontend()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mel = frontend.normalize(frontend(np.zeros((1, 320000), np.float32)))
        params = model.init({"params": jax.random.PRNGKey(0)}, mel)["params"]
    params = jax.device_put(params, jax.devices()[0])

    hop_s = 2.0
    scorer = StreamingScorer(
        model, frontend, params, codec, hop_seconds=hop_s,
        median_filter=7, model_kwargs={"temp_w": 0.5},
    )
    sr = codec.sr
    wav = np.random.RandomState(0).randn(int(60 * sr)).astype(np.float32) * 0.05

    # warm up (compile) with the first window
    _ = scorer.push(wav[: int(12 * sr)])
    t0 = time.perf_counter()
    n_before = scorer._cnt.sum() if scorer._cnt is not None else 0
    rows = scorer.push(wav[int(12 * sr):])
    rows += scorer.flush()
    dt = time.perf_counter() - t0
    # windows processed in the timed region
    n_windows = int((scorer._cnt.sum() - n_before) / scorer._frames_per_win)
    ms_per_window = dt / max(n_windows, 1) * 1000
    audio_seconds = 60 - 12
    rtf = audio_seconds / dt
    print(f"windows timed: {n_windows}, {ms_per_window:.1f} ms/window (B=1)")
    print(f"hop {hop_s}s stream: {rtf:.1f}x real-time on one chip")


if __name__ == "__main__":
    main()
