"""AOT serving artifacts via ``jax.export``.

Production deployment path beyond the reference (whose serving story is
re-running a recipe ``test()`` stage with the full training codebase
installed): the complete wav -> median-filtered scores forward —
frontend, model, post filter, weights baked in as constants — is
lowered to StableHLO once and serialized to a single self-contained
file. A consumer deserializes and calls it WITHOUT the model code,
config, or checkpoint:

    from transformer4sed_tpu.recipes.export import load_exported
    exp, meta = load_exported("model.jaxexp")
    scores, weak = exp.call(wav, pad_mask)   # [B,T,C], [B,C]

Cross-platform: ``--platforms tpu cpu`` lowers one artifact for both
(jax.export multi-platform lowering); the default is the current
backend. Pallas kernels lower to backend-specific custom calls that are
not covered by jax.export's compatibility guarantees — exporting a
``use_flash=True`` model registers the corresponding
``DisabledSafetyCheck`` and is safe as long as the artifact runs on the
same libtpu generation (pin ``export.meta.json``'s jax version for
anything longer-lived; or export with flash disabled for a pure-StableHLO
artifact).

Usage:
  python -m transformer4sed_tpu.recipes.export \
      --config_dir config/mat-sed/finetune1.yaml --ckpt <orbax params> \
      --out model.jaxexp [--batch_size 64] [--platforms tpu cpu]

The sidecar ``<out>.meta.json`` carries everything needed to feed and
decode the artifact (class list, sample rate, clip length, batch size,
frame grid), so ``recipes.serve --exported model.jaxexp`` scores a
directory with no config at all.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_serving_forward(
    model,
    frontend,
    params,
    codec,
    batch_size: int = 64,
    median_filter=7,
    model_kwargs: Optional[dict] = None,
    model_state: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the serving forward (weights baked in) to StableHLO bytes.

    The exported callable has the exact signature of
    ``serve.InferenceEngine._forward`` minus the weight arguments:
    ``(wav [B, S] f32, pad_mask [B, T] bool) -> (scores [B, T, C], weak [B, C])``.
    """
    from jax import export as jexport

    from transformer4sed_tpu.core.filters import apply_class_filter

    model_kwargs = dict(model_kwargs or {})
    if isinstance(median_filter, list):
        median_filter = tuple(median_filter)
    params = jax.device_get(params)  # bake host copies in as constants
    model_state = jax.device_get(model_state) if model_state else None

    def forward(wav, pad_mask):
        mel = frontend.normalize(frontend(wav))
        variables = {"params": params, **(model_state or {})}
        out = model.apply(variables, mel, pad_mask=pad_mask, **model_kwargs)
        scores = jnp.transpose(out.strong, (0, 2, 1))  # [B, T, C]
        return apply_class_filter(scores, median_filter, kind="median"), out.weak

    n_samples = int(round(codec.audio_len * codec.sr))
    args = (
        jax.ShapeDtypeStruct((batch_size, n_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, codec.n_frames), jnp.bool_),
    )
    # Pallas kernels (use_flash / window attention) lower to
    # backend-specific custom calls outside jax.export's stability
    # guarantees; allow them explicitly (see module docstring for the
    # compatibility caveat)
    disabled = [
        jexport.DisabledSafetyCheck.custom_call(name)
        for name in ("tpu_custom_call", "mosaic_tpu", "triton_kernel_call")
    ]
    exp = jexport.export(
        jax.jit(forward),
        platforms=list(platforms) if platforms else None,
        disabled_checks=disabled,
    )(*args)
    return exp.serialize()


def write_artifact(path: str, blob: bytes, codec, batch_size: int, labels=None):
    """Write the serialized export plus the decode-side metadata sidecar."""
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "labels": list(labels if labels is not None else codec.labels),
        "sr": codec.sr,
        "audio_len": codec.audio_len,
        "n_samples": int(round(codec.audio_len * codec.sr)),
        "pred_len": codec.n_frames,
        "frame_len": codec.frame_len,
        "frame_hop": codec.frame_hop,
        "net_pooling": codec.net_pooling,
        "batch_size": batch_size,
        "jax_version": jax.__version__,
        "signature": "(wav [B,S] f32, pad_mask [B,T] bool) -> (scores [B,T,C], weak [B,C])",
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def codec_from_meta(meta: dict):
    """Rebuild the label codec from an artifact's sidecar (config-free
    serving)."""
    from transformer4sed_tpu.core.codec import LabelCodec

    codec = LabelCodec(
        labels=tuple(meta["labels"]),
        audio_len=meta["audio_len"],
        frame_len=meta["frame_len"],
        frame_hop=meta["frame_hop"],
        net_pooling=meta.get("net_pooling", 1),
        sr=meta["sr"],
    )
    if codec.n_frames != meta["pred_len"]:
        raise ValueError(
            f"artifact metadata inconsistent: derived n_frames {codec.n_frames} "
            f"!= stored pred_len {meta['pred_len']}"
        )
    return codec


def load_exported(path: str):
    """Deserialize an artifact -> (jax.export.Exported, metadata dict)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    meta_path = path + ".meta.json"
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return exp, meta


def main(argv=None):
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model
    from transformer4sed_tpu.utils.checkpoint import restore_params
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    parser = argparse.ArgumentParser(description="AOT-export the serving forward")
    parser.add_argument("--config_dir", required=True)
    parser.add_argument("--ckpt", required=True, help="orbax params dir or reference .pt")
    parser.add_argument("--out", required=True, help="output artifact path (.jaxexp)")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lora_ckpt", choices=("merged", "unmerged"), default=None,
                        help="merged-ness of a LoRA .pt checkpoint "
                        "(merged = published artifacts, the default)")
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering platforms, e.g. 'tpu cpu' (default: current backend)")
    args = parser.parse_args(argv)

    config = load_yaml_with_include(args.config_dir)
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    if args.ckpt.endswith(".pt"):
        from transformer4sed_tpu.utils.torch_import import (
            convert_torch_checkpoint,
            load_torch_state_dict,
        )

        model_name = config.get("model_name", "PaSST_SED")
        params, model_state = convert_torch_checkpoint(
            load_torch_state_dict(args.ckpt), model_name,
            init_kwargs=common.model_init_kwargs(config, model_name),
            lora_merged=common.lora_ckpt_merged(config, args.lora_ckpt),
        )
        model_state = model_state or None
    else:
        params = restore_params(args.ckpt)
        model_state = common.sibling_model_state(args.ckpt)
    model_name = config.get("model_name", "PaSST_SED")
    blob = export_serving_forward(
        model, frontend, params, codec,
        batch_size=args.batch_size,
        median_filter=common.median_filter_from_config(config, codec),
        model_kwargs=config.get(model_name, {}).get("test_kwargs", {}),
        model_state=model_state,
        platforms=args.platforms,
    )
    meta = write_artifact(args.out, blob, codec, args.batch_size)
    print(
        f"exported {len(blob) / 1e6:.1f} MB artifact to {args.out} "
        f"(platforms={args.platforms or ['current']}, batch={args.batch_size}, "
        f"classes={len(meta['labels'])})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
