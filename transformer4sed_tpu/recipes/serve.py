"""Batch serving: score a directory of clips with a compile-once engine.

The reference's closest equivalent is re-running a recipe ``test()``
stage; this is the production path: one jitted forward reused across
fixed-size batches (ragged tails padded to keep a single compiled
shape), host I/O overlapped with device compute via
``parallel.device_prefetch``, per-clip score TSVs in the
sed_scores_eval layout plus an events JSONL.

Usage:
  python -m transformer4sed_tpu.recipes.serve \
      --config_dir config/mat-sed/finetune1.yaml --ckpt <orbax params> \
      --wav_dir /data/clips --out_dir scores/ [--batch_size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class InferenceEngine:
    """Compile-once batched scorer for fixed-length clips."""

    def __init__(self, model, frontend, params, codec, batch_size: int = 64,
                 median_filter=7, threshold: float = 0.5, model_kwargs=None,
                 model_state=None, data_parallel: bool = True):
        from transformer4sed_tpu.core.filters import apply_class_filter

        self.codec = codec
        self.batch_size = batch_size
        self.threshold = threshold
        model_kwargs = dict(model_kwargs or {})
        if isinstance(median_filter, list):
            median_filter = tuple(median_filter)

        # multi-chip serving hosts: shard the batch over a 1-D data mesh
        # (params replicated, XLA runs the forward SPMD — no collectives
        # needed since every clip is independent)
        n_dev = jax.device_count()
        if data_parallel and n_dev > 1 and batch_size % n_dev == 0:
            from transformer4sed_tpu.parallel import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            mesh = make_mesh()
            rep = replicated_sharding(mesh)
            self._batch_sharding = batch_sharding(mesh)
            self.params = jax.device_put(params, rep)
            self.model_state = jax.device_put(model_state, rep) if model_state else None
        else:
            self._batch_sharding = None
            self.params = jax.device_put(params, jax.devices()[0])
            # non-params collections (HTSAT bn0 BatchNorm running stats)
            self.model_state = (
                jax.device_put(model_state, jax.devices()[0]) if model_state else None
            )

        @jax.jit
        def forward(params, model_state, wav, pad_mask):
            mel = frontend.normalize(frontend(wav))
            variables = {"params": params, **(model_state or {})}
            out = model.apply(variables, mel, pad_mask=pad_mask, **model_kwargs)
            scores = jnp.transpose(out.strong, (0, 2, 1))  # [B, T, C]
            return apply_class_filter(scores, median_filter, kind="median"), out.weak

        self._forward = forward

    @classmethod
    def from_exported(cls, path: str, threshold: float = 0.5):
        """Serve a ``recipes.export`` artifact: no model code, config or
        checkpoint needed — the weights are constants inside the
        deserialized StableHLO program and the sidecar metadata rebuilds
        the codec/batch geometry."""
        from transformer4sed_tpu.recipes.export import codec_from_meta, load_exported

        exp, meta = load_exported(path)
        if meta is None:
            raise ValueError(f"missing sidecar {path}.meta.json next to the artifact")
        self = cls.__new__(cls)
        self.codec = codec_from_meta(meta)
        self.batch_size = int(meta["batch_size"])
        self.threshold = threshold
        self._batch_sharding = None
        self.params = None
        self.model_state = None
        self._forward = lambda params, model_state, wav, pm: exp.call(wav, pm)
        return self

    def score_batches(self, batches):
        """Iterate (filenames, scores [B,T,C], weak [B,C]) over host batches
        of dicts with 'wav' [B, S], 'pad_mask' [B, T], 'filename'."""
        import collections
        import itertools

        # H2D transfer lookahead: jnp.asarray dispatches the copy
        # asynchronously, so enqueueing 2 batches ahead rides the copy
        # under the previous batch's compute (strings stay host-side).
        # Ragged tails are padded HERE so sharded put sees full batches.
        def put(batch):
            wav = np.asarray(batch["wav"])
            pm = np.asarray(batch["pad_mask"])
            n = len(batch["filename"])
            if n < self.batch_size:  # pad ragged tail: keep ONE compiled shape
                reps = self.batch_size - n
                wav = np.concatenate([wav, np.zeros((reps,) + wav.shape[1:], wav.dtype)])
                pm = np.concatenate([pm, np.ones((reps,) + pm.shape[1:], pm.dtype)])
            if self._batch_sharding is not None:
                return (
                    batch["filename"],
                    jax.device_put(wav, self._batch_sharding),
                    jax.device_put(pm, self._batch_sharding),
                )
            return batch["filename"], jnp.asarray(wav), jnp.asarray(pm)

        it = iter(batches)
        queue = collections.deque(put(b) for b in itertools.islice(it, 2))

        def staged():
            while queue:
                yield queue.popleft()
                try:
                    queue.append(put(next(it)))
                except StopIteration:
                    pass

        pending = []
        for names, wav, pm in staged():
            n = len(names)
            scores, weak = self._forward(self.params, self.model_state, wav, pm)
            # async dispatch: yield the PREVIOUS batch's (already ready)
            # results while this one computes
            pending.append((names, scores[:n], weak[:n]))
            if len(pending) > 1:
                names, s, w = pending.pop(0)
                yield names, np.asarray(s), np.asarray(w)
        for names, s, w in pending:
            yield names, np.asarray(s), np.asarray(w)


def main(argv=None):
    from transformer4sed_tpu.data import DataLoader, UnlabeledDataset
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model
    from transformer4sed_tpu.utils.checkpoint import restore_params
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    parser = argparse.ArgumentParser(description="batch SED scoring")
    parser.add_argument("--config_dir", default=None)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--exported", default=None,
                        help="recipes.export artifact (.jaxexp): serve without "
                             "config/checkpoint; weights and geometry come from "
                             "the artifact + its .meta.json sidecar")
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--lora_ckpt", choices=("merged", "unmerged"), default=None,
                        help="merged-ness of a LoRA .pt checkpoint "
                        "(merged = published artifacts, the default)")
    parser.add_argument("--query", default=None,
                        help=".npy of external query embeddings (open-vocab DASM)")
    parser.add_argument("--query_type", default="text", choices=["text", "audio"])
    parser.add_argument("--query_names", default=None,
                        help="text file, one event name per query row; becomes the output class list")
    args = parser.parse_args(argv)

    if args.exported:
        if args.query or args.query_names:
            parser.error("--exported artifacts have their query baked in at export "
                         "time; --query/--query_names only apply to --config_dir serving")
        if args.config_dir or args.ckpt:
            parser.error("pass either --exported or --config_dir/--ckpt, not both")
        engine = InferenceEngine.from_exported(args.exported, threshold=args.threshold)
        return _run_engine(engine, engine.codec, args,
                           num_workers=4, batch_size=engine.batch_size)
    if not args.config_dir or not args.ckpt:
        parser.error("--config_dir and --ckpt are required unless --exported is given")

    config = load_yaml_with_include(args.config_dir)
    labels = None
    if args.query_names:
        with open(args.query_names) as f:
            labels = [ln.strip() for ln in f if ln.strip()]
    codec = common.codec_from_config(config, labels=labels)
    query = None
    if args.query:
        # open-vocab serving: the notebook's text/audio query flow
        # (SURVEY.md §3.5) batched — queries are fixed per run, so they
        # compile into the engine's single jitted forward. Validate row
        # counts up front, before the expensive model build.
        query = jnp.asarray(np.load(args.query))
        if labels is not None and len(labels) != query.shape[0]:
            parser.error(
                f"--query_names lists {len(labels)} names but --query has "
                f"{query.shape[0]} rows; they must match one-to-one"
            )
        if labels is None and query.shape[0] != len(codec.labels):
            parser.error(
                f"--query has {query.shape[0]} rows but the config's class "
                f"list has {len(codec.labels)}; pass --query_names with one "
                f"event name per query row to define the output classes"
            )
    model, frontend = build_model(config)
    if args.ckpt.endswith(".pt"):
        # reference torch checkpoints serve directly (converted by family)
        from transformer4sed_tpu.utils.torch_import import (
            convert_torch_checkpoint,
            load_torch_state_dict,
        )

        _mname = config.get("model_name", "PaSST_SED")
        params, model_state = convert_torch_checkpoint(
            load_torch_state_dict(args.ckpt), _mname,
            init_kwargs=common.model_init_kwargs(config, _mname),
            lora_merged=common.lora_ckpt_merged(
                config, getattr(args, "lora_ckpt", None)),
        )
        model_state = model_state or None
    else:
        params = restore_params(args.ckpt)
        model_state = common.sibling_model_state(args.ckpt)
    model_name = config.get("model_name", "PaSST_SED")
    model_kwargs = dict(config.get(model_name, {}).get("test_kwargs", {}))
    if query is not None:
        model_kwargs["query"] = query
        model_kwargs["query_type"] = args.query_type
    engine = InferenceEngine(
        model, frontend, params, codec, batch_size=args.batch_size,
        median_filter=common.median_filter_from_config(config, codec),
        threshold=args.threshold,
        model_kwargs=model_kwargs,
        model_state=model_state,
    )
    return _run_engine(
        engine, codec, args,
        num_workers=config.get("generals", {}).get("num_workers", 4),
        batch_size=args.batch_size,
    )


def _run_engine(engine, codec, args, num_workers: int, batch_size: int):
    """Score --wav_dir with a built engine: per-clip score TSVs + events.jsonl."""
    from transformer4sed_tpu.data import DataLoader, UnlabeledDataset

    ds = UnlabeledDataset(args.wav_dir, True, codec)
    loader = DataLoader(ds, batch_size=batch_size, drop_last=False,
                        num_workers=num_workers)
    os.makedirs(args.out_dir, exist_ok=True)
    t_frames = None
    n_clips = 0
    t0 = time.perf_counter()
    with open(os.path.join(args.out_dir, "events.jsonl"), "w") as events_f:
        for names, scores, weak in engine.score_batches(iter(loader)):
            for i, name in enumerate(names):
                stem = os.path.splitext(name)[0]
                t_frames = scores.shape[1]
                ts = np.linspace(0.0, codec.audio_len, t_frames + 1)
                header = "onset\toffset\t" + "\t".join(codec.labels)
                rows = np.concatenate(
                    [ts[:-1, None], ts[1:, None], scores[i]], axis=1
                )
                np.savetxt(os.path.join(args.out_dir, f"{stem}.tsv"), rows,
                           delimiter="\t", header=header, comments="")
                binary = (scores[i] > args.threshold).astype(np.float32)
                events = [
                    {"event": label, "onset": onset, "offset": offset}
                    for label, onset, offset in codec.decode_strong(binary)
                ]
                events_f.write(json.dumps({"filename": name, "events": events}) + "\n")
                n_clips += 1
    dt = time.perf_counter() - t0
    print(f"scored {n_clips} clips in {dt:.1f}s ({n_clips / max(dt, 1e-9):.1f} clips/s)")


if __name__ == "__main__":
    main()
