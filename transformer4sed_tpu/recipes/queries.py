"""Query-bank tooling for DASM's text and audio modalities.

Audio queries: per-class prototypes as the label-weighted mean of HTSAT
fine-grained frame embeddings over strongly-labelled data
(reference ``recipes/audioset_strong/detect_any_sound/queries_extract/
extract_audio_queries.py:38-106``). The per-class Python loop there
becomes one masked matmul per batch: ``sums += labels @ embeddings``.

Text queries: the reference embeds ``'sound of ' + label`` with an
MGA-CLAP text encoder at notebook runtime (``detect_any_sound.ipynb``
cells 3/11, ``docs/DASM/readme.md:37-41``). MGA-CLAP cannot ship in a
zero-egress image, so this module provides the production equivalent:

  * :func:`build_text_query_bank` assembles the [C, D] query tensor
    from a label list plus a precomputed embedding table, in config
    class order;
  * a pluggable text-encoder interface (``--text_encoder pkg.module:fn``,
    fn: list[str] -> [N, D]) fills labels missing from the table — the
    plug-point where an MGA-CLAP/CLAP wrapper slots in;
  * ``python -m transformer4sed_tpu.recipes.queries build_text|extract_audio``
    drives both flows from the command line (docs/dasm/queries.md).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Iterable, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def extract_audio_queries(
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterable,
    n_classes: int,
    embed_dim: int,
    frame_labels_key: str = "label",
    cap_classes: Sequence[int] = (),
    cap_threshold: int = 0,
) -> np.ndarray:
    """Accumulate per-class mean frame embeddings.

    Args:
      embed_fn: maps a wav batch [B, S] (or mel) to frame embeddings
        [B, T', D].
      batches: dicts with 'wav' and frame labels [B, C, T_lab]; labels are
        max-pooled/resampled to T' inside.
      cap_classes / cap_threshold: the reference caps over-represented
        classes (``exp_event_set``) once their frame count passes the
        threshold; same semantics here.

    Returns [C, D] query matrix (zero rows for classes never observed).
    """
    sums = np.zeros((n_classes, embed_dim), np.float64)
    counts = np.zeros((n_classes,), np.int64)
    cap = set(int(c) for c in cap_classes)

    @jax.jit
    def batch_stats(emb, labels):
        # emb [B, T', D]; labels [B, C, T_lab] -> align label grid to T'
        t_emb = emb.shape[1]
        t_lab = labels.shape[-1]
        idx = jnp.clip((jnp.arange(t_emb) * t_lab) // t_emb, 0, t_lab - 1)
        lab = jnp.take(labels, idx, axis=2)  # [B, C, T']
        lab = (lab > 0.5).astype(jnp.float32)
        s = jnp.einsum("bct,btd->cd", lab, emb)
        n = jnp.sum(lab, axis=(0, 2))
        return s, n

    for batch in batches:
        emb = embed_fn(jnp.asarray(batch["wav"]))
        s, n = batch_stats(emb, jnp.asarray(batch[frame_labels_key]))
        s, n = np.asarray(s, np.float64), np.asarray(n, np.int64)
        for c in range(n_classes):
            if c in cap and counts[c] > cap_threshold:
                continue
            sums[c] += s[c]
            counts[c] += n[c]

    means = np.zeros_like(sums, dtype=np.float32)
    nonzero = counts > 0
    means[nonzero] = (sums[nonzero] / counts[nonzero, None]).astype(np.float32)
    return means


def load_labels(path: str) -> Tuple[str, ...]:
    """Class list from a labeldict json ({label: index}), a json list, or
    a text file with one label per line."""
    if path.endswith(".json"):
        with open(path) as f:
            obj = json.load(f)
        if isinstance(obj, dict):
            # same ordering semantics as training-side label dicts
            from transformer4sed_tpu.recipes.audioset_strong import load_label_dict

            return load_label_dict(path)
        return tuple(obj)
    with open(path) as f:
        return tuple(ln.strip() for ln in f if ln.strip())


def load_embedding_table(
    emb_path: str, names_path: Optional[str] = None
) -> Tuple[Sequence[str], np.ndarray]:
    """(names, embeddings [N, D]) from an .npz ('names' + 'embeddings'
    arrays) or an .npy matrix plus a names text file."""
    if emb_path.endswith(".npz"):
        with np.load(emb_path, allow_pickle=False) as z:
            if "names" not in z or "embeddings" not in z:
                raise ValueError(
                    f"{emb_path}: .npz table needs 'names' and 'embeddings' arrays"
                )
            return [str(n) for n in z["names"]], np.asarray(z["embeddings"])
    emb = np.load(emb_path)
    if names_path is None:
        raise ValueError(
            f"{emb_path}: .npy embedding matrix needs --embedding_names "
            f"(one name per row)"
        )
    with open(names_path) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    if len(names) != emb.shape[0]:
        raise ValueError(
            f"--embedding_names lists {len(names)} names but the table has "
            f"{emb.shape[0]} rows"
        )
    return names, emb


def load_text_encoder(spec: str) -> Callable[[Sequence[str]], np.ndarray]:
    """Resolve the text-encoder plug-point ``pkg.module:fn``.

    The callable maps a list of prompt strings to an [N, D] embedding
    matrix — wrap MGA-CLAP (``clap.msc(clap.encode_text(...))``), LAION
    CLAP, or any other encoder behind this signature.
    """
    import importlib

    mod_name, _, attr = spec.partition(":")
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, attr or "encode_text")
    if not callable(fn):
        raise TypeError(f"{spec} resolved to non-callable {fn!r}")
    return fn


def build_text_query_bank(
    labels: Sequence[str],
    table_names: Sequence[str],
    table_embeddings: np.ndarray,
    prompt: str = "sound of ",
    text_encoder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    normalize: bool = False,
) -> np.ndarray:
    """[C, D] query tensor in ``labels`` order from an embedding table.

    Lookup tries ``prompt + label`` first, then the bare label (tables
    may store either convention). Labels absent from the table go to
    ``text_encoder`` (prompted, matching the notebook's
    ``'sound of ' + query``); without an encoder, missing labels raise.
    """
    index = {str(n): i for i, n in enumerate(table_names)}
    emb = np.asarray(table_embeddings, np.float32)
    rows: list = [None] * len(labels)
    missing: list = []
    for li, lab in enumerate(labels):
        for cand in (prompt + lab, lab):
            if cand in index:
                rows[li] = emb[index[cand]]
                break
        else:
            missing.append(li)
    if missing:
        if text_encoder is None:
            names = [labels[li] for li in missing[:5]]
            raise ValueError(
                f"{len(missing)} labels missing from the embedding table "
                f"(first: {names}); pass --text_encoder pkg.module:fn to "
                f"embed them, or extend the table"
            )
        encoded = np.asarray(
            text_encoder([prompt + labels[li] for li in missing]), np.float32
        )
        if encoded.shape[0] != len(missing):
            raise ValueError(
                f"text encoder returned {encoded.shape[0]} rows for "
                f"{len(missing)} labels"
            )
        for k, li in enumerate(missing):
            rows[li] = encoded[k]
    bank = np.stack(rows).astype(np.float32)
    if normalize:
        bank = bank / np.maximum(np.linalg.norm(bank, axis=1, keepdims=True), 1e-12)
    return bank


def _cmd_build_text(args) -> int:
    labels = load_labels(args.labels)
    names, emb = load_embedding_table(args.embeddings, args.embedding_names)
    encoder = load_text_encoder(args.text_encoder) if args.text_encoder else None
    bank = build_text_query_bank(
        labels, names, emb, prompt=args.prompt, text_encoder=encoder,
        normalize=args.normalize,
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    np.save(args.out, bank)
    names_out = os.path.splitext(args.out)[0] + "_names.txt"
    with open(names_out, "w") as f:
        f.write("\n".join(labels) + "\n")
    print(
        f"wrote {bank.shape[0]}x{bank.shape[1]} query bank to {args.out} "
        f"(names: {names_out})"
    )
    return 0


def _cmd_extract_audio(args) -> int:
    import pandas as pd

    from transformer4sed_tpu.data import DataLoader, StronglyLabeledDataset
    from transformer4sed_tpu.recipes import common
    from transformer4sed_tpu.recipes.cli import build_model
    from transformer4sed_tpu.utils.checkpoint import restore_params
    from transformer4sed_tpu.utils.config import load_yaml_with_include

    config = load_yaml_with_include(args.config_dir)
    label_dict = common.resolve_meta_path(
        args.labels or config.get("dataset", {}).get("label_dict")
    )
    if label_dict:
        config.setdefault("dataset", {})["labels"] = list(load_labels(label_dict))
    codec = common.codec_from_config(config)
    model, frontend = build_model(config)
    params = restore_params(args.ckpt)
    model_state = common.sibling_model_state(args.ckpt)

    @jax.jit
    def _embed(params, model_state, wav):
        mel = frontend.normalize(frontend(wav))
        variables = {"params": params, **(model_state or {})}
        out = model.apply(
            variables, mel, method=lambda m, x: m.backbone(x, train=False)
        )
        return out["fine_grained_embedding"]

    def embed_fn(wav):
        return _embed(params, model_state, wav)

    probe_wav = jnp.zeros((1, int(codec.audio_len * codec.sr)), jnp.float32)
    try:
        probe = embed_fn(probe_wav)
    except (AttributeError, KeyError, TypeError) as e:
        # submodules only exist on bound modules, so capability is probed
        # by applying, not hasattr
        raise SystemExit(
            f"{type(model).__name__} does not expose a backbone with "
            f"fine_grained_embedding; audio-query extraction needs an "
            f"HTSAT-family model ({e})"
        )

    ds = StronglyLabeledDataset(
        pd.read_csv(args.tsv, sep="\t"), args.wav_dir, False, codec
    )
    loader = DataLoader(ds, batch_size=args.batch_size, drop_last=False,
                        num_workers=args.num_workers)
    cap_classes = [int(c) for c in args.cap_classes.split(",") if c] if args.cap_classes else ()
    bank = extract_audio_queries(
        embed_fn, iter(loader), codec.n_classes, int(probe.shape[-1]),
        cap_classes=cap_classes, cap_threshold=args.cap_threshold,
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    np.save(args.out, bank)
    print(f"wrote {bank.shape[0]}x{bank.shape[1]} audio query bank to {args.out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="DASM query-bank tooling (docs/dasm/queries.md)"
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser(
        "build_text",
        help="assemble a [C, D] text query bank from labels + an embedding table",
    )
    p.add_argument("--labels", required=True,
                   help="labeldict json / json list / txt, defines class order")
    p.add_argument("--embeddings", required=True,
                   help=".npz with names+embeddings, or .npy matrix")
    p.add_argument("--embedding_names", default=None,
                   help="names txt for an .npy matrix (one per row)")
    p.add_argument("--out", required=True, help="output .npy path")
    p.add_argument("--prompt", default="sound of ",
                   help="prompt prefix tried for table lookup and encoding")
    p.add_argument("--normalize", action="store_true", help="L2-normalise rows")
    p.add_argument("--text_encoder", default=None,
                   help="pkg.module:fn plug-point for labels missing from the table")
    p.set_defaults(fn=_cmd_build_text)

    p = sub.add_parser(
        "extract_audio",
        help="per-class audio prototypes from HTSAT fine-grained embeddings",
    )
    p.add_argument("--config_dir", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--tsv", required=True, help="strong-label tsv (filename/onset/offset/event_label)")
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--labels", default=None,
                   help="labeldict json (defaults to dataset.label_dict from config)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--cap_classes", default=None,
                   help="comma-separated class indices capped once their frame "
                        "count passes --cap_threshold (reference exp_event_set)")
    p.add_argument("--cap_threshold", type=int, default=0)
    p.set_defaults(fn=_cmd_extract_audio)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
