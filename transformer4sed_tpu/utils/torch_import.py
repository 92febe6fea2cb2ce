"""Import published torch checkpoints into flax params — every family.

The reference loads ``passt-s-f128-p16-s10-ap.476-swa.pt`` into its
timm-style PaSST (``src/models/passt/passt_sed.py:108-115``) and hands
checkpoints between stages with ``strict=False``. This module maps
those torch state_dicts onto this repo's flax trees for the whole zoo:
PaSST backbone / PaSST_SED (XL or conformer decoder) / PaSST_CNN
(incl. FDY dynamic convs) / DASM / DASM_HTSAT / HTSAT / HTSAT_CNN /
CLAP_SED / AST — :func:`convert_torch_checkpoint` dispatches by model
name (what makes ``--pretrained_ckpt foo.pt`` / serve ``--ckpt foo.pt``
accept reference checkpoints directly), with layer counts auto-detected
from the key set. Numerical fidelity is pinned by
``tests/test_torch_parity.py`` (PARITY.md "Numerical parity evidence").

Core naming conventions:

  torch key                         -> flax path
  patch_embed.proj.weight [O,1,H,W] -> patch_embed/proj/kernel [H,W,1,O]
  blocks.{i}.attn.qkv.weight        -> blocks_{i}/attn/qkv/kernel (T)
  blocks.{i}.mlp.fc1.weight         -> blocks_{i}/mlp/fc1/kernel (T)
  norm.weight/bias                  -> norm/scale,bias
  cls_token, dist_token, new_pos_embed, freq/time_new_pos_embed: as-is

For MAT-SED (PaSST_SED) checkpoints: ``backbone.*`` via the above,
``out_norm``, XL decoder blocks (in_proj/out_proj/linear_pos/
pos_bias_u/v + timm-Block mlp), ``classifier``, AT adapter (torch
nn.MultiheadAttention packed qkv -> flax MultiHeadDotProductAttention
split heads), ``mask_token``/``mlm_mlp``.

Use :func:`load_torch_state_dict` to read a ``.pt`` file and the
``convert_*`` functions to produce param trees; combine with
``utils.checkpoint.load_partial`` for the reference's strict=False
stage hand-offs. Reading works with or without torch installed:
:func:`read_pt_file` parses the zip-of-pickled-storages checkpoint
format directly (a restricted unpickler that only admits tensor
reconstruction — the same safety posture as ``weights_only=True``),
so checkpoint import is exercisable on torch-less hosts and in CI.
"""

from __future__ import annotations

import pickle
import re
import zipfile
from typing import Dict, Mapping, Optional, Tuple

import flax
import numpy as np

# Storage class name -> numpy dtype (bfloat16 via ml_dtypes, which jax ships).
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


def _bfloat16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """Lazy handle to one storage blob inside the checkpoint zip."""

    __slots__ = ("dtype", "key")

    def __init__(self, dtype, key):
        self.dtype, self.key = dtype, key


class _DtypeMarker:
    """Stand-in for a torch storage class picked up by find_class."""

    __slots__ = ("dtype",)

    def __init__(self, dtype):
        self.dtype = dtype


def _rebuild_tensor_factory(read_storage):
    def _rebuild_tensor_v2(
        storage, storage_offset, size, stride, requires_grad=False,
        backward_hooks=None, metadata=None,
    ):
        buf = read_storage(storage)
        itemsize = storage.dtype.itemsize
        arr = np.frombuffer(buf, dtype=storage.dtype)
        if not size:
            return arr[storage_offset].copy()
        strides = tuple(s * itemsize for s in stride)
        view = np.lib.stride_tricks.as_strided(
            arr[storage_offset:], shape=tuple(size), strides=strides
        )
        return view.copy()

    return _rebuild_tensor_v2


class _TensorUnpickler(pickle.Unpickler):
    """Restricted unpickler for torch checkpoint ``data.pkl`` streams.

    Only tensor-reconstruction machinery is admitted (the
    ``weights_only=True`` posture); anything else raises. Tensors come
    back as numpy arrays.
    """

    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2", "_rebuild_tensor",
        ):
            return _rebuild_tensor_factory(self._read_storage)
        if module == "torch._utils" and name == "_rebuild_parameter":
            return lambda data, requires_grad=False, backward_hooks=None: data
        if module == "torch" and name in _STORAGE_DTYPES:
            return _DtypeMarker(_STORAGE_DTYPES[name])
        if module == "torch" and name == "BFloat16Storage":
            return _DtypeMarker(_bfloat16_dtype())
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (tensor-only reader)"
        )

    def persistent_load(self, pid):
        # ('storage', storage_class, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        marker, key = pid[1], pid[2]
        if not isinstance(marker, _DtypeMarker):
            raise pickle.UnpicklingError(f"unsupported storage type {marker!r}")
        return _StorageRef(marker.dtype, str(key))


def read_pt_file(path: str):
    """Parse a torch zip-format checkpoint without torch.

    Returns whatever object was saved (typically an OrderedDict of
    numpy arrays). Matches ``torch.save``'s default (zip) format from
    torch>=1.6: ``<name>/data.pkl`` holds the pickle stream whose
    tensors reference raw little-endian storage blobs at
    ``<name>/data/<key>``.
    """
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    try:
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    except StopIteration:
        raise ValueError(
            f"{path}: no data.pkl member — not a torch zip checkpoint "
            f"(legacy pre-1.6 format is not supported; resave with torch.save)"
        )
    prefix = pkl_name[: -len("data.pkl")]

    def read_storage(ref: _StorageRef) -> bytes:
        return zf.read(f"{prefix}data/{ref.key}")

    with zf.open(pkl_name) as f:
        return _TensorUnpickler(f, read_storage).load()


def load_torch_state_dict(path: str, use_torch: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Read a ``.pt`` state_dict as {key: numpy array}.

    Uses torch when importable (battle-tested reader, handles legacy
    formats), otherwise falls back to :func:`read_pt_file`; pass
    ``use_torch=False`` to force the native reader.
    """
    if use_torch is None:
        try:
            import torch  # noqa: F401

            use_torch = True
        except ImportError:
            use_torch = False
    if use_torch:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    else:
        sd = read_pt_file(path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    def to_np(v):
        if not hasattr(v, "numpy"):
            return np.asarray(v)
        try:
            return v.numpy()
        except TypeError:
            # torch refuses .numpy() on bfloat16 — round-trip via float32
            # into the same ml_dtypes.bfloat16 the native reader emits
            return v.float().numpy().astype(_bfloat16_dtype())

    return {k: to_np(v) for k, v in sd.items()}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix, lora=False, lora_alpha=1.0, lora_merged=True):
    out = {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}
    if lora and f"{prefix}.lora_A" in sd:
        # LoRA weights (src/models/lora/layers.py:106-110: lora_A [r, in],
        # lora_B [out, r]) -> flax LoRADense [in, r]/[r, out]. Only when the
        # TARGET model uses LoRA (lora_rank>0); a dense target ignores the
        # lora keys and keeps the merged weight (the reference's own
        # strict=False load-into-plain-PaSST convention, pmam/main.py:202).
        #
        # A loralib state_dict does NOT record whether its weight has the
        # (alpha/r)·A@B delta merged in, so merged-ness is an EXPLICIT
        # caller policy (``lora_merged``), not a guess. Both conventions
        # exist in the reference:
        #   * MERGED (default): published artifacts — the best-model save
        #     `net.eval()`s "to merge lora weight to the pretrain weight"
        #     (pmam/main.py:202-205) before state_dict. Our LoRADense
        #     always re-adds (alpha/r)·x@A@B at runtime, so the delta must
        #     be SUBTRACTED from the kernel here (loralib's train()-entry
        #     unmerge) or the adapter would be counted twice.
        #   * UNMERGED: mid-training state dicts — BestModels deep-copies
        #     `state_dict()` while the net is in train() mode
        #     (src/utils/log.py:47-89, src/models/lora/layers.py:124-141),
        #     i.e. the kernel is the raw pretrain weight. Keep it as-is.
        a = sd[f"{prefix}.lora_A"].T  # [in, r]
        b = sd[f"{prefix}.lora_B"].T  # [r, out]
        if lora_merged:
            scale = lora_alpha / a.shape[1]
            delta = (a.astype(np.float32) @ b.astype(np.float32)) * scale
            out["kernel"] = (out["kernel"].astype(np.float32) - delta).astype(
                out["kernel"].dtype
            )
        out["lora_A"] = a
        out["lora_B"] = b
    return out


def _dense_nobias(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T}


def _vit_block(sd, prefix, lora=False, lora_alpha=1.0, lora_merged=True):
    lk = dict(lora=lora, lora_alpha=lora_alpha, lora_merged=lora_merged)
    # timm Block defaults to qkv_bias=False (e.g. the AST frequency /
    # decoder blocks, ast_models.py:449/:464) -> no qkv.bias key
    qkv = (
        _dense(sd, f"{prefix}.attn.qkv", **lk)
        if f"{prefix}.attn.qkv.bias" in sd
        else _dense_nobias(sd, f"{prefix}.attn.qkv")
    )
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": qkv,
            "proj": _dense(sd, f"{prefix}.attn.proj", **lk),
        },
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _dense(sd, f"{prefix}.mlp.fc1", **lk),
            "fc2": _dense(sd, f"{prefix}.mlp.fc2", **lk),
        },
    }


def convert_passt_backbone(
    sd: Mapping[str, np.ndarray],
    depth: Optional[int] = None,
    lora: bool = False,
    lora_alpha: float = 1.0,
    lora_merged: bool = True,
) -> Dict:
    """torch PaSST state_dict -> flax PaSST param tree.

    ``depth`` defaults to the number of ``blocks.{i}`` present.
    ``lora=True`` (target model has lora_rank>0) also maps lora_A/lora_B
    adapters (passt_lora qkv/proj/fc1/fc2); ``lora_alpha`` is the
    reference ``lora_config.lora_alpha`` (1 in every shipped config).
    ``lora_merged`` states whether the checkpoint's kernels carry the
    merged adapter delta (see :func:`_dense` — published reference
    artifacts: True; mid-training BestModels dicts: False)."""
    if depth is None:
        depth = 0
        while f"blocks.{depth}.norm1.weight" in sd:
            depth += 1
    params: Dict = {
        "patch_embed": {
            "proj": {
                # [O, I, H, W] -> [H, W, I, O]
                "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
                "bias": sd["patch_embed.proj.bias"],
            }
        },
        "cls_token": sd["cls_token"],
        "new_pos_embed": sd["new_pos_embed"],
        "freq_new_pos_embed": sd["freq_new_pos_embed"],
        "time_new_pos_embed": sd["time_new_pos_embed"],
        "norm": _ln(sd, "norm"),
    }
    if "dist_token" in sd:
        params["dist_token"] = sd["dist_token"]
    for i in range(depth):
        params[f"blocks_{i}"] = _vit_block(
            sd, f"blocks.{i}", lora=lora, lora_alpha=lora_alpha, lora_merged=lora_merged
        )
    return params


def _torch_mha_to_flax(sd, prefix, num_heads: int) -> Dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{prefix}.in_proj_weight"]  # [3D, D]
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    hd = d // num_heads
    wq, wk, wv = np.split(w, 3, axis=0)
    bq, bk, bv = np.split(b, 3, axis=0)

    def split_heads(wx, bx):
        return {
            "kernel": wx.T.reshape(d, num_heads, hd),
            "bias": bx.reshape(num_heads, hd),
        }

    return {
        "query": split_heads(wq, bq),
        "key": split_heads(wk, bk),
        "value": split_heads(wv, bv),
        "out": {
            "kernel": sd[f"{prefix}.out_proj.weight"].T.reshape(num_heads, hd, d),
            "bias": sd[f"{prefix}.out_proj.bias"],
        },
    }


def _xl_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "in_proj": _dense(sd, f"{prefix}.attn.in_proj"),
            "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
            "linear_pos": _dense_nobias(sd, f"{prefix}.attn.linear_pos"),
            "pos_bias_u": sd[f"{prefix}.attn.pos_bias_u"],
            "pos_bias_v": sd[f"{prefix}.attn.pos_bias_v"],
        },
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _dense(sd, f"{prefix}.mlp.fc1"),
            "fc2": _dense(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_passt_sed(
    sd: Mapping[str, np.ndarray],
    backbone_depth: Optional[int] = None,
    decoder_layer_num: Optional[int] = None,
    at_adapter_heads: int = 12,
    f_pool_heads: int = 6,
    lora_rank: int = 0,
    lora_alpha: float = 1.0,
    lora_merged: bool = True,
) -> Dict:
    """torch PaSST_SED state_dict -> flax PaSST_SED param tree.

    Handles the MAT-SED configuration (XL decoder, AT adapter, optional
    MLM head). mel_trans buffers (window, preemphasis) are frontend
    constants here and are skipped. ``lora_merged`` is the explicit
    checkpoint merged-ness policy (:func:`_dense`).
    """
    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    params: Dict = {
        "backbone": convert_passt_backbone(backbone_sd, depth=backbone_depth,
                                           lora=lora_rank > 0, lora_alpha=lora_alpha,
                                           lora_merged=lora_merged),
        "out_norm": _ln(sd, "out_norm"),
    }
    if "classifier.weight" in sd:
        params["classifier"] = _dense(sd, "classifier")
    i = 0
    while (decoder_layer_num is None or i < decoder_layer_num) and (
        f"decoder.encoder_blocks.{i}.norm1.weight" in sd
    ):
        params.setdefault("decoder_module", {})[f"encoder_blocks_{i}"] = _xl_block(
            sd, f"decoder.encoder_blocks.{i}"
        )
        i += 1
    i = 0
    while (decoder_layer_num is None or i < decoder_layer_num) and (
        f"decoder.blocks.{i}.norm_final.weight" in sd
    ):
        # conformer decoder variant (reference transformer_decoder.py:125-166)
        params.setdefault("decoder_module", {})[f"blocks_{i}"] = _conformer_block(
            sd, f"decoder.blocks.{i}"
        )
        i += 1
    if "at_adpater.0.f_att_token" in sd:
        params["at_pool"] = {
            "f_att_token": sd["at_adpater.0.f_att_token"],
            "frequency_att": _torch_mha_to_flax(sd, "at_adpater.0.frequency_att", at_adapter_heads),
        }
        params["at_head"] = _dense(sd, "at_adpater.1")
    if "f_pool_module.f_att_token" in sd:
        params["f_pool_module"] = {
            "f_att_token": sd["f_pool_module.f_att_token"],
            "frequency_att": _torch_mha_to_flax(
                sd, "f_pool_module.frequency_att", f_pool_heads
            ),
        }
    if "mask_token" in sd:
        params["mask_token"] = sd["mask_token"]
    if "mlm_mlp.0.weight" in sd:
        params["mlm_fc1"] = _dense(sd, "mlm_mlp.0")
        params["mlm_fc2"] = _dense(sd, "mlm_mlp.2")
    return params


def check_tree_compatible(template, imported) -> Dict[str, str]:
    """Shape-compare an imported tree against a model-init template.

    Returns {path: problem} for missing or mismatched leaves (empty =
    fully compatible).
    """
    t = flax.traverse_util.flatten_dict(template, sep="/")
    m = flax.traverse_util.flatten_dict(imported, sep="/")
    problems = {}
    for k, v in t.items():
        if k not in m:
            problems[k] = "missing"
        elif tuple(np.shape(m[k])) != tuple(np.shape(v)):
            problems[k] = f"shape {np.shape(m[k])} != {np.shape(v)}"
    return problems


def adapt_image_pos_embed(
    pos_embed: np.ndarray, num_tokens: int, grid_size: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ImageNet ViT pos embed -> PaSST's disentangled embeds.

    Parity with ``adapt_image_pos_embed_to_passt`` (``passt.py:946-967``):
    the square ImageNet grid is bicubic-resized to PaSST's (F', T') grid
    and factorised by axis means into ``freq_new_pos_embed`` /
    ``time_new_pos_embed``; the cls/dist rows become ``new_pos_embed``.
    Uses scipy zoom (bicubic order-3) in place of torch's interpolate —
    boundary treatment differs by <1e-3 in practice.
    """
    from scipy.ndimage import zoom

    tok = pos_embed[:, :num_tokens]
    grid = pos_embed[0, num_tokens:]
    gs_old = int(np.sqrt(len(grid)))
    grid = grid.reshape(gs_old, gs_old, -1)
    factors = (grid_size[0] / gs_old, grid_size[1] / gs_old, 1.0)
    resized = zoom(grid, factors, order=3)  # [F', T', D]
    resized = resized.transpose(2, 0, 1)[None]  # [1, D, F', T']
    freq = resized.mean(axis=3, keepdims=True)
    time = resized.mean(axis=2, keepdims=True)
    return tok.astype(np.float32), freq.astype(np.float32), time.astype(np.float32)


def convert_imagenet_vit_to_passt(
    sd: Mapping[str, np.ndarray], depth: int = 12, grid_size: Tuple[int, int] = (12, 99)
) -> Dict:
    """deit/ViT (timm naming) state_dict -> flax PaSST params.

    Handles the reference ``checkpoint_filter_fn`` conventions
    (``passt.py:969-998``): 'model'-wrapped deit dicts, flat pos_embed
    adaptation, and pre-conv patchify weights reshaped to conv form.
    """
    sd = dict(sd.get("model", sd))
    num_tokens = 2 if "dist_token" in sd else 1
    if "time_new_pos_embed" not in sd:
        tok, freq, time = adapt_image_pos_embed(sd.pop("pos_embed"), num_tokens, grid_size)
        sd["new_pos_embed"] = tok
        sd["freq_new_pos_embed"] = freq
        sd["time_new_pos_embed"] = time
    w = sd["patch_embed.proj.weight"]
    if w.ndim < 4:
        o = w.shape[0]
        sd["patch_embed.proj.weight"] = w.reshape(o, -1, 16, 16)
    if sd["patch_embed.proj.weight"].shape[1] == 3:
        # RGB -> mono: sum the input channels (reference PaSST convention)
        sd["patch_embed.proj.weight"] = sd["patch_embed.proj.weight"].sum(
            axis=1, keepdims=True
        )
    return convert_passt_backbone(sd, depth=depth)


def convert_htsat(
    sd: Mapping[str, np.ndarray], depths: Optional[Tuple[int, ...]] = None
) -> Dict:
    """torch HTSAT (CLAP audio branch) state_dict -> flax HTSAT params.

    Reference naming (``src/models/htsat/htsat.py``): ``patch_embed.proj``
    + ``patch_embed.norm``, Swin stages ``layers.{i}.blocks.{j}`` with
    ``attn.{qkv,proj,relative_position_bias_table}`` and
    ``mlp.{fc1,fc2}``, ``layers.{i}.downsample.{norm,reduction}``,
    ``bn0`` (per-mel-bin BatchNorm), ``norm``, ``tscam_conv``. The
    ``attn_mask``/``relative_position_index`` buffers are recomputed
    here and skipped.
    """
    strip = lambda k: k[len("backbone.") :] if k.startswith("backbone.") else k
    sd = {strip(k): v for k, v in sd.items()}
    if depths is None:
        # auto-detect the stage/block layout from the key set (tiny is
        # (2,2,6,2), base (2,2,12,2) — hardcoding either breaks the other)
        detected = []
        i = 0
        while f"layers.{i}.blocks.0.norm1.weight" in sd:
            j = 0
            while f"layers.{i}.blocks.{j}.norm1.weight" in sd:
                j += 1
            detected.append(j)
            i += 1
        depths = tuple(detected)

    params: Dict = {
        "patch_embed_proj": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
        "tscam_conv": {
            # torch conv [O, C, kh, kw] -> flax [kh, kw, C, O]
            "kernel": np.transpose(sd["tscam_conv.weight"], (2, 3, 1, 0)),
            "bias": sd["tscam_conv.bias"],
        },
        "bn0": {
            "scale": sd["bn0.weight"],
            "bias": sd["bn0.bias"],
        },
    }
    batch_stats = {
        "bn0": {
            "mean": sd["bn0.running_mean"],
            "var": sd["bn0.running_var"],
        }
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": _ln(sd, f"{p}.norm1"),
                "attn": {
                    "qkv": _dense(sd, f"{p}.attn.qkv"),
                    "proj": _dense(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": sd[f"{p}.attn.relative_position_bias_table"],
                },
                "norm2": _ln(sd, f"{p}.norm2"),
                "mlp": {
                    "fc1": _dense(sd, f"{p}.mlp.fc1"),
                    "fc2": _dense(sd, f"{p}.mlp.fc2"),
                },
            }
        if i < len(depths) - 1:
            params[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": sd[f"layers.{i}.downsample.reduction.weight"].T},
            }
    return {"params": params, "batch_stats": batch_stats}


def _mlp_layers(sd, prefix):
    """Reference DASM MLP (``detect_any_sound.py:404-416``): ModuleList
    ``layers.{i}`` -> flax ``layers_{i}``; layer count auto-detected."""
    out = {}
    i = 0
    while f"{prefix}.layers.{i}.weight" in sd:
        out[f"layers_{i}"] = _dense(sd, f"{prefix}.layers.{i}")
        i += 1
    if not out:
        raise KeyError(f"no '{prefix}.layers.*' keys in state dict")
    return out


def _cross_attn_layer(sd, prefix, num_heads: int):
    """torch ``CrossAttentionFirstDecoderLayer`` (a TransformerDecoderLayer,
    ``at_adapter.py:7-33``) -> flax layer tree: cross-attn (multihead_attn)
    + norm1, self-attn + norm2, ffn linear1/2 + norm3."""
    return {
        "multihead_attn": _torch_mha_to_flax(sd, f"{prefix}.multihead_attn", num_heads),
        "self_attn": _torch_mha_to_flax(sd, f"{prefix}.self_attn", num_heads),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
    }


def convert_dasm(
    sd: Mapping[str, np.ndarray],
    num_heads: int = 12,
    f_pool_heads: int = 6,
    backbone_depth: Optional[int] = None,
) -> Dict:
    """torch DASM / DASM_HTSAT state_dict -> {'params', 'batch_stats'}.

    Covers the reference's released open-vocabulary checkpoints
    (``src/models/detect_any_sound/detect_any_sound.py:18-416``,
    ``detect_any_sound_htast.py:12-119``): backbone (PaSST or HTSAT,
    auto-detected from key naming), f_pool AttentionPooling (PaSST
    variant only; hardcoded 6 heads at ``detect_any_sound.py:71``),
    projectors + merge weight, XL sed_decoder, sed_head,
    mask_embedding MLP, learnable/projected queries, the
    cross-attention-first AT decoder stack, at_head MLP, and the MLM
    head. Layer counts are auto-detected from the key set.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    if backbone_sd:
        if any(k.startswith("layers.0.blocks") for k in backbone_sd):
            tree = convert_htsat(backbone_sd)
            params["backbone"] = tree["params"]
            batch_stats["backbone"] = tree["batch_stats"]
        else:
            params["backbone"] = convert_passt_backbone(backbone_sd, depth=backbone_depth)

    if "f_pool_module.f_att_token" in sd:
        params["f_pool_module"] = {
            "f_att_token": sd["f_pool_module.f_att_token"],
            "frequency_att": _torch_mha_to_flax(
                sd, "f_pool_module.frequency_att", f_pool_heads
            ),
        }
    for ln_name in ("norm_before_pool", "norm_after_merge"):
        if f"{ln_name}.weight" in sd:
            params[ln_name] = _ln(sd, ln_name)
    for dense_name in ("transformer_projector", "at_projector", "cnn_projector",
                       "sed_head"):
        if f"{dense_name}.weight" in sd:
            params[dense_name] = _dense(sd, dense_name)
    if "merge_weight" in sd:
        params["merge_weight"] = sd["merge_weight"]

    i = 0
    while f"sed_decoder.encoder_blocks.{i}.norm1.weight" in sd:
        params.setdefault("sed_decoder", {})[f"encoder_blocks_{i}"] = _xl_block(
            sd, f"sed_decoder.encoder_blocks.{i}"
        )
        i += 1

    if "mask_embedding_layer.layers.0.weight" in sd:
        params["mask_embedding_layer"] = _mlp_layers(sd, "mask_embedding_layer")
    if "at_head.layers.0.weight" in sd:
        params["at_head"] = _mlp_layers(sd, "at_head")

    if "at_query" in sd:
        params["at_query"] = sd["at_query"]
    if "query_projector.0.weight" in sd:
        # single shared Sequential(Linear, GELU)
        params["query_projector"] = _dense(sd, "query_projector.0")
    else:
        # per-modality ModuleList of Sequential(LayerNorm?, Linear, GELU):
        # reference builds Sequential(nn.Linear(dim, D), nn.GELU()) per
        # modality at detect_any_sound.py:141-150
        m = 0
        while f"query_projector.{m}.0.weight" in sd:
            params[f"query_projector_{m}"] = _dense(sd, f"query_projector.{m}.0")
            m += 1

    i = 0
    while f"at_decoder.decoder.layers.{i}.norm1.weight" in sd:
        params.setdefault("at_decoder", {})[f"layers_{i}"] = _cross_attn_layer(
            sd, f"at_decoder.decoder.layers.{i}", num_heads
        )
        i += 1

    if "mask_token" in sd:
        params["mask_token"] = sd["mask_token"]
    if "mlm_mlp.0.weight" in sd:
        params["mlm_fc1"] = _dense(sd, "mlm_mlp.0")
        params["mlm_fc2"] = _dense(sd, "mlm_mlp.2")
    return {"params": params, "batch_stats": batch_stats}


def convert_cnn(sd: Mapping[str, np.ndarray], prefix: str = "cnn") -> Tuple[Dict, Dict]:
    """Reference DCASE CNN stack (``src/models/cnn/base.py:33-113``) ->
    (params, batch_stats) for the flax CNN.

    torch names the Sequential stages ``{prefix}.conv{i}`` /
    ``batchnorm{i}`` (or ``layernorm{i}`` GroupNorm) / ``glu{i}``/
    ``cg{i}`` -> flax ``conv{i}`` / ``norm{i}`` / ``act{i}/linear``.
    Stage count auto-detected.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    i = 0
    while f"{prefix}.conv{i}.weight" in sd:
        w = sd[f"{prefix}.conv{i}.weight"]
        if w.ndim == 5:
            # Dynamic_conv2d basis bank [nk, out, in, kh, kw]
            # (``FDY_cnn.py:7-117``): flax runs ONE conv with nk*out
            # channels (nk outer, matching torch's aggregate view)
            nk, out, cin, kh, kw = w.shape
            agg = w.reshape(nk * out, cin, kh, kw)
            tree: Dict = {"basis_conv": {"kernel": np.transpose(agg, (2, 3, 1, 0))}}
            ap = f"{prefix}.conv{i}.attention"
            if f"{ap}.conv1d1.weight" in sd:
                tree["att_conv1"] = {
                    "kernel": np.transpose(sd[f"{ap}.conv1d1.weight"], (2, 1, 0))
                }
                tree["att_bn"] = {
                    "scale": sd[f"{ap}.bn.weight"],
                    "bias": sd[f"{ap}.bn.bias"],
                }
                batch_stats[f"conv{i}"] = {
                    "att_bn": {
                        "mean": sd[f"{ap}.bn.running_mean"],
                        "var": sd[f"{ap}.bn.running_var"],
                    }
                }
                tree["att_conv2"] = {
                    "kernel": np.transpose(sd[f"{ap}.conv1d2.weight"], (2, 1, 0)),
                    "bias": sd[f"{ap}.conv1d2.bias"],
                }
            else:  # pool_dim == 'both' variant uses fc1/fc2
                tree["att_fc1"] = _dense(sd, f"{ap}.fc1")
                tree["att_fc2"] = _dense(sd, f"{ap}.fc2")
            params[f"conv{i}"] = tree
            if f"{prefix}.batchnorm{i}.weight" in sd:
                params[f"norm{i}"] = {
                    "scale": sd[f"{prefix}.batchnorm{i}.weight"],
                    "bias": sd[f"{prefix}.batchnorm{i}.bias"],
                }
                batch_stats.setdefault(f"norm{i}", {}).update({
                    "mean": sd[f"{prefix}.batchnorm{i}.running_mean"],
                    "var": sd[f"{prefix}.batchnorm{i}.running_var"],
                })
            elif f"{prefix}.layernorm{i}.weight" in sd:
                params[f"norm{i}"] = {
                    "scale": sd[f"{prefix}.layernorm{i}.weight"],
                    "bias": sd[f"{prefix}.layernorm{i}.bias"],
                }
            for act in ("glu", "cg"):
                if f"{prefix}.{act}{i}.linear.weight" in sd:
                    params[f"act{i}"] = {"linear": _dense(sd, f"{prefix}.{act}{i}.linear")}
            i += 1
            continue
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd[f"{prefix}.conv{i}.bias"],
        }
        if f"{prefix}.batchnorm{i}.weight" in sd:
            params[f"norm{i}"] = {
                "scale": sd[f"{prefix}.batchnorm{i}.weight"],
                "bias": sd[f"{prefix}.batchnorm{i}.bias"],
            }
            batch_stats[f"norm{i}"] = {
                "mean": sd[f"{prefix}.batchnorm{i}.running_mean"],
                "var": sd[f"{prefix}.batchnorm{i}.running_var"],
            }
        elif f"{prefix}.layernorm{i}.weight" in sd:
            params[f"norm{i}"] = {
                "scale": sd[f"{prefix}.layernorm{i}.weight"],
                "bias": sd[f"{prefix}.layernorm{i}.bias"],
            }
        for act in ("glu", "cg"):
            if f"{prefix}.{act}{i}.linear.weight" in sd:
                params[f"act{i}"] = {"linear": _dense(sd, f"{prefix}.{act}{i}.linear")}
        i += 1
    if not params:
        raise KeyError(f"no '{prefix}.conv*' keys in state dict")
    return params, batch_stats


def convert_htsat_cnn(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch HTSAT_CNN state_dict -> {'params', 'batch_stats'}
    (reference ``src/models/htsat/htsat_cnn.py:13-209``): HTSAT backbone,
    optional CNN merge branch, projectors, XL sed_decoder, sed_head,
    MLM head."""
    params: Dict = {}
    batch_stats: Dict = {}

    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    if backbone_sd:
        tree = convert_htsat(backbone_sd)
        params["backbone"] = tree["params"]
        batch_stats["backbone"] = tree["batch_stats"]
    if "cnn.cnn.conv0.weight" in sd:
        cnn_sd = {k[len("cnn.") :]: v for k, v in sd.items() if k.startswith("cnn.")}
        params["cnn"], cnn_stats = convert_cnn(cnn_sd)
        if cnn_stats:
            batch_stats["cnn"] = cnn_stats
    for dense_name in ("transformer_projector", "cnn_projector", "sed_head"):
        if f"{dense_name}.weight" in sd:
            params[dense_name] = _dense(sd, dense_name)
    for ln_name in ("norm_before_pool", "norm_after_merge"):
        if f"{ln_name}.weight" in sd:
            params[ln_name] = _ln(sd, ln_name)
    if "merge_weight" in sd:
        params["merge_weight"] = sd["merge_weight"]
    i = 0
    while f"sed_decoder.encoder_blocks.{i}.norm1.weight" in sd:
        params.setdefault("sed_decoder", {})[f"encoder_blocks_{i}"] = _xl_block(
            sd, f"sed_decoder.encoder_blocks.{i}"
        )
        i += 1
    if "mask_token" in sd:
        params["mask_token"] = sd["mask_token"]
    if "mlm_mlp.0.weight" in sd:
        params["mlm_fc1"] = _dense(sd, "mlm_mlp.0")
        params["mlm_fc2"] = _dense(sd, "mlm_mlp.2")
    return {"params": params, "batch_stats": batch_stats}


def convert_clap_sed(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch CLAP_SED state_dict -> {'params', 'batch_stats'}
    (reference ``src/models/htsat/clap_sed.py:9-49``): HTSAT backbone,
    audio/text MLP projectors, and the registered text_query buffer."""
    params: Dict = {}
    batch_stats: Dict = {}
    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    if backbone_sd:
        tree = convert_htsat(backbone_sd)
        params["backbone"] = tree["params"]
        batch_stats["backbone"] = tree["batch_stats"]
    for proj in ("audio_projector", "text_projector"):
        if f"{proj}.layers.0.weight" in sd:
            params[proj] = _mlp_layers(sd, proj)
    if "text_query" in sd:
        params["text_query"] = sd["text_query"]
    return {"params": params, "batch_stats": batch_stats}


def convert_passt_cnn(sd: Mapping[str, np.ndarray], **kwargs) -> Dict:
    """torch PaSST_CNN state_dict -> {'params', 'batch_stats'}
    (reference ``src/models/cnn_transformer/passt_cnn.py:9-92``):
    PaSST_SED tree plus the CNN merge branch + projectors."""
    params = convert_passt_sed(sd, **kwargs)
    batch_stats: Dict = {}
    if "cnn.cnn.conv0.weight" in sd:
        cnn_sd = {k[len("cnn.") :]: v for k, v in sd.items() if k.startswith("cnn.")}
        params["cnn"], cnn_stats = convert_cnn(cnn_sd)
        if cnn_stats:
            batch_stats["cnn"] = cnn_stats
    for dense_name in ("cnn_projector", "transformer_projector"):
        if f"{dense_name}.weight" in sd:
            params[dense_name] = _dense(sd, dense_name)
    if "merge_weight" in sd:
        params["merge_weight"] = sd["merge_weight"]
    return {"params": params, "batch_stats": batch_stats}


_CONVERTER_INIT_KWARGS = {
    # init_kwargs keys a family's converter understands (head counts for
    # packed-MHA splitting; layer counts are auto-detected from the keys)
    "PaSST_SED": ("at_adapter_heads", "f_pool_heads", "lora_rank", "lora_alpha"),
    "PaSST_CNN": ("at_adapter_heads", "f_pool_heads", "lora_rank", "lora_alpha"),
    "PasstComplexCNN": ("at_adapter_heads", "f_pool_heads", "lora_rank", "lora_alpha"),
    "DASM": ("num_heads", "f_pool_heads"),
    "DASM_HTSAT": ("num_heads", "f_pool_heads"),
    "HTSAT_CNN": (),
    "CLAP_SED": (),
    "AST_SED": (),
    "ASTWithSlide": (),
}


def convert_torch_checkpoint(
    sd: Mapping[str, np.ndarray],
    model_name: str,
    init_kwargs: Optional[Mapping] = None,
    lora_merged: Optional[bool] = None,
    **kwargs,
) -> Tuple[Dict, Dict]:
    """Dispatch a reference ``.pt`` state_dict by model family.

    Returns ``(params, model_state)`` where model_state is
    ``{'batch_stats': ...}`` (or {}) — the shape the recipes CLI and
    serving engine thread as non-params collections. This is what makes
    ``--pretrained_ckpt foo.pt`` / ``--ckpt foo.pt`` accept the
    reference's own checkpoints directly.

    ``lora_merged`` is the explicit LoRA checkpoint merged-ness policy
    (loralib state dicts can't self-describe it — :func:`_dense`).
    ``None`` keeps the family converter's default (True = the
    reference's published-artifact convention, pmam/main.py:202); pass
    ``False`` for mid-training BestModels saves (src/utils/log.py:47-89).
    Families without LoRA support ignore it.
    """
    if lora_merged is not None and model_name in (
        "PaSST_SED", "PaSST_CNN", "PasstComplexCNN"
    ):
        kwargs.setdefault("lora_merged", lora_merged)
    converters = {
        "PaSST_SED": lambda s: {"params": convert_passt_sed(s, **kwargs), "batch_stats": {}},
        "PaSST_CNN": lambda s: convert_passt_cnn(s, **kwargs),
        "PasstComplexCNN": lambda s: convert_passt_cnn(s, **kwargs),
        "DASM": lambda s: convert_dasm(s, **kwargs),
        "DASM_HTSAT": lambda s: convert_dasm(s, **kwargs),
        "HTSAT_CNN": lambda s: convert_htsat_cnn(s),
        "CLAP_SED": lambda s: convert_clap_sed(s),
        "AST_SED": lambda s: {"params": convert_ast_sed(s), "batch_stats": {}},
        "ASTWithSlide": lambda s: {"params": convert_ast_sed(s), "batch_stats": {}},
    }
    if model_name not in converters:
        raise ValueError(
            f"no torch converter for model {model_name!r}; know {sorted(converters)}"
        )
    for k in _CONVERTER_INIT_KWARGS[model_name]:
        if init_kwargs and k in init_kwargs and k not in kwargs:
            kwargs[k] = init_kwargs[k]
    tree = converters[model_name](sd)
    state = {"batch_stats": tree["batch_stats"]} if tree.get("batch_stats") else {}
    return tree["params"], state


def _conformer_block(sd, prefix):
    """Reference ConformerEncoderLayer (``conformer.py:10-145``) -> flax
    ConformerBlock tree. torch Sequential FFNs index Linear at .0/.3;
    conv1d weights [O, I, K] -> flax [K, I/groups, O]."""
    def conv1d(p):
        w = sd[f"{p}.weight"]
        return {"kernel": np.transpose(w, (2, 1, 0)), "bias": sd[f"{p}.bias"]}

    def pointwise(p):
        w = sd[f"{p}.weight"]  # [O, I, 1] -> dense [I, O]
        return {"kernel": w[:, :, 0].T, "bias": sd[f"{p}.bias"]}

    return {
        "norm_ff_macaron": _ln(sd, f"{prefix}.norm_ff_macaron"),
        "feed_forward_macaron_1": _dense(sd, f"{prefix}.feed_forward_macaron.0"),
        "feed_forward_macaron_2": _dense(sd, f"{prefix}.feed_forward_macaron.3"),
        "norm_mha": _ln(sd, f"{prefix}.norm_mha"),
        "self_attn": {
            "in_proj": _dense(sd, f"{prefix}.self_attn.in_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
            "linear_pos": _dense_nobias(sd, f"{prefix}.self_attn.linear_pos"),
            "pos_bias_u": sd[f"{prefix}.self_attn.pos_bias_u"],
            "pos_bias_v": sd[f"{prefix}.self_attn.pos_bias_v"],
        },
        "norm_conv": _ln(sd, f"{prefix}.norm_conv"),
        "conv_module": {
            "pointwise_conv1": pointwise(f"{prefix}.conv_module.pointwise_conv1"),
            "depthwise_conv": conv1d(f"{prefix}.conv_module.depthwise_conv"),
            "norm": _ln(sd, f"{prefix}.conv_module.norm"),
            "pointwise_conv2": pointwise(f"{prefix}.conv_module.pointwise_conv2"),
        },
        "norm_ff": _ln(sd, f"{prefix}.norm_ff"),
        "feed_forward_1": _dense(sd, f"{prefix}.feed_forward.0"),
        "feed_forward_2": _dense(sd, f"{prefix}.feed_forward.3"),
        "norm_final": _ln(sd, f"{prefix}.norm_final"),
    }


def _gru(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """torch ``nn.GRU(bidirectional=True)`` -> flax BiGRUDecoder params.

    torch packs gates ``[r; z; n]`` with separate ``b_ih``/``b_hh``
    (per layer x direction); flax GRUCell keeps biasless ``hr``/``hz``
    denses, so ``b_hh``'s r/z thirds fold into the input biases
    (additive inside the sigmoid) while ``b_hn`` stays on ``hn`` (it
    sits INSIDE the reset-gate product). Cell order matches
    BiGRUDecoder's construction: l0 fwd, l0 bwd, l1 fwd, l1 bwd
    (mapping numerics pinned by tests/test_torch_parity.py::
    TestBiGRUDecoderParity).
    """
    params: Dict = {}
    cell = 0
    layer = 0
    while f"{prefix}.weight_ih_l{layer}" in sd:
        for direction in ("", "_reverse"):
            wih = sd[f"{prefix}.weight_ih_l{layer}{direction}"]
            whh = sd[f"{prefix}.weight_hh_l{layer}{direction}"]
            bih = sd[f"{prefix}.bias_ih_l{layer}{direction}"]
            bhh = sd[f"{prefix}.bias_hh_l{layer}{direction}"]
            wr, wz, wn = np.split(wih, 3, axis=0)
            ur, uz, un = np.split(whh, 3, axis=0)
            br, bz, bn = np.split(bih, 3)
            cr, cz, cn = np.split(bhh, 3)
            params[f"GRUCell_{cell}"] = {
                "ir": {"kernel": wr.T, "bias": br + cr},
                "iz": {"kernel": wz.T, "bias": bz + cz},
                "in": {"kernel": wn.T, "bias": bn},
                "hr": {"kernel": ur.T},
                "hz": {"kernel": uz.T},
                "hn": {"kernel": un.T, "bias": cn},
            }
            cell += 1
        layer += 1
    return params


def convert_ast_sed(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch AST_SED / ASTWithSlide state_dict -> flax param tree.

    Reference naming (``ast_models.py:395-559``): the ASTModel under
    ``patch_transformer.`` (handled by :func:`convert_ast`), then
    ``out_norm``, the frequency-pool pieces (``linear_emb`` +
    ``frequency_transformer.{i}`` + ``frequency_transformer_norm``) when
    f_pool is the frequency transformer, the context net (``GRU.*`` for
    gru/local_gru_decoder, ``transformer_decoder.{i}`` +
    ``decoder_norm`` for transformer — the fixed sincos
    ``decoder_pos_embed`` buffer is recomputed at trace time), and
    ``classifier``. Variant auto-detected from the keys.
    """
    ast_sd = {
        k[len("patch_transformer.") :]: v
        for k, v in sd.items()
        if k.startswith("patch_transformer.")
    }
    params: Dict = {"backbone": convert_ast(ast_sd)}
    if "out_norm.weight" in sd:  # Identity when ast_feature_layer == 'frame'
        params["out_norm"] = _ln(sd, "out_norm")
    if "linear_emb.weight" in sd:
        fp: Dict = {"linear_emb": _dense(sd, "linear_emb")}
        i = 0
        while f"frequency_transformer.{i}.norm1.weight" in sd:
            fp[f"blocks_{i}"] = _vit_block(sd, f"frequency_transformer.{i}")
            i += 1
        fp["norm"] = _ln(sd, "frequency_transformer_norm")
        params["f_pool_module"] = fp
    if "GRU.weight_ih_l0" in sd:
        params["decoder_module"] = _gru(sd, "GRU")
    elif "transformer_decoder.0.norm1.weight" in sd:
        dec: Dict = {}
        i = 0
        while f"transformer_decoder.{i}.norm1.weight" in sd:
            dec[f"blocks_{i}"] = _vit_block(sd, f"transformer_decoder.{i}")
            i += 1
        params["decoder_module"] = dec
        params["decoder_norm"] = _ln(sd, "decoder_norm")
    params["classifier"] = _dense(sd, "classifier")
    return params


def convert_ast(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch ASTModel state_dict -> flax AST params.

    Reference naming (``src/models/ast/ast_models.py:88-137``): the timm
    deit lives under ``v.*`` (cls/dist tokens, flat pos_embed, 1-channel
    patch conv after the init-time adaptation, ``blocks.{i}``, ``norm``)
    plus the ``mlp_head`` Sequential (LayerNorm at .0, Linear at .1).
    Depth auto-detected.
    """
    v = {k[len("v.") :]: val for k, val in sd.items() if k.startswith("v.")}
    depth = 0
    while f"blocks.{depth}.norm1.weight" in v:
        depth += 1
    params: Dict = {
        "patch_embed": {
            "proj": {
                "kernel": np.transpose(v["patch_embed.proj.weight"], (2, 3, 1, 0)),
                "bias": v["patch_embed.proj.bias"],
            }
        },
        "cls_token": v["cls_token"],
        "dist_token": v["dist_token"],
        "pos_embed": v["pos_embed"],
        "norm": _ln(v, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _vit_block(v, f"blocks.{i}")
    if "mlp_head.0.weight" in sd:
        params["mlp_head_norm"] = {
            "scale": sd["mlp_head.0.weight"], "bias": sd["mlp_head.0.bias"]
        }
        params["mlp_head"] = _dense(sd, "mlp_head.1")
    return params


def convert_resnet(sd: Mapping[str, np.ndarray], prefix: str = "cnn") -> Tuple[Dict, Dict]:
    """Reference ResNet stack (``resnet.py:143-255``) -> (params, batch_stats).

    torch names the Sequential stages ``{prefix}.res_block {i}`` (with a
    literal space, reference quirk), ``{prefix}.pre_cov`` (v2), and
    ``{prefix}.cnn_1d_{j}.{conv_1d,norm_layer}``. Downsample is timm's
    ``downsample_avg``: Sequential(pool, conv1x1, bn) -> keys ``.1``/``.2``.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    def conv(tp):
        return {"kernel": np.transpose(sd[tp + ".weight"], (2, 3, 1, 0)),
                **({"bias": sd[tp + ".bias"]} if tp + ".bias" in sd else {})}

    def bn(tp):
        params_sub = {"scale": sd[tp + ".weight"], "bias": sd[tp + ".bias"]}
        stats_sub = {"mean": sd[tp + ".running_mean"], "var": sd[tp + ".running_var"]}
        return params_sub, stats_sub

    if f"{prefix}.pre_cov.weight" in sd:
        params["pre_cov"] = conv(f"{prefix}.pre_cov")
    i = 0
    while f"{prefix}.res_block {i}.conv1.weight" in sd:
        tp = f"{prefix}.res_block {i}"
        blk: Dict = {"conv1": conv(tp + ".conv1"), "conv2": conv(tp + ".conv2")}
        blk_stats: Dict = {}
        for n in ("bn1", "bn2"):
            blk[n], blk_stats[n] = bn(f"{tp}.{n}")
        if f"{tp}.downsample.1.weight" in sd:
            blk["downsample_conv"] = conv(tp + ".downsample.1")
            blk["downsample_bn"], blk_stats["downsample_bn"] = bn(f"{tp}.downsample.2")
        params[f"res_block{i}"] = blk
        batch_stats[f"res_block{i}"] = blk_stats
        i += 2
    j = 0
    while f"{prefix}.cnn_1d_{j}.conv_1d.weight" in sd:
        w = sd[f"{prefix}.cnn_1d_{j}.conv_1d.weight"]  # [O, I, K] -> [K, I, O]
        params[f"cnn_1d_{j}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": sd[f"{prefix}.cnn_1d_{j}.conv_1d.bias"],
        }
        params[f"cnn_1d_bn{j}"], batch_stats[f"cnn_1d_bn{j}"] = bn(
            f"{prefix}.cnn_1d_{j}.norm_layer"
        )
        j += 1
    if not params:
        raise KeyError(f"no '{prefix}.res_block *' keys in state dict")
    return params, batch_stats
