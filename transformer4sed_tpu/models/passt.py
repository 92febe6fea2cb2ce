"""PaSST backbone: ViT on log-mel "images" with disentangled time/freq
positional embeddings and Patchout.

Behavioural parity targets (``src/models/passt/passt.py:366-612``):
  * 16x16 patches at stride 10 over a [128, T<=998] mel, cls + dist
    tokens with their own ``new_pos_embed``;
  * separate ``time_new_pos_embed`` [1, D, 1, 99] / ``freq_new_pos_embed``
    [1, D, 12, 1] added to the patch grid — with a *random time offset
    crop* when the input is shorter than the nominal grid (training);
  * structured patchout: randomly drop ``s_patchout_f`` freq rows /
    ``s_patchout_t`` time columns (training only), then unstructured
    patchout of ``u_patchout`` tokens;
  * token sequence [cls, dist, patches(f-major)] through ``depth``
    pre-norm blocks + final LayerNorm.

TPU redesign: instead of materialising all 12 per-layer outputs in a
dict (12 x [B, 770, 768] live tensors in the reference,
``passt.py:574-576``), the caller names the tap layers it needs
(``tap_layers``) and only those activations are kept. Patchout keeps
shapes static: dropped rows/columns/tokens are selected with a sorted
random permutation under jit, so each (training, input-width) pair is
one compiled program.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.models.vit import Block, PatchEmbed, trunc_normal_init


class PaSST(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    img_size: Tuple[int, int] = (128, 998)
    patch_size: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (10, 10)
    in_chans: int = 1
    u_patchout: int = 0
    s_patchout_t: int = 0
    s_patchout_f: int = 0
    distilled: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    tap_layers: Tuple[int, ...] = (10,)  # 1-based block indices to expose
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = False
    remat: bool = False  # rematerialise blocks in backward (HBM for FLOPs)
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, int]:
        # conv output grid (the reference's img_size // stride coincides
        # with this for its 128x998 nominal size)
        return (
            (self.img_size[0] - self.patch_size[0]) // self.stride[0] + 1,
            (self.img_size[1] - self.patch_size[1]) // self.stride[1] + 1,
        )

    @property
    def num_tokens(self) -> int:
        return 2 if self.distilled else 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """x: [B, 1, F, T] normalised log-mel. Returns a dict with
        ``layer{k}_out`` [B, P+tok, D] for each tap layer, ``frame``
        (final-norm tokens) [B, P+tok, D], and static ``f_dim``/``t_dim``.
        """
        out: Dict[str, jnp.ndarray] = {}
        patches = PatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            stride=self.stride,
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # [B, D, F', T']
        b, d, f_dim, t_dim = patches.shape

        time_pos = self.param(
            "time_new_pos_embed", trunc_normal_init(), (1, self.embed_dim, 1, self.grid_size[1])
        )
        freq_pos = self.param(
            "freq_new_pos_embed", trunc_normal_init(), (1, self.embed_dim, self.grid_size[0], 1)
        )
        token_pos = self.param("new_pos_embed", trunc_normal_init(), (1, self.num_tokens, self.embed_dim))
        cls_token = self.param("cls_token", trunc_normal_init(), (1, 1, self.embed_dim))

        # --- time positional embedding, with training-time random crop offset
        nominal_t = self.grid_size[1]
        if t_dim < nominal_t:
            if train:
                rng = self.make_rng("patchout")
                offset = jax.random.randint(rng, (), 0, nominal_t - t_dim + 1)
                time_pos_c = jax.lax.dynamic_slice(
                    time_pos, (0, 0, 0, offset), (1, self.embed_dim, 1, t_dim)
                )
            else:
                time_pos_c = time_pos[:, :, :, :t_dim]
        elif t_dim > nominal_t:
            patches = patches[:, :, :, :nominal_t]
            t_dim = nominal_t
            time_pos_c = time_pos
        else:
            time_pos_c = time_pos
        patches = patches + time_pos_c
        patches = patches + freq_pos

        # --- structured patchout (training only; static output shapes)
        if train and self.s_patchout_t:
            rng = self.make_rng("patchout")
            keep = jnp.sort(jax.random.permutation(rng, t_dim)[: t_dim - self.s_patchout_t])
            patches = jnp.take(patches, keep, axis=3)
            t_dim = t_dim - self.s_patchout_t
        if train and self.s_patchout_f:
            rng = self.make_rng("patchout")
            keep = jnp.sort(jax.random.permutation(rng, f_dim)[: f_dim - self.s_patchout_f])
            patches = jnp.take(patches, keep, axis=2)
            f_dim = f_dim - self.s_patchout_f

        # flatten f-major: [B, D, F', T'] -> [B, F'*T', D]
        seq = patches.reshape(b, d, f_dim * t_dim).transpose(0, 2, 1)

        # --- unstructured patchout
        if train and self.u_patchout:
            rng = self.make_rng("patchout")
            n = seq.shape[1]
            keep = jnp.sort(jax.random.permutation(rng, n)[: n - self.u_patchout])
            seq = jnp.take(seq, keep, axis=1)

        # --- prepend cls (+ dist) tokens with their positional embedding
        cls = jnp.tile(cls_token + token_pos[:, :1], (b, 1, 1))
        if self.distilled:
            dist_token = self.param("dist_token", trunc_normal_init(), (1, 1, self.embed_dim))
            dist = jnp.tile(dist_token + token_pos[:, 1:], (b, 1, 1))
            seq = jnp.concatenate([cls, dist, seq], axis=1)
        else:
            seq = jnp.concatenate([cls, seq], axis=1)

        seq = nn.Dropout(self.drop_rate)(seq, deterministic=not train)

        # --- transformer stack with named taps
        taps = set(self.tap_layers)
        h = seq.astype(self.dtype)
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        for i in range(self.depth):
            h = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(h, None, not train)
            if (i + 1) in taps:
                out[f"layer{i + 1}_out"] = h.astype(jnp.float32)

        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h.astype(jnp.float32))
        out["frame"] = h
        out["f_dim"] = f_dim
        out["t_dim"] = t_dim
        return out


# -- named variants ---------------------------------------------------------------
#
# The reference exposes ~15 timm-style factory functions with pretrained
# checkpoint URLs (``src/models/passt/passt.py:1073-1232`` over the
# ``default_cfgs`` table at ``:169-215``). Here they are one registry:
# ``create_passt(name)`` builds the flax module with the variant's
# stride / input grid, and ``PASST_VARIANTS[name]["url"]`` records where
# the torch weights live (download them offline and import with
# ``utils.torch_import.convert_passt_backbone``).

_PASST_RELEASES = "https://github.com/kkoutini/PaSST/releases/download"

PASST_VARIANTS = {
    # name: (stride, mel time frames, checkpoint file)
    "passt_s_swa_p16_128_ap476": ((10, 10), 998, "v0.0.1-audioset/passt-s-f128-p16-s10-ap.476-swa.pt"),
    "passt_s_swa_p16_128_ap4761": ((10, 10), 998, "v0.0.2-audioset/passt-s-f128-p16-s10-ap.4761-swa.pt"),
    "passt_s_p16_128_ap472": ((10, 10), 998, "v0.0.2-audioset/passt-s-f128-p16-s10-ap.472.pt"),
    "passt_s_p16_s12_128_ap470": ((12, 12), 998, "v0.0.2-audioset/passt-s-f128-p16-s12-ap.470.pt"),
    "passt_s_swa_p16_s12_128_ap473": ((12, 12), 998, "v0.0.2-audioset/passt-s-f128-p16-s12-ap.473-swa.pt"),
    "passt_s_p16_s14_128_ap469": ((14, 14), 998, "v0.0.2-audioset/passt-s-f128-p16-s14-ap.469.pt"),
    "passt_s_swa_p16_s14_128_ap471": ((14, 14), 998, "v0.0.2-audioset/passt-s-f128-p16-s14-ap.471-swa.pt"),
    "passt_s_p16_s16_128_ap468": ((16, 16), 998, "v0.0.2-audioset/passt-s-f128-p16-s16-ap.468.pt"),
    "passt_s_swa_p16_s16_128_ap473": ((16, 16), 998, "v0.0.2-audioset/passt-s-f128-p16-s16-ap.473-swa.pt"),
    "passt_s_swa_f128_stfthop100_p16_s10_ap473": ((10, 10), 3200, "v0.0.3-audioset/passt-s-f128-stfthop100-p16-s10-ap.473-swa.pt"),
    "passt_s_swa_f128_stfthop160_p16_s10_ap473": ((10, 10), 2000, "v0.0.3-audioset/passt-s-f128-stfthop160-p16-s10-ap.473-swa.pt"),
    "passt_s_f128_20sec_p16_s10_ap474_swa": ((10, 10), 2000, "v0.0.5/passt-s-f128-20sec-p16-s10-ap.474-swa.pt"),
    "passt_s_f128_30sec_p16_s10_ap473_swa": ((10, 10), 3000, "v0.0.5/passt-s-f128-30sec-p16-s10-ap.473-swa.pt"),
}
PASST_VARIANTS = {
    name: {
        "stride": stride,
        "img_size": (128, t_frames),
        "url": f"{_PASST_RELEASES}/{path}",
        "num_classes": 527,
    }
    for name, (stride, t_frames, path) in PASST_VARIANTS.items()
}


def fetch_passt_checkpoint(name: str, cache_dir: "Optional[str]" = None) -> str:
    """Download a variant's torch checkpoint to the local cache.

    The reference fetches pretrained weights through timm's
    ``build_model_with_cfg`` URL machinery
    (``src/models/passt/vit_helpers.py:227-261``, ``passt.py:1073-1232``);
    this is the equivalent: resolve ``PASST_VARIANTS[name]['url']``,
    download once (atomic rename; an existing file is honoured), return
    the local path. Raises ``urllib.error.URLError`` on egress-less
    hosts — download elsewhere and pass the file to
    :func:`load_pretrained_passt_params` via ``path=``.
    """
    import urllib.request

    if name not in PASST_VARIANTS:
        raise ValueError(f"unknown PaSST variant {name!r}; know {sorted(PASST_VARIANTS)}")
    url = PASST_VARIANTS[name]["url"]
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "transformer4sed_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    dst = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
    if os.path.exists(dst):
        return dst
    tmp = f"{dst}.tmp{os.getpid()}"
    try:
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dst)
    except BaseException:
        # failed/interrupted download: never leave a multi-hundred-MB
        # orphan behind, and never let a partial file become `dst`
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return dst


def load_pretrained_passt_params(
    name: str = "passt_s_swa_p16_128_ap476",
    cache_dir: "Optional[str]" = None,
    path: "Optional[str]" = None,
    depth: "Optional[int]" = None,
):
    """Fetch (or reuse ``path``) + import a variant's weights as flax params.

    The full parity point for the reference's pretrained-load path
    (``passt_sed.py:108-115``): checkpoint URL -> state_dict ->
    :func:`utils.torch_import.convert_passt_backbone` tree. Works
    without torch installed (native ``.pt`` reader).
    """
    from transformer4sed_tpu.utils.torch_import import (
        convert_passt_backbone,
        load_torch_state_dict,
    )

    path = path or fetch_passt_checkpoint(name, cache_dir)
    return convert_passt_backbone(load_torch_state_dict(path), depth=depth)


def create_passt(name: str = "passt_s_swa_p16_128_ap476", **overrides) -> "PaSST":
    """Build a named PaSST variant (flax module only — weights via
    :func:`load_pretrained_passt_params` or an offline checkpoint)."""
    if name not in PASST_VARIANTS:
        raise ValueError(f"unknown PaSST variant {name!r}; know {sorted(PASST_VARIANTS)}")
    cfg = PASST_VARIANTS[name]
    kwargs = dict(
        embed_dim=768, depth=12, num_heads=12, patch_size=(16, 16),
        stride=cfg["stride"], img_size=cfg["img_size"], distilled=True,
    )
    kwargs.update(overrides)
    return PaSST(**kwargs)
