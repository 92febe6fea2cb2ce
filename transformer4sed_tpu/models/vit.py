"""ViT building blocks in flax.linen, tuned for TPU.

Reproduces the computation of the timm-style blocks the reference
models are built from (``src/models/passt/passt.py:257-363`` — Mlp,
Attention with optional bool mask, pre-norm Block, PatchEmbed) with a
TPU-friendly layout: attention is a pair of batched einsums that XLA
maps straight onto the MXU, masks are additive ``-inf`` biases, and a
``dtype`` knob runs the matmuls in bfloat16 while keeping params and
layer norms in float32.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype

LAYERNORM_EPS = 1e-6


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def fast_gelu(x):
    """erf GELU in f32 (exact reference parity); tanh approximation when
    the activation dtype is bf16. The erf/tanh difference peaks at
    4.7e-4 (x ~ 2.7) where one bf16 ulp is 0.0105 — 22x below the
    dtype's own rounding — while erf on the VPU costs more than BOTH
    MLP matmuls together (measured 2.4 ms vs 0.2 ms of GEMM for the
    HTSAT stage-1 hidden; tanh runs the whole MLP in 1.2 ms vs 2.5)."""
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class Mlp(nn.Module):
    """Two-layer GELU MLP (timm Mlp parity).

    ``lora_rank > 0`` swaps fc1/fc2 for LoRA Dense — the reference's
    lora variant adapts the MLP too, not only attention
    (``src/models/passt/passt_lora.py:42-48,170-174``); base kernels
    keep the same param paths so checkpoint import is unaffected.
    """

    hidden_features: int
    out_features: Optional[int] = None
    dropout: float = 0.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]

        def dense(features, name):
            if self.lora_rank > 0:
                from transformer4sed_tpu.models.lora import LoRADense

                return LoRADense(features, rank=self.lora_rank,
                                 alpha=self.lora_alpha, dtype=self.dtype, name=name)
            return nn.Dense(features, dtype=self.dtype, name=name)

        x = dense(self.hidden_features, "fc1")(x)
        x = fast_gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(out_features, "fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional boolean mask.

    Mask semantics match the reference (``passt.py:330-344``): ``True``
    positions are *blocked* (filled with -inf before softmax). The mask
    may be [L, S], [B, L, S] or [B, H, L, S].

    ``lora_rank > 0`` swaps the qkv and output projections for LoRA
    Dense layers (``src/models/passt/passt_lora.py:122-124``; the MLP's
    fc1/fc2 are adapted in :class:`Mlp`); base kernels keep the same
    param paths so torch checkpoint import is unaffected.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = False  # Pallas flash kernel (maskless paths on TPU)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        from transformer4sed_tpu.models.lora import LoRADense

        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5

        if self.lora_rank > 0:
            raw = LoRADense(
                3 * c, rank=self.lora_rank, alpha=self.lora_alpha,
                use_bias=self.qkv_bias, dtype=self.dtype, name="qkv",
            )(x)
        else:
            raw = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        if self.use_flash and mask is None and self.attn_drop == 0.0:
            # heads-in-lanes kernel: q/k/v are plain lane slices of the
            # Dense output, no [B,N,H,d]->[B,H,N,d] transposes (those
            # measured 4.2 ms/layer at B=64 — more than a third of the
            # attention cost)
            from transformer4sed_tpu.kernels.flash_attention import flash_attention_nhd

            out = flash_attention_nhd(
                raw[..., :c], raw[..., c : 2 * c], raw[..., 2 * c :], self.num_heads
            )
            if self.lora_rank > 0:
                out = LoRADense(
                    c, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="proj"
                )(out)
            else:
                out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        qkv = raw.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if mask is not None:
            while mask.ndim < 4:
                mask = mask[None]
            attn = jnp.where(mask, jnp.finfo(attn.dtype).min, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v)
        out = out.reshape(b, n, c)
        if self.lora_rank > 0:
            out = LoRADense(
                c, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="proj"
            )(out)
        else:
            out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-norm transformer block (timm Block parity)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = False
    # PaSST builds blocks with eps 1e-6; callers passing a plain torch
    # nn.LayerNorm norm_layer (e.g. pooling.py:24) get torch's 1e-5
    ln_eps: float = LAYERNORM_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        h = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            dtype=self.dtype,
            name="attn",
        )(h, mask=mask, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)

        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        h = Mlp(
            hidden_features=int(c * self.mlp_ratio),
            dropout=self.drop,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Overlapping conv patch embedding ([B, 1, F, T] -> [B, D, F', T']).

    kernel=patch_size, stride=stride, VALID padding — PaSST uses
    16x16 patches at stride 10 (``passt.py:282-315``).
    """

    embed_dim: int = 768
    patch_size: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (10, 10)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, C_in, F, T] -> NHWC for flax conv
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.stride,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        # -> [B, D, F', T']
        return jnp.transpose(x, (0, 3, 1, 2))
