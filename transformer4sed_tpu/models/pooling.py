"""Frequency-pooling modules (reference ``src/models/pooling.py:7-107``).

``AttentionPooling``: a learned query token cross-attends the frequency
axis via standard MHA. ``FrequencyWiseTransformerPooling``: a tag token
prepended to the frequency sequence, two ViT blocks, LayerNorm, take
the tag token (the reference version hardcodes ``.cuda()`` — gone
here). ``MeanPool`` and ``ActivateAttention(Pooling)`` (GELU applied to
keys before the score matmul) complete the reference inventory; neither
is wired into a recipe there either. All operate on [N, F, D] -> [N, D].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer4sed_tpu.models.vit import fast_gelu, Block, trunc_normal_init


class MeanPool(nn.Module):
    """Mean over the sequence axis (pooling.py:7-15)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return jnp.mean(x, axis=1)


class AttentionPooling(nn.Module):
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        token = self.param("f_att_token", trunc_normal_init(), (1, 1, d))
        query = jnp.tile(token, (x.shape[0], 1, 1))
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=d,
            out_features=d,
            dtype=self.dtype,
            name="frequency_att",
        )(query, inputs_k=x)
        return out[:, 0, :]


class FrequencyWiseTransformerPooling(nn.Module):
    num_heads: int = 4
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        # tag token = Linear(1 -> d) applied to a ones column
        ones = jnp.ones((x.shape[0], 1, 1), dtype=x.dtype)
        tag = nn.Dense(d, name="linear_emb")(ones)
        h = jnp.concatenate([tag, x], axis=1)
        for i in range(self.depth):
            # the reference passes a PLAIN nn.LayerNorm norm_layer and no
            # qkv_bias (pooling.py:24) -> torch LN eps 1e-5 (not PaSST's
            # 1e-6) and timm 0.4.5's qkv_bias=False default
            h = Block(num_heads=self.num_heads, mlp_ratio=4.0, ln_eps=1e-5,
                      qkv_bias=False, dtype=self.dtype,
                      name=f"blocks_{i}")(h, deterministic=deterministic)
        # reference hardcodes LayerNorm(768) (pooling.py:25) — written for
        # embed_dim=768 only; the width generalisation keeps its semantics
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        return h[:, 0, :]


class ActivateAttention(nn.Module):
    """MHA variant with GELU applied to the keys before the score matmul
    (pooling.py:54-91). Unwired in the reference recipes; kept for parity.
    """

    num_heads: int = 6
    qv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        d = query.shape[-1]
        head_dim = d // self.num_heads
        scale = head_dim**-0.5

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(nn.Dense(d, use_bias=self.qv_bias, dtype=self.dtype, name="f_q")(query))
        k = split(nn.Dense(d, use_bias=True, dtype=self.dtype, name="f_k")(key))
        v = split(nn.Dense(d, use_bias=self.qv_bias, dtype=self.dtype, name="f_v")(value))
        k = fast_gelu(k)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], query.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class ActivateAttentionPooling(nn.Module):
    """Learned token query through ActivateAttention (pooling.py:94-107)."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        token = self.param("f_att_token", trunc_normal_init(), (1, 1, d))
        query = jnp.tile(token, (x.shape[0], 1, 1))
        out = ActivateAttention(num_heads=self.num_heads, dtype=self.dtype, name="frequency_att")(
            query, x, x, deterministic=deterministic
        )
        return out[:, 0, :]
