"""Frequency-pooling modules (reference ``src/models/pooling.py:7-107``).

``AttentionPooling``: a learned query token cross-attends the frequency
axis via standard MHA. ``FrequencyWiseTransformerPooling``: a tag token
prepended to the frequency sequence, two ViT blocks, LayerNorm, take
the tag token (the reference version hardcodes ``.cuda()`` — gone
here). All operate on [N, F, D] -> [N, D].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from transformer4sed_tpu.models.vit import Block, trunc_normal_init


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
        )(query, x, x)
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
            h = Block(num_heads=self.num_heads, mlp_ratio=4.0, dtype=self.dtype, name=f"blocks_{i}")(
                h, deterministic=deterministic
            )
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        return h[:, 0, :]
