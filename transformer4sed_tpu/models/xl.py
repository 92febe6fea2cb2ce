"""Context networks: TransformerXL rel-pos attention, Conformer, vanilla
Transformer and BiGRU decoders over the 1000-frame grid.

Parity targets in the reference:
  * ``RelPositionalEncoding`` (``src/models/transformer/transformerXL.py:40-127``):
    sinusoidal table covering positive and negative offsets
    ([+T-1 .. 0 .. -(T-1)]), input scaled by sqrt(d).
  * ``RelPositionMultiheadAttention`` (``transformerXL.py:129-560``):
    Transformer-XL Section 3.3 scoring — content term (q + u)·k plus
    position term (q + v)·R with the rel-shift trick.
  * ``TransformerXL`` block (``transformerXL.py:23-35``): the slightly
    unusual residual wiring ``x = norm1(x); x = x + attn(x); x = x +
    mlp(norm2(x))`` is preserved exactly.
  * ``ConformerEncoderLayer`` (``src/models/transformer/conformer.py:10-145``):
    macaron FFN (0.5x) -> rel-pos MHA -> GLU/depthwise conv module ->
    FFN (0.5x) -> final norm.
  * Band-diagonal attention masks (``src/models/transformer/mask.py:7-23``).

TPU notes: the rel-shift is a static gather; attention is einsum
batched over heads on the MXU; masks are additive biases. Layout is
[B, T, D] throughout (the reference's [T, B, D] permutes disappear).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transformer4sed_tpu.models.vit import Mlp


# -- masks --------------------------------------------------------------------

def diagonal_mask(seq_len: int, mask_width: int) -> np.ndarray:
    """Boolean [L, L] band mask: True = blocked, False = attendable.

    Row i allows columns [i - w//2, i + w//2) (reference
    ``mask.py:7-23`` keeps exactly that asymmetric band).
    """
    i = np.arange(seq_len)[:, None]
    j = np.arange(seq_len)[None, :]
    half = mask_width // 2
    allowed = (j >= i - half) & (j < i + half)
    # reference: row band is [max(0, i - w//2), i + w//2) — always allow j == i
    allowed |= j == i
    return ~allowed


def build_band_mask(seq_len: int, window_len) -> Optional[np.ndarray]:
    """None | int | per-head sequence -> None | [L, L] | [H, L, L] bool mask."""
    if window_len is None:
        return None
    if isinstance(window_len, int):
        return diagonal_mask(seq_len, window_len)
    return np.stack([diagonal_mask(seq_len, w) for w in window_len])


# -- relative positional encoding ----------------------------------------------

def rel_positional_encoding(seq_len: int, d_model: int) -> np.ndarray:
    """[1, 2*seq_len - 1, d] sinusoidal table for offsets [T-1 .. -(T-1)]."""
    pos = np.arange(seq_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((seq_len, d_model))
    pe_neg = np.zeros((seq_len, d_model))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)  # [2T-1, d]
    return pe[None].astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] position scores -> [B, H, T, T] aligned scores.

    out[..., i, j] = x[..., i, (T-1) - i + j] (Transformer-XL shift),
    realised with the pad/reshape *skew trick* (Music-Transformer style)
    instead of a gather: on TPU a [B,H,1000,1999] take_along_axis
    materialises multi-GB scratch (observed 2.7x padded copies + a 7.6G
    gather buffer); the skew is pure layout manipulation XLA folds into
    the surrounding fusion.
    """
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :]  # drop the first T-length row
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


def _pick_block(t: int, target: int = 128) -> int:
    """Largest divisor of t that is <= 2*target, preferring >= target."""
    best = 1
    for cand in range(1, min(t, 2 * target) + 1):
        if t % cand == 0 and cand <= 2 * target:
            best = cand
            if cand >= target:
                return cand
    return best


def _rel_position_scores(q_v: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Blocked Transformer-XL position term: [B,T,H,d] x [2T-1,H,d] ->
    [B,H,T,T] *already rel-shifted* scores.

    The naive route computes q_v @ P^T over all 2T-1 relative offsets and
    skews, materialising T*(2T-1) scores per head (the decoder's HBM hot
    spot at T=1000). For a query block of size bq only T+bq-1 offsets
    are reachable, so this computes per-block score strips
    [bq, T+bq-1] and skews each strip with the pad/reshape trick —
    ~1.8x less compute and memory for the position term.
    """
    b, t, h, d = q_v.shape
    bq = _pick_block(t)
    nq = t // bq
    if nq <= 1:
        s = jnp.einsum("bqhd,phd->bhqp", q_v, p, preferred_element_type=jnp.float32)
        return _rel_shift(s)

    width = t + bq - 1
    # block qi covers queries [qi*bq, (qi+1)*bq); needed offsets (t-1)-i+j
    # span rows [t - (qi+1)*bq + 1 - 1, ...]: start = t - (qi+1)*bq
    p_blocks = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(p, t - (qi + 1) * bq, width, axis=0) for qi in range(nq)]
    )  # [nq, width, H, d]
    qb = q_v.reshape(b, nq, bq, h, d)
    s = jnp.einsum("bnqhd,nphd->bhnqp", qb, p_blocks, preferred_element_type=jnp.float32)
    # skew each strip: out[..., r, j] = s[..., r, (bq-1) - r + j]
    sp = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 1)))  # width+1
    flat = sp.reshape(b, h, nq, bq * (width + 1))[..., : bq * width]
    y = flat.reshape(b, h, nq, bq, width)
    out = y[..., bq - 1 : bq - 1 + t]
    return out.reshape(b, h, t, t)


class RelPositionMultiheadAttention(nn.Module):
    """Transformer-XL multi-head self-attention with relative positions.

    ``use_flash`` routes the (content + position-bias) softmax through
    the Pallas flash-with-bias kernel: the [T, T] scores never hit HBM
    (the position bias is still materialised once, but scores/softmax/
    weighted-sum stay in VMEM). Band masks fold into the bias as -inf.
    """

    num_heads: int
    attn_drop: float = 0.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D] (already scaled by sqrt(d) by the pos encoder)
        pos_emb: jnp.ndarray,  # [1, 2T-1, D]
        mask: Optional[jnp.ndarray] = None,  # bool, [T,T] | [H,T,T] | [B,H,T,T]; True = blocked
        deterministic: bool = True,
        band_widths: Optional[tuple] = None,  # static per-head band widths (local attn)
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        scale = hd ** -0.5

        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="in_proj")(x)
        q_flat, k_flat, v_flat = jnp.split(qkv, 3, axis=-1)  # [B, T, D] lane views
        q = q_flat.reshape(b, t, h, hd)
        k = k_flat.reshape(b, t, h, hd)
        v = v_flat.reshape(b, t, h, hd)

        p = nn.Dense(d, use_bias=False, dtype=self.dtype, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, h, hd)  # [1, 2T-1, H, hd]

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, hd))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, hd))

        if self.use_flash and self.attn_drop == 0.0 and mask is None:
            # fully-fused XL kernel in the heads-in-lanes layout: q/k/v go
            # in as the [B, T, D] projection slices (the head transposes +
            # the two (q + pos_bias) materialisations measured 3.6 ms per
            # layer at B=64); pos_bias_u/v are added per head in-kernel.
            # band_widths turns it into local attention (mask generated
            # in-kernel, no [T, T] tensor)
            from transformer4sed_tpu.kernels.xl_attention import flash_xl_attention_nhd

            out = flash_xl_attention_nhd(
                q_flat, k_flat, v_flat,
                bias_u, bias_v,
                p[0].transpose(1, 0, 2),  # [H, 2T-1, hd] (small tensor)
                h, scale, band_widths,
            )
            return nn.Dense(d, use_bias=True, dtype=self.dtype, name="out_proj")(out)

        if band_widths is not None and mask is None:
            # non-fused paths consume the band as an explicit mask
            mask = jnp.asarray(build_band_mask(t, list(band_widths)))

        position = _rel_position_scores(q + bias_v, p[0])  # [B, H, T, T], pre-shifted

        if self.use_flash and self.attn_drop == 0.0:
            # masked path: fold position + band mask into an additive bias
            from transformer4sed_tpu.kernels.flash_attention import flash_attention_bias

            bias = position * scale
            m = mask
            while m.ndim < 4:
                m = m[None]
            bias = jnp.where(m, -1e30, bias)
            bias = jnp.broadcast_to(bias, (b, h, t, t))
            out = flash_attention_bias(
                (q + bias_u).transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias,
                scale,
            ).transpose(0, 2, 1, 3).reshape(b, t, d)
            return nn.Dense(d, use_bias=True, dtype=self.dtype, name="out_proj")(out)

        content = jnp.einsum(
            "bqhd,bkhd->bhqk", q + bias_u, k, preferred_element_type=jnp.float32
        )
        scores = (content + position) * scale

        if mask is not None:
            m = mask
            while m.ndim < 4:
                m = m[None]
            scores = jnp.where(m, jnp.finfo(scores.dtype).min, scores)

        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v).reshape(b, t, d)
        return nn.Dense(d, use_bias=True, dtype=self.dtype, name="out_proj")(out)


class TransformerXLBlock(nn.Module):
    """XL block with the reference's residual wiring (``transformerXL.py:31-35``)."""

    num_heads: int
    mlp_ratio: float = 1.0
    attn_drop: float = 0.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True, band_widths=None):
        d = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + RelPositionMultiheadAttention(
            num_heads=self.num_heads, attn_drop=self.attn_drop,
            use_flash=self.use_flash, dtype=self.dtype, name="attn",
        )(x, pos_emb, mask=mask, deterministic=deterministic, band_widths=band_widths)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Mlp(hidden_features=int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            h, deterministic=deterministic
        )
        return x


class TransformerXLDecoder(nn.Module):
    """Stack of XL blocks with optional band-diagonal attention masks."""

    decoder_layer_num: int = 2
    num_heads: int = 12
    mlp_ratio: float = 1.0
    attn_drop: float = 0.0
    seq_len: int = 1000
    window_len: Optional[Union[int, Sequence[int]]] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, d = x.shape
        pe = jnp.asarray(rel_positional_encoding(self.seq_len, d))
        center = pe.shape[1] // 2
        pos_emb = jax.lax.dynamic_slice(pe, (0, center - t + 1, 0), (1, 2 * t - 1, d))
        x = x * math.sqrt(d)
        mask, band_widths = None, None
        if self.window_len is not None:
            if self.use_flash and self.attn_drop == 0.0:
                # static widths -> in-kernel local attention, no [T, T] mask
                wl = self.window_len
                band_widths = (
                    (int(wl),) * self.num_heads if isinstance(wl, int) else tuple(int(w) for w in wl)
                )
            else:
                mask = jnp.asarray(build_band_mask(t, self.window_len))
        for i in range(self.decoder_layer_num):
            x = TransformerXLBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                attn_drop=self.attn_drop,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"encoder_blocks_{i}",
            )(x, pos_emb, mask=mask, deterministic=deterministic, band_widths=band_widths)
        return x


class ConvolutionModule(nn.Module):
    """Conformer convolution module: pointwise-GLU -> depthwise -> LN -> swish -> pointwise."""

    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, D]
        d = x.shape[-1]
        h = nn.Dense(2 * d, dtype=self.dtype, name="pointwise_conv1")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)  # GLU
        h = nn.Conv(
            features=d,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=d,
            dtype=self.dtype,
            name="depthwise_conv",
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        h = h * jax.nn.sigmoid(h)  # swish
        return nn.Dense(d, dtype=self.dtype, name="pointwise_conv2")(h)


class ConformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 1.0
    kernel_size: int = 31
    dropout: float = 0.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True, band_widths=None):
        d = x.shape[-1]
        ff_dim = int(d * self.mlp_ratio)

        def ff(name, h):
            h = nn.Dense(ff_dim, dtype=self.dtype, name=f"{name}_1")(h)
            h = h * jax.nn.sigmoid(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            return nn.Dense(d, dtype=self.dtype, name=f"{name}_2")(h)

        x = x + 0.5 * ff("feed_forward_macaron", nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x))
        h = nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x)
        x = x + RelPositionMultiheadAttention(
            num_heads=self.num_heads, use_flash=self.use_flash,
            dtype=self.dtype, name="self_attn",
        )(h, pos_emb, mask=mask, deterministic=deterministic, band_widths=band_widths)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x)
        x = x + ConvolutionModule(kernel_size=self.kernel_size, dtype=self.dtype, name="conv_module")(h)
        x = x + 0.5 * ff("feed_forward", nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x))
        return nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)


class ConformerDecoder(nn.Module):
    decoder_layer_num: int = 2
    num_heads: int = 12
    mlp_ratio: float = 1.0
    kernel_size: int = 31
    seq_len: int = 1000
    window_len: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, d = x.shape
        pe = jnp.asarray(rel_positional_encoding(self.seq_len, d))
        center = pe.shape[1] // 2
        pos_emb = jax.lax.dynamic_slice(pe, (0, center - t + 1, 0), (1, 2 * t - 1, d))
        x = x * math.sqrt(d)
        mask, band_widths = None, None
        if self.window_len is not None:
            if self.use_flash:
                wl = self.window_len
                band_widths = (
                    (int(wl),) * self.num_heads if isinstance(wl, int) else tuple(int(w) for w in wl)
                )
            else:
                mask = jnp.asarray(build_band_mask(t, self.window_len))
        for i in range(self.decoder_layer_num):
            x = ConformerBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                kernel_size=self.kernel_size,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, pos_emb, mask=mask, deterministic=deterministic, band_widths=band_widths)
        return x


class TransformerDecoder(nn.Module):
    """Vanilla ViT-block decoder with (unused-in-forward) abs pos table.

    The reference computes a sincos/learnable table but never adds it in
    ``forward`` (``src/models/transformer_decoder.py:46-51`` even
    references an undefined ``self.linear_pos`` — the path is dead
    upstream); we keep an ``add_pos_embed`` switch, default False for
    parity. Blocks are built with a PLAIN ``nn.LayerNorm`` norm_layer
    and timm's Block defaults (``transformer_decoder.py:32-35``) ->
    qkv_bias False, LN eps 1e-5.
    """

    decoder_layer_num: int = 2
    num_heads: int = 12
    mlp_ratio: float = 1.0
    seq_len: int = 1000
    attn_drop: float = 0.0
    add_pos_embed: bool = False
    qkv_bias: bool = False
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from transformer4sed_tpu.models.vit import Block

        if self.add_pos_embed:
            t, d = x.shape[1], x.shape[2]
            pos = jnp.asarray(_sincos_1d(self.seq_len, d))[:t]
            x = x + pos[None]
        for i in range(self.decoder_layer_num):
            x = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                attn_drop=self.attn_drop,
                qkv_bias=self.qkv_bias,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)
        return x


def _sincos_1d(seq_len: int, d: int) -> np.ndarray:
    omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
    omega = 1.0 / 10000 ** omega
    pos = np.arange(seq_len, dtype=np.float64)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


class BiGRUDecoder(nn.Module):
    """Bidirectional multi-layer GRU decoder (reference 'gru' option).

    Implemented with ``nn.RNN`` over a GRUCell per direction; output dim
    is 2*D like torch's bidirectional GRU.
    """

    hidden_dim: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = x
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden_dim, dtype=self.dtype), name=f"gru_fwd_{i}")(h)
            bwd = nn.RNN(
                nn.GRUCell(self.hidden_dim, dtype=self.dtype), reverse=True, keep_order=True,
                name=f"gru_bwd_{i}",
            )(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        return h


class RelPositionMHAWithClsToken(nn.Module):
    """XL attention for sequences with ``cls_num`` class tokens appended at
    the END (reference ``transformerxl_token.py:13-160``): frame-frame
    positions use the normal rel-shifted scores; frame->cls, cls->frame
    and cls->cls relations each get one learned per-head constant
    (``cls_pos_emb`` rows 0/1/2)."""

    num_heads: int
    cls_num: int
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True):
        b, t_total, d = x.shape
        h = self.num_heads
        hd = d // h
        t = t_total - self.cls_num
        scale = hd ** -0.5

        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t_total, h, hd)
        k = k.reshape(b, t_total, h, hd)
        v = v.reshape(b, t_total, h, hd)

        p = nn.Dense(d, use_bias=False, dtype=self.dtype, name="linear_pos")(pos_emb)
        p = p.reshape(-1, h, hd)[: 2 * t - 1]

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, hd))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, hd))
        cls_pos = self.param("cls_pos_emb", trunc_normal_init_xl(), (3, h))

        content = jnp.einsum(
            "bqhd,bkhd->bhqk", q + bias_u, k, preferred_element_type=jnp.float32
        )
        frame_bd = _rel_position_scores((q + bias_v)[:, :t], p)  # [B,H,t,t]
        bd = jnp.zeros((b, h, t_total, t_total), jnp.float32)
        bd = bd.at[:, :, :t, :t].set(frame_bd)
        bd = bd.at[:, :, :t, t:].set(cls_pos[0].reshape(1, h, 1, 1))
        bd = bd.at[:, :, t:, :t].set(cls_pos[1].reshape(1, h, 1, 1))
        bd = bd.at[:, :, t:, t:].set(cls_pos[2].reshape(1, h, 1, 1))

        scores = (content + bd) * scale
        if mask is not None:
            m = mask
            while m.ndim < 4:
                m = m[None]
            scores = jnp.where(m, jnp.finfo(scores.dtype).min, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v).reshape(b, t_total, d)
        return nn.Dense(d, use_bias=True, dtype=self.dtype, name="out_proj")(out)


def trunc_normal_init_xl(std: float = 0.02):
    import flax.linen as _nn

    return _nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class TransformerXLWithClsToken(nn.Module):
    """XL block over [frames..., cls tokens] (reference block wiring)."""

    num_heads: int
    cls_num: int
    mlp_ratio: float = 1.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True):
        d = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + RelPositionMHAWithClsToken(
            num_heads=self.num_heads, cls_num=self.cls_num, attn_drop=self.attn_drop,
            dtype=self.dtype, name="attn",
        )(x, pos_emb, mask=mask, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Mlp(hidden_features=int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            h, deterministic=deterministic
        )
        return x


class VanillaCrossAttention(nn.Module):
    """Separate-projection cross attention (``src/models/transformer/
    vanilla.py:4-31``): distinct ``f_q``/``f_k``/``f_v`` Dense layers
    (no bias by default, matching the reference's ``qkv_bias=False``),
    softmax over source positions, output projection.

    The reference reshapes k/v with q's length and so requires equal
    lengths; here source length may differ (q decides the output grid).
    """

    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        b, n, c = q.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        qh = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="f_q")(q)
        kh = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="f_k")(k)
        vh = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="f_v")(v)
        qh = qh.reshape(b, n, h, hd)
        kh = kh.reshape(b, k.shape[1], h, hd)
        vh = vh.reshape(b, v.shape[1], h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class VanillaCrossAttentionBlock(nn.Module):
    """Cross-attention block with the reference's unusual wiring
    (``src/models/transformer/vanilla.py:34-60``): one shared ``norm1``
    applied to q, k AND v, the attention residual taken from **v** (not
    q — flagged by the reference's own TODO comment), then a standard
    pre-norm MLP residual. Preserved exactly so checkpoints/behavior
    match if the block is ever wired in (it is dead code in the
    reference — no importers — but part of the §2.2 inventory).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        x = v + VanillaCrossAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, name="attn",
        )(norm1(q), norm1(k), norm1(v), deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Mlp(
            hidden_features=int(x.shape[-1] * self.mlp_ratio),
            dropout=self.drop, dtype=self.dtype, name="mlp",
        )(h, deterministic=deterministic)
        return x
