"""Fused Transformer-XL attention Pallas kernel.

The XL decoder's hot spot is the relative-position term: computing
``q_v @ P^T`` over ~2T offsets and re-aligning it (rel-shift) costs 3x
the content attention at T=1000 (measured 51 ms vs 17 ms per layer at
B=64) because the [B, H, T, ~2T] score tensor and its skew copies are
pure HBM traffic. This kernel computes the whole XL score inside VMEM:

  * for a (batch, head, q-block) program and each key block, the
    position scores need only a [block_q + block_k]-wide strip of the
    projected position table P — sliced with one dynamic index;
  * the rel-shift becomes a *variable per-row roll* of the in-register
    [bq, bq+bk] strip product, realised as log2(bq) conditional
    ``pltpu.roll`` steps (out[r, c] = strip[r, c + (bq-1-r)]);
  * content + position stream through the same online softmax as flash
    attention — no [T, T] bias and no [T, 2T-1] tensor ever reach HBM.

Forward only; the custom VJP recomputes gradients with the blocked XLA
path (``models/xl._rel_position_scores``). Band masks fall back to
``flash_attention_bias``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _xl_kernel(
    qu_ref, qv_ref, k_ref, v_ref, p_ref, o_ref,
    *, block_k: int, seq_len: int, sm_scale: float, pad_lo: int, n_bits: int,
):
    """One (b, h, q-block) program.

    qu/qv_ref: [block_q, d]; k/v_ref: [T_pad, d]; p_ref: [P_len, d]
    (position table padded by pad_lo on the left); o_ref: [block_q, d].
    """
    # keep operands in input dtype: bf16 x bf16 -> f32 runs on the MXU at
    # full rate; sm_scale is applied to the f32 products after each dot
    qu = qu_ref[:]
    qv = qv_ref[:]
    block_q, d = qu.shape
    t_pad = k_ref.shape[0]
    num_kb = t_pad // block_k
    i0 = pl.program_id(2) * block_q
    strip_w = block_q + block_k

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, strip_w), 0)
    shift_amount = (block_q - 1) - row_ids  # per-row left roll

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        content = jnp.dot(qu, k.T, preferred_element_type=jnp.float32) * sm_scale

        # position strip: rows [pad_lo + (T-1) - (i0 + bq - 1) + j0, ... + strip_w)
        # pad_lo is chosen so this is always a multiple of 8 (sublane tile)
        strip_start = pl.multiple_of(
            pad_lo + (seq_len - 1) - (i0 + block_q - 1) + i * block_k, 8
        )
        strip = p_ref[pl.ds(strip_start, strip_w), :]
        pos = jnp.dot(qv, strip.T, preferred_element_type=jnp.float32) * sm_scale
        # variable per-row left roll by (bq-1-r): log-step decomposition
        for bit in range(n_bits):
            amt = 1 << bit
            # left-roll by amt == right-roll by (width - amt); pltpu.roll
            # requires non-negative shifts
            rolled = pltpu.roll(pos, strip_w - amt, 1)
            take = ((shift_amount >> bit) & 1) == 1
            pos = jnp.where(take, rolled, pos)
        s = content + pos[:, :block_k]

        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + i * block_k
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _xl_row_kernel(
    qu_ref, qv_ref, k_ref, v_ref, p_ref, o_ref,
    *, seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple] = None,
):
    """Full-row variant: one (b, h, q-block) program holds the whole
    [block_q, T_pad] score row in VMEM (T <= ~2048), so no online
    softmax is needed and the rel-shift roll runs once per ``group``-row
    slab over the full row instead of once per (q-block, k-block) pair.

    Per G-row slab g the needed P window starts ``coarse_g = bq-(g+1)G``
    columns further right, so the slab's strip is *loaded* at that offset
    (an aligned VMEM read, free) and only the residual per-row shift
    (G-1-j, j in [0, G)) remains for the log-step roll. G=128 measures
    fastest on v5e (MXU-shaped [128, d] strip matmuls, log2(128) rolls):
    20.7 ms vs the blocked kernel's 37.2 ms at B=64, H=12, T=1000.
    """
    qu = qu_ref[:]  # input dtype: bf16 MXU matmuls; scale applied post-dot
    qv = qv_ref[:]
    block_q, d = qu.shape
    t_pad = k_ref.shape[0]
    i0 = pl.program_id(2) * block_q
    n_bits = max(1, math.ceil(math.log2(group)))
    strip_w = t_pad + group

    content = jnp.dot(
        qu, k_ref[:].T, preferred_element_type=jnp.float32
    ) * sm_scale  # [bq, T_pad]

    strip_start0 = pl.multiple_of(pad_lo + (seq_len - 1) - (i0 + block_q - 1), 8)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (group, strip_w), 0)
    shift_amount = (group - 1) - row_ids  # residual per-row left roll

    slabs = []
    for g in range(block_q // group):
        coarse = block_q - (g + 1) * group
        strip = p_ref[pl.ds(strip_start0 + coarse, strip_w), :]
        prod = (
            jnp.dot(
                qv[g * group : (g + 1) * group],
                strip.T,
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )  # [G, T_pad + G]
        for bit in range(n_bits):
            amt = 1 << bit
            rolled = pltpu.roll(prod, strip_w - amt, 1)  # left-roll by amt
            prod = jnp.where(((shift_amount >> bit) & 1) == 1, rolled, prod)
        slabs.append(prod[:, :t_pad])
    s = content + jnp.concatenate(slabs, axis=0)

    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_pad), 1)
    valid = col < seq_len
    if band_widths is not None:
        # band-diagonal local attention (models/xl.diagonal_mask semantics:
        # row i attends [i - w//2, i + w//2) plus the diagonal) — the mask
        # is generated in-kernel from the static per-head widths, so no
        # [B, H, T, T] tensor ever exists
        # per-head width as a scalar switch over static ints (pallas kernels
        # cannot capture array constants)
        half = jax.lax.switch(
            pl.program_id(1),
            [lambda w=w: jnp.int32(w // 2) for w in band_widths],
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_pad), 0) + i0
        in_band = ((col >= row - half) & (col < row + half)) | (col == row)
        valid = valid & in_band
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.dot(e.astype(v_ref.dtype), v_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


_ROW_KERNEL_MAX_T = 2048  # [bq, T_pad] f32 scores + strips must fit VMEM


def _xl_forward(
    qu, qv, k, v, p, sm_scale, block_q=512, block_k=256, group=128,
    band_widths=None, interpret=False,
):
    """qu/qv/k/v: [B, H, T, d]; p: [H, 2T-1, d] projected position table."""
    b, h, t, d = qu.shape
    t_pad = _round_up(t, max(block_q, block_k))
    n_bits = max(1, math.ceil(math.log2(block_q)))
    use_row_kernel = t_pad <= _ROW_KERNEL_MAX_T and block_q % group == 0
    assert band_widths is None or use_row_kernel, "band masks need the row kernel"

    def pad_bhtd(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    # pad P so every strip index is in range:
    #   min start = (t-1) - (i0max + bq - 1) >= (t-1) - (t_pad - 1) = t - t_pad
    #   max end   = (t-1) + (t_pad - 1) + strip_w
    # and so strip starts are 8-aligned: start = pad_lo + t - bq (mod 8) == 0
    # (block_q/block_k are multiples of 8 and i0/j0 are block multiples)
    pad_lo = (t_pad - t) + 8
    pad_lo += (-(pad_lo + t - block_q)) % 8
    pad_hi = (t_pad - t) + block_q + block_k + 16
    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]

    if use_row_kernel:
        kernel = functools.partial(
            _xl_row_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
            band_widths=band_widths,
        )
    else:
        kernel = functools.partial(
            _xl_kernel,
            block_k=block_k,
            seq_len=t,
            sm_scale=sm_scale,
            pad_lo=pad_lo,
            n_bits=n_bits,
        )
    grid = (b, h, t_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), lambda b_, h_, qi: (b_, h_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), lambda b_, h_, qi: (b_, h_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, p_len, d), lambda b_, h_, qi: (h_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), qu.dtype),
        interpret=interpret,
    )(pad_bhtd(qu), pad_bhtd(qv), pad_bhtd(k), pad_bhtd(v), p_padded)
    return out[:, :, :t]


def _xla_xl_attention(qu, qv, k, v, p, sm_scale, band_widths=None):
    """Reference XLA path (blocked position scores) for fallback/backward."""
    from transformer4sed_tpu.models.xl import _rel_position_scores, build_band_mask

    content = jnp.einsum("bhqd,bhkd->bhqk", qu, k, preferred_element_type=jnp.float32)
    position = _rel_position_scores(
        qv.transpose(0, 2, 1, 3), p.transpose(1, 0, 2)
    )  # [B, H, T, T]
    scores = (content + position) * sm_scale
    if band_widths is not None:
        mask = jnp.asarray(build_band_mask(qu.shape[2], list(band_widths)))
        scores = jnp.where(mask[None], _NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def _on_tpu() -> bool:
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_xl_attention(qu, qv, k, v, p, sm_scale: float, band_widths=None):
    """Fused XL attention: softmax(scale*(qu K^T + relshift(qv P^T))) V.

    qu/qv: query + pos_bias_u / pos_bias_v, [B, H, T, d]; p: projected
    position table [H, 2T-1, d] (offset order [T-1 .. -(T-1)]).
    ``band_widths``: optional static per-head tuple of band-diagonal
    window widths (``models/xl.diagonal_mask`` semantics) — local
    attention generated in-kernel, no [T, T] mask materialised
    (SURVEY.md §5.7 item 2's TPU equivalent).
    """
    if _on_tpu() and (band_widths is None or _band_supported(qu.shape[2])):
        return _xl_forward(qu, qv, k, v, p, sm_scale, band_widths=band_widths)
    return _xla_xl_attention(qu, qv, k, v, p, sm_scale, band_widths)


def _band_supported(t: int, block_q: int = 512, block_k: int = 256) -> bool:
    return _round_up(t, max(block_q, block_k)) <= _ROW_KERNEL_MAX_T


def _fwd(qu, qv, k, v, p, sm_scale, band_widths):
    return flash_xl_attention(qu, qv, k, v, p, sm_scale, band_widths), (qu, qv, k, v, p)


def _bwd(sm_scale, band_widths, residuals, g):
    qu, qv, k, v, p = residuals

    def f(qu, qv, k, v, p):
        return _xla_xl_attention(qu, qv, k, v, p, sm_scale, band_widths)

    out_dtype = jax.eval_shape(f, qu, qv, k, v, p).dtype
    _, vjp = jax.vjp(f, qu, qv, k, v, p)
    return vjp(g.astype(out_dtype))


flash_xl_attention.defvjp(_fwd, _bwd)
