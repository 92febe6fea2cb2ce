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
    attention — no [T, T] bias and no [T, 2T-1] tensor ever reach HBM;
  * the full-row variant (T <= 2048) holds the whole score row in VMEM
    and computes position strips in 128-row slabs loaded at slab-aligned
    offsets, leaving only a residual log-step roll;
  * static per-head ``band_widths`` turn it into band-diagonal local
    attention with the mask generated in-kernel (no [T, T] tensor).

The custom VJP is fully Pallas too (FlashAttention-style recompute from
saved O + LSE): a dq kernel produces dQu/dQv and accumulates dP into a
per-head output block revisited across the grid (the rel-shift backward
is the inverse right-roll of dS against the same strips), and a dkv
kernel produces dK/dV. Measured fwd+bwd 13.4 ms vs 35.4 ms for the
XLA-recompute backward (B=12, H=12, T=1000, v5e). Long rows fall back
to the blocked forward kernel + XLA-recompute backward.
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
    block_q = qu_ref.shape[0]
    s = _row_scores(
        qu_ref[:], qv_ref[:], k_ref, p_ref,
        seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
        band_widths=band_widths, i0=pl.program_id(2) * block_q,
        h_index=pl.program_id(1),
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.dot(e.astype(v_ref.dtype), v_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _roll_rows_left(x, shift_amount, width, n_bits):
    """out[j, m] = x[j, m + shift_amount[j]] (mod width), via log-step rolls."""
    for bit in range(n_bits):
        amt = 1 << bit
        rolled = pltpu.roll(x, width - amt, 1)  # left-roll by amt
        x = jnp.where(((shift_amount >> bit) & 1) == 1, rolled, x)
    return x


def _roll_rows_right(x, shift_amount, n_bits):
    """out[j, m] = x[j, m - shift_amount[j]] (mod width): inverse of left."""
    for bit in range(n_bits):
        amt = 1 << bit
        rolled = pltpu.roll(x, amt, 1)  # right-roll by amt
        x = jnp.where(((shift_amount >> bit) & 1) == 1, rolled, x)
    return x


def _valid_mask(seq_len, shape, i0, h_index, band_widths, col0=0):
    """col-validity (+ optional per-head band) mask for score rows [i0, ...)
    and columns [col0, ...)."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    valid = col < seq_len
    if band_widths is not None:
        # band-diagonal local attention (models/xl.diagonal_mask semantics:
        # row i attends [i - w//2, i + w//2) plus the diagonal). Per-head
        # width via a scalar switch over static ints (pallas kernels cannot
        # capture array constants).
        half = jax.lax.switch(
            h_index, [lambda w=w: jnp.int32(w // 2) for w in band_widths]
        )
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i0
        in_band = ((col >= row - half) & (col < row + half)) | (col == row)
        valid = valid & in_band
    return valid


def _row_scores(qu, qv, k_ref, p_ref, *, seq_len, sm_scale, pad_lo, group,
                band_widths, i0, h_index):
    """Masked scores [bq, T_pad] for query rows [i0, i0 + bq).

    Content + slab-grouped position strips + residual log-step roll —
    shared by the forward kernels and the backward recompute.
    """
    block_q, d = qu.shape
    t_pad = k_ref.shape[0]
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
        prod = _roll_rows_left(prod, shift_amount, strip_w, n_bits)
        slabs.append(prod[:, :t_pad])
    s = content + jnp.concatenate(slabs, axis=0)

    valid = _valid_mask(seq_len, (block_q, t_pad), i0, h_index, band_widths)
    return jnp.where(valid, s, _NEG_INF)


def _xl_row_lse_kernel(
    qu_ref, qv_ref, k_ref, v_ref, p_ref, o_ref, lse_ref,
    *, seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple] = None,
):
    """Row kernel variant that also emits the log-sum-exp per query row,
    enabling the fully-Pallas backward (scores are recomputed there from
    the saved LSE, FlashAttention-style)."""
    block_q = qu_ref.shape[0]
    s = _row_scores(
        qu_ref[:], qv_ref[:], k_ref, p_ref,
        seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
        band_widths=band_widths, i0=pl.program_id(2) * block_q,
        h_index=pl.program_id(1),
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.dot(e.astype(v_ref.dtype), v_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _xl_bwd_dq_kernel(
    qu_ref, qv_ref, k_ref, v_ref, p_ref, do_ref, lse_ref, delta_ref,
    dqu_ref, dqv_ref, dp_ref, dk_ref, dv_ref,
    *, seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple],
):
    """One (h, b, q-block) program: dQu, dQv for the block, this block's
    dP contribution accumulated into a per-head [p_len, d] output the
    grid revisits (h is the slowest grid dim, so all (b, q-block) steps
    for a head are consecutive) — AND, fused since r4, the block's
    dK/dV contributions accumulated into full-[T_pad] f32 outputs
    revisited across q-blocks. The former separate dK/dV kernel
    re-derived the full content+BD score strip per kv block (the single
    most expensive recompute in the backward); here the [bq, T_pad]
    strip is computed once and serves all five cotangents. dK flows only
    through the content (AC) term — the BD term involves P, not K.

    The rel-shift backward is the exact inverse of the forward slab roll:
    dS rows are right-rolled by the same per-row residual shift, then one
    matmul against the slab's P strip gives dQv and one transposed matmul
    against Qv scatters into dP at the (aligned) strip offset.
    """
    h_index = pl.program_id(0)
    block_q = qu_ref.shape[0]
    i0 = pl.program_id(2) * block_q
    qv = qv_ref[:]
    t_pad = k_ref.shape[0]
    n_bits = max(1, math.ceil(math.log2(group)))
    strip_w = t_pad + group

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _init():
        dp_ref[:] = jnp.zeros_like(dp_ref)

    s = _row_scores(
        qu_ref[:], qv, k_ref, p_ref,
        seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
        band_widths=band_widths, i0=i0, h_index=h_index,
    )
    lse = lse_ref[:].reshape(-1, 1)
    delta = delta_ref[:].reshape(-1, 1)
    a = jnp.exp(s - lse)  # [bq, T_pad]
    do = do_ref[:]
    dov = jnp.dot(do, v_ref[:].T, preferred_element_type=jnp.float32)
    ds = a * (dov - delta)  # [bq, T_pad] f32
    ds_lp = ds.astype(qu_ref.dtype)
    dqu_ref[:] = (
        jnp.dot(ds_lp, k_ref[:], preferred_element_type=jnp.float32) * sm_scale
    ).astype(dqu_ref.dtype)

    # fused dK/dV: padded q rows carry do=0 -> ds=0, contribute nothing
    first_q = pl.program_id(2) == 0
    dv_c = jax.lax.dot_general(
        a.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_c = jax.lax.dot_general(
        ds_lp, qu_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale

    @pl.when(first_q)
    def _():
        dv_ref[:] = dv_c
        dk_ref[:] = dk_c

    @pl.when(jnp.logical_not(first_q))
    def _():
        dv_ref[:] += dv_c
        dk_ref[:] += dk_c

    strip_start0 = pl.multiple_of(pad_lo + (seq_len - 1) - (i0 + block_q - 1), 8)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (group, strip_w), 0)
    shift_amount = (group - 1) - row_ids
    for g in range(block_q // group):
        coarse = block_q - (g + 1) * group
        # d_prod[j, m] = ds[j, m - shift(j)]: zero-pad right, roll right
        padded = jnp.pad(ds[g * group : (g + 1) * group], ((0, 0), (0, group)))
        d_prod = _roll_rows_right(padded, shift_amount, n_bits)  # [G, W]
        d_prod_lp = d_prod.astype(qu_ref.dtype)
        strip = p_ref[pl.ds(strip_start0 + coarse, strip_w), :]
        dqv_ref[g * group : (g + 1) * group, :] = (
            jnp.dot(d_prod_lp, strip, preferred_element_type=jnp.float32) * sm_scale
        ).astype(dqv_ref.dtype)
        # dP[strip rows] += scale * d_prod^T @ qv_slab
        contrib = jax.lax.dot_general(
            d_prod_lp, qv[g * group : (g + 1) * group],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [W, d]
        idx = pl.ds(strip_start0 + coarse, strip_w)
        dp_ref[idx, :] += contrib


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


def _geometry(t: int, block_q: int, block_k: int):
    """(t_pad, pad_lo, pad_hi): shared by forward and backward so strip
    coordinates line up. pad_lo congruence makes every strip start a
    multiple of 8 (sublane tile)."""
    t_pad = _round_up(t, max(block_q, block_k))
    pad_lo = (t_pad - t) + 8
    pad_lo += (-(pad_lo + t - block_q)) % 8
    pad_hi = (t_pad - t) + block_q + block_k + 16
    return t_pad, pad_lo, pad_hi


def _xl_forward_lse(
    qu, qv, k, v, p, sm_scale, block_q=512, block_k=256, group=128,
    band_widths=None, interpret=False,
):
    """Row-kernel forward that also returns LSE [B, H, T_pad] (f32)."""
    b, h, t, d = qu.shape
    t_pad, pad_lo, pad_hi = _geometry(t, block_q, block_k)

    def pad_bhtd(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]
    grid = (b, h, t_pad // block_q)
    row = lambda b_, h_, qi: (b_, h_, qi, 0)
    full = lambda b_, h_, qi: (b_, h_, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(
            _xl_row_lse_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo,
            group=group, band_widths=band_widths,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, p_len, d), lambda b_, h_, qi: (h_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, None, None, block_q),
                lambda b_, h_, qi: (b_, h_, 0, qi),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d), qu.dtype),
            # [B, H, 1, T_pad]: the unit dim keeps Mosaic's last-two-dims
            # block constraint satisfied when slicing the T axis
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
        interpret=interpret,
    )(pad_bhtd(qu), pad_bhtd(qv), pad_bhtd(k), pad_bhtd(v), p_padded)
    return out[:, :, :t], lse


def _xl_backward(
    qu, qv, k, v, p, o, lse, g, sm_scale,
    block_q=512, block_k=256, group=128,
    band_widths=None, interpret=False,
):
    """Fully-Pallas XL backward: (dqu, dqv, dk, dv, dp) from saved O+LSE."""
    b, h, t, d = qu.shape
    t_pad, pad_lo, pad_hi = _geometry(t, block_q, block_k)
    n_pos = p.shape[1]  # 2T - 1

    def pad_bhtd(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]
    qu_p, qv_p, k_p, v_p = pad_bhtd(qu), pad_bhtd(qv), pad_bhtd(k), pad_bhtd(v)
    g_p = pad_bhtd(g.astype(qu.dtype))
    o_p = pad_bhtd(o)
    delta = jnp.sum(
        g_p.astype(jnp.float32) * o_p.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, H, 1, T_pad]

    # ONE fused kernel — grid (h, b, qi): h slowest so the per-head dP
    # block is revisited consecutively for accumulation; dK/dV accumulate
    # across the (innermost) q-blocks per (h, b). The former separate
    # dK/dV pass re-derived the full content+BD score strip per kv block;
    # fusing halves the score recompute.
    qrow = lambda h_, b_, qi: (b_, h_, qi, 0)
    qfull = lambda h_, b_, qi: (b_, h_, 0, 0)
    qvec = lambda h_, b_, qi: (b_, h_, 0, qi)
    dqu, dqv, dp, dk, dv = pl.pallas_call(
        functools.partial(
            _xl_bwd_dq_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo,
            group=group, band_widths=band_widths,
        ),
        grid=(h, b, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, p_len, d), lambda h_, b_, qi: (h_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, None, block_q), qvec, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, None, block_q), qvec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, None, block_q, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, p_len, d), lambda h_, b_, qi: (h_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad, d), qfull, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # cotangents must carry their own primal's dtype (qu/qv are
            # often f32 via the pos_bias adds while k/v stay bf16)
            jax.ShapeDtypeStruct((b, h, t_pad, d), qu.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, d), qv.dtype),
            jax.ShapeDtypeStruct((h, p_len, d), jnp.float32),
            # dK/dV accumulate across q-blocks — f32 until the final cast
            jax.ShapeDtypeStruct((b, h, t_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, t_pad, d), jnp.float32),
        ),
        interpret=interpret,
    )(qu_p, qv_p, k_p, v_p, p_padded, g_p, lse, delta)

    unpad = lambda x: x[:, :, :t]
    dp_out = dp[:, pad_lo : pad_lo + n_pos].astype(p.dtype)
    return (unpad(dqu), unpad(dqv), unpad(dk).astype(k.dtype),
            unpad(dv).astype(v.dtype), dp_out)


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
    if _on_tpu() and _band_supported(qu.shape[2]):
        out, lse = _xl_forward_lse(qu, qv, k, v, p, sm_scale, band_widths=band_widths)
        return out, (qu, qv, k, v, p, out, lse)
    return (
        _xla_xl_attention(qu, qv, k, v, p, sm_scale, band_widths),
        (qu, qv, k, v, p, None, None),
    )


def _bwd(sm_scale, band_widths, residuals, g):
    qu, qv, k, v, p, o, lse = residuals
    if o is not None and _on_tpu():
        return _xl_backward(
            qu, qv, k, v, p, o, lse, g, sm_scale, band_widths=band_widths
        )

    def f(qu, qv, k, v, p):
        return _xla_xl_attention(qu, qv, k, v, p, sm_scale, band_widths)

    out_dtype = jax.eval_shape(f, qu, qv, k, v, p).dtype
    _, vjp = jax.vjp(f, qu, qv, k, v, p)
    return vjp(g.astype(out_dtype))


flash_xl_attention.defvjp(_fwd, _bwd)

# -- heads-in-lanes XL attention (no HBM transposes on inference) -----------------
#
# Mirrors kernels/flash_attention.py:flash_attention_nhd: the
# [B,N,H,d]->[B,H,N,d] transposes around flash_xl_attention (4 inputs +
# output, plus the two full-tensor (q + pos_bias) materialisations)
# measured 3.6 ms per XL layer at B=64/T=1000 — ~11 ms across the 3-layer
# decoder. This variant takes q/k/v in the model's [B, T, H*d] layout
# (lane slices of the projections), adds pos_bias_u/v per head INSIDE
# the kernel, and runs a (batch, head-pair, q-block) grid with 128-lane
# blocks. Differentiated calls route through the transposed kernel pair
# so the fully-Pallas saved-O/LSE backward is reused unchanged.


def _xl_row_nhd_kernel(
    q_ref, k_ref, v_ref, *rest,
    seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple], d: int,
):
    # rest = hpb per-head position refs (separate operands with static
    # head index maps — a `.at[j]` sub-ref of one [hpb, P, d] block
    # produced misaligned Mosaic memref slices), then bu, bv, o_ref
    block_q = q_ref.shape[0]
    hpb = q_ref.shape[1] // d
    p_refs = rest[:hpb]
    bu_ref, bv_ref, o_ref = rest[hpb], rest[hpb + 1], rest[hpb + 2]
    i0 = pl.program_id(2) * block_q
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        q = q_ref[:, sl]
        # bias add in f32, cast back to the matmul dtype (the transposed
        # path adds in f32 before its cast; one extra q rounding here is
        # below bf16 resolution)
        qu = (q.astype(jnp.float32) + bu_ref[j].astype(jnp.float32)).astype(q.dtype)
        qv = (q.astype(jnp.float32) + bv_ref[j].astype(jnp.float32)).astype(q.dtype)
        s = _row_scores(
            qu, qv, k_ref[:, sl], p_refs[j],
            seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
            band_widths=band_widths, i0=i0,
            h_index=pl.program_id(1) * hpb + j,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        v = v_ref[:, sl]
        acc = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[:, sl] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _xl_nhd_forward(
    q, k, v, bias_u, bias_v, p, num_heads, sm_scale,
    block_q=512, group=128, band_widths=None, interpret=False,
):
    """q/k/v: [B, T, H*d]; bias_u/v: [H, d]; p: [H, 2T-1, d]."""
    b, t, c = q.shape
    d = c // num_heads
    hpb = min(max(128 // d, 1), num_heads)
    t_pad, pad_lo, pad_hi = _geometry(t, block_q, 256)

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]
    lane = hpb * d
    grid = (b, num_heads // hpb, t_pad // block_q)

    qspec = pl.BlockSpec(
        (None, block_q, lane), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (None, t_pad, lane), lambda bi, hi, qi: (bi, 0, hi), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _xl_row_nhd_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo,
            group=group, band_widths=band_widths, d=d,
        ),
        grid=grid,
        in_specs=[
            qspec,
            kvspec,
            kvspec,
            *[
                pl.BlockSpec(
                    (None, p_len, d),
                    functools.partial(lambda bi, hi, qi, j: (hi * hpb + j, 0, 0), j=j),
                    memory_space=pltpu.VMEM,
                )
                for j in range(hpb)
            ],
            pl.BlockSpec((hpb, 1, d), lambda bi, hi, qi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hpb, 1, d), lambda bi, hi, qi: (hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        interpret=interpret,
    )(pad_t(q), pad_t(k), pad_t(v), *([p_padded] * hpb),
      bias_u.reshape(num_heads, 1, d), bias_v.reshape(num_heads, 1, d))
    return out[:, :t]


def _xl_row_nhd_lse_kernel(
    q_ref, k_ref, v_ref, *rest,
    seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple], d: int,
):
    """The nhd row kernel, additionally emitting per-head LSE rows —
    enables the fully heads-in-lanes differentiated path (the backward
    recomputes scores from the saved LSE, FlashAttention-style)."""
    block_q = q_ref.shape[0]
    hpb = q_ref.shape[1] // d
    p_refs = rest[:hpb]
    bu_ref, bv_ref, o_ref, lse_ref = rest[hpb], rest[hpb + 1], rest[hpb + 2], rest[hpb + 3]
    i0 = pl.program_id(2) * block_q
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        q = q_ref[:, sl]
        qu = (q.astype(jnp.float32) + bu_ref[j].astype(jnp.float32)).astype(q.dtype)
        qv = (q.astype(jnp.float32) + bv_ref[j].astype(jnp.float32)).astype(q.dtype)
        s = _row_scores(
            qu, qv, k_ref[:, sl], p_refs[j],
            seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
            band_widths=band_widths, i0=i0,
            h_index=pl.program_id(1) * hpb + j,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        v = v_ref[:, sl]
        acc = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[:, sl] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[j, :] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _xl_nhd_forward_lse(
    q, k, v, bias_u, bias_v, p, num_heads, sm_scale,
    block_q=512, group=128, band_widths=None, interpret=False,
):
    """[B, T, H*d] forward with in-kernel pos-bias adds, returning
    (out [B, T, C], lse [B, H, T_pad] f32)."""
    b, t, c = q.shape
    d = c // num_heads
    hpb = min(max(128 // d, 1), num_heads)
    t_pad, pad_lo, pad_hi = _geometry(t, block_q, 256)

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]
    lane = hpb * d
    grid = (b, num_heads // hpb, t_pad // block_q)

    qspec = pl.BlockSpec(
        (None, block_q, lane), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (None, t_pad, lane), lambda bi, hi, qi: (bi, 0, hi), memory_space=pltpu.VMEM
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _xl_row_nhd_lse_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo,
            group=group, band_widths=band_widths, d=d,
        ),
        grid=grid,
        in_specs=[
            qspec,
            kvspec,
            kvspec,
            *[
                pl.BlockSpec(
                    (None, p_len, d),
                    functools.partial(lambda bi, hi, qi, j: (hi * hpb + j, 0, 0), j=j),
                    memory_space=pltpu.VMEM,
                )
                for j in range(hpb)
            ],
            pl.BlockSpec((hpb, 1, d), lambda bi, hi, qi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hpb, 1, d), lambda bi, hi, qi: (hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            qspec,
            pl.BlockSpec((None, None, hpb, block_q), lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads // hpb, hpb, t_pad), jnp.float32),
        ),
        interpret=interpret,
    )(pad_t(q), pad_t(k), pad_t(v), *([p_padded] * hpb),
      bias_u.reshape(num_heads, 1, d), bias_v.reshape(num_heads, 1, d))
    return out[:, :t], lse.reshape(b, num_heads, t_pad)


def _xl_bwd_nhd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bu_ref, bv_ref, *rest,
    seq_len: int, sm_scale: float, pad_lo: int, group: int,
    band_widths: Optional[tuple], d: int,
):
    """Fused heads-in-lanes XL backward: one (head-pair, b, q-block)
    program recomputes the score strip per head-lane slice and emits
    dQu/dQv (direct block writes), dK/dV (f32 full-[T_pad] accumulators
    revisited across q-blocks) and this block's dP contribution
    (per-head [p_len, d] accumulators revisited across (b, q) — the
    head-pair dim is slowest). Layout identical to the model's — no
    [B, H, T, d] round trips."""
    hpb = q_ref.shape[1] // d
    p_refs = rest[:hpb]
    dqu_ref, dqv_ref, dk_ref, dv_ref = rest[hpb : hpb + 4]
    dp_refs = rest[hpb + 4 :]
    block_q = q_ref.shape[0]
    t_pad = k_ref.shape[0]
    i0 = pl.program_id(2) * block_q
    first_q = pl.program_id(2) == 0
    first_bq = (pl.program_id(1) == 0) & first_q
    n_bits = max(1, math.ceil(math.log2(group)))
    strip_w = t_pad + group
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (group, strip_w), 0)
    shift_amount = (group - 1) - row_ids
    strip_start0 = pl.multiple_of(pad_lo + (seq_len - 1) - (i0 + block_q - 1), 8)

    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)

        @pl.when(first_bq)
        def _():
            dp_refs[j][:] = jnp.zeros_like(dp_refs[j])

        q = q_ref[:, sl]
        qu = (q.astype(jnp.float32) + bu_ref[j].astype(jnp.float32)).astype(q.dtype)
        qv = (q.astype(jnp.float32) + bv_ref[j].astype(jnp.float32)).astype(q.dtype)
        s = _row_scores(
            qu, qv, k_ref[:, sl], p_refs[j],
            seq_len=seq_len, sm_scale=sm_scale, pad_lo=pad_lo, group=group,
            band_widths=band_widths, i0=i0,
            h_index=pl.program_id(0) * hpb + j,
        )
        lse = lse_ref[j, :].reshape(-1, 1)
        delta = delta_ref[j, :].reshape(-1, 1)
        a = jnp.exp(s - lse)  # [bq, T_pad]
        do = do_ref[:, sl]
        dov = jnp.dot(do, v_ref[:, sl].T, preferred_element_type=jnp.float32)
        ds = a * (dov - delta)
        ds_lp = ds.astype(q.dtype)
        dqu_ref[:, sl] = (
            jnp.dot(ds_lp, k_ref[:, sl], preferred_element_type=jnp.float32) * sm_scale
        ).astype(dqu_ref.dtype)

        # dQv + dP through the inverse slab roll (see _xl_bwd_dq_kernel)
        for g in range(block_q // group):
            coarse = block_q - (g + 1) * group
            padded = jnp.pad(ds[g * group : (g + 1) * group], ((0, 0), (0, group)))
            d_prod = _roll_rows_right(padded, shift_amount, n_bits)
            d_prod_lp = d_prod.astype(q.dtype)
            strip = p_refs[j][pl.ds(strip_start0 + coarse, strip_w), :]
            dqv_ref[g * group : (g + 1) * group, sl] = (
                jnp.dot(d_prod_lp, strip, preferred_element_type=jnp.float32) * sm_scale
            ).astype(dqv_ref.dtype)
            contrib = jax.lax.dot_general(
                d_prod_lp, qv[g * group : (g + 1) * group],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [W, d]
            dp_refs[j][pl.ds(strip_start0 + coarse, strip_w), :] += contrib

        # fused dK/dV (padded q rows carry do=0 -> ds=0, contribute nothing)
        dv_c = jax.lax.dot_general(
            a.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(
            ds_lp, qu, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        @pl.when(first_q)
        def _():
            dv_ref[:, sl] = dv_c
            dk_ref[:, sl] = dk_c

        @pl.when(jnp.logical_not(first_q))
        def _():
            dv_ref[:, sl] += dv_c
            dk_ref[:, sl] += dk_c


def _xl_nhd_backward(
    q, k, v, bias_u, bias_v, p, o, lse, g, num_heads, sm_scale,
    block_q=512, group=128, band_widths=None, interpret=False,
):
    """Fully heads-in-lanes XL backward from saved (o, lse [B, H, T_pad]).

    Returns (dq, dk, dv, dbu, dbv, dp) in the model layout — dq combines
    the dQu/dQv block outputs elementwise (the bias adds make q appear in
    both branches); dbu/dbv are their (b, t) reductions.
    """
    b, t, c = q.shape
    d = c // num_heads
    hpb = min(max(128 // d, 1), num_heads)
    lane = hpb * d
    t_pad = lse.shape[-1]
    # forward used _geometry(t, block_q, 256); recompute for strip coords
    t_pad2, pad_lo, pad_hi = _geometry(t, block_q, 256)
    assert t_pad2 == t_pad, (t_pad2, t_pad)
    n_pos = p.shape[1]

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    p_padded = jnp.pad(p, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    p_len = p_padded.shape[1]
    qp, kp, vp, gp, op = pad_t(q), pad_t(k), pad_t(v), pad_t(g.astype(q.dtype)), pad_t(o)
    delta = jnp.transpose(
        (gp.astype(jnp.float32) * op.astype(jnp.float32))
        .reshape(b, t_pad, num_heads, d).sum(-1),
        (0, 2, 1),
    ).reshape(b, num_heads // hpb, hpb, t_pad)
    lse4 = lse.reshape(b, num_heads // hpb, hpb, t_pad)

    # grid (head-pair, b, q-block): hi slowest so each dP accumulator is
    # revisited consecutively over all (b, q) steps
    qblk = pl.BlockSpec((None, block_q, lane), lambda hi, bi, qi: (bi, qi, hi),
                        memory_space=pltpu.VMEM)
    kvfull = pl.BlockSpec((None, t_pad, lane), lambda hi, bi, qi: (bi, 0, hi),
                          memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((None, None, hpb, block_q), lambda hi, bi, qi: (bi, hi, 0, qi),
                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hpb, 1, d), lambda hi, bi, qi: (hi, 0, 0),
                             memory_space=pltpu.VMEM)
    p_specs = [
        pl.BlockSpec(
            (None, p_len, d),
            functools.partial(lambda hi, bi, qi, j: (hi * hpb + j, 0, 0), j=j),
            memory_space=pltpu.VMEM,
        )
        for j in range(hpb)
    ]
    # one dP accumulator output per in-pair head j, [H//hpb, p_len, d]
    # indexed by hi — every row written; interleaved back afterwards
    dp_out_specs = [
        pl.BlockSpec((None, p_len, d), lambda hi, bi, qi: (hi, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(hpb)
    ]
    dqu, dqv, dk, dv, *dps = pl.pallas_call(
        functools.partial(
            _xl_bwd_nhd_kernel, seq_len=t, sm_scale=sm_scale, pad_lo=pad_lo,
            group=group, band_widths=band_widths, d=d,
        ),
        grid=(num_heads // hpb, b, t_pad // block_q),
        in_specs=[qblk, kvfull, kvfull, qblk, vec, vec, bias_spec, bias_spec, *p_specs],
        out_specs=(
            qblk,
            qblk,
            kvfull,
            kvfull,
            *dp_out_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            # dK/dV accumulate across q-blocks — f32 until the final cast
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
            *[jax.ShapeDtypeStruct((num_heads // hpb, p_len, d), jnp.float32)] * hpb,
        ),
        # the per-program f32 score/attn/ds strips ([block_q, t_pad] each)
        # plus the hpb rolled-slab intermediates exceed Mosaic's default
        # 16 MiB scoped-vmem stack at block_q=512, t_pad=1024 (measured
        # 21.25 MiB); raise the cap rather than shrink block_q — the
        # larger q block keeps the dK/dV revisit count down
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, gp, lse4, delta,
      bias_u.reshape(num_heads, 1, d), bias_v.reshape(num_heads, 1, d),
      *([p_padded] * hpb))
    # head hi*hpb+j lives in output j's row hi
    dp_full = jnp.stack(dps, axis=1).reshape(num_heads, p_len, d)
    dqu_f = dqu[:, :t].astype(jnp.float32)
    dqv_f = dqv[:, :t].astype(jnp.float32)
    dq = (dqu_f + dqv_f).astype(q.dtype)
    dbu = dqu_f.reshape(b, t, num_heads, d).sum((0, 1)).astype(bias_u.dtype)
    dbv = dqv_f.reshape(b, t, num_heads, d).sum((0, 1)).astype(bias_v.dtype)
    dp_out = dp_full[:, pad_lo : pad_lo + n_pos].astype(p.dtype)
    return dq, dk[:, :t].astype(k.dtype), dv[:, :t].astype(v.dtype), dbu, dbv, dp_out


def _xl_split(x, h):
    b, t, c = x.shape
    return x.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)


def _xl_merge(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _xl_nhd_supported(c: int, num_heads: int, t: int) -> bool:
    d = c // num_heads
    hpb = min(max(128 // d, 1), num_heads)
    lane = hpb * d
    return (
        num_heads % hpb == 0
        and c % lane == 0
        and (lane % 128 == 0 or lane == c)
        and _band_supported(t)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def flash_xl_attention_nhd(
    q, k, v, bias_u, bias_v, p, num_heads: int, sm_scale: float, band_widths=None
):
    """XL attention in the model's [B, T, H*d] layout.

    Both the no-grad forward AND the differentiated path (forward-with-
    LSE + fused saved-O backward) run heads-in-lanes kernels with the
    pos-bias adds fused in-kernel — no [B, H, T, d] transposes in either
    direction (r4; previously only the no-grad forward). Shapes the lane
    blocking cannot cover fall back to the transposed kernel pair.
    """
    if _on_tpu() and _xl_nhd_supported(q.shape[-1], num_heads, q.shape[1]):
        return _xl_nhd_forward(q, k, v, bias_u, bias_v, p, num_heads, sm_scale,
                               band_widths=band_widths)
    qh = _xl_split(q, num_heads)
    qu = (qh.astype(jnp.float32) + bias_u[None, :, None]).astype(q.dtype)
    qv = (qh.astype(jnp.float32) + bias_v[None, :, None]).astype(q.dtype)
    return _xl_merge(
        flash_xl_attention(qu, qv, _xl_split(k, num_heads), _xl_split(v, num_heads),
                           p, sm_scale, band_widths)
    )


def _nhd_xl_fwd(q, k, v, bias_u, bias_v, p, num_heads, sm_scale, band_widths):
    if _on_tpu() and _xl_nhd_supported(q.shape[-1], num_heads, q.shape[1]):
        # fully heads-in-lanes: residuals stay in the model layout
        # (3-dim q; the backward dispatches on residual rank)
        out, lse = _xl_nhd_forward_lse(q, k, v, bias_u, bias_v, p, num_heads,
                                       sm_scale, band_widths=band_widths)
        return out, ((q, k, v, bias_u, bias_v, p, out, lse),)
    qh = _xl_split(q, num_heads)
    kh = _xl_split(k, num_heads)
    vh = _xl_split(v, num_heads)
    qu = (qh.astype(jnp.float32) + bias_u[None, :, None]).astype(q.dtype)
    qv = (qh.astype(jnp.float32) + bias_v[None, :, None]).astype(q.dtype)
    out, residuals = _fwd(qu, qv, kh, vh, p, sm_scale, band_widths)
    # carry the bias primals ([H, d], negligible) so the backward can
    # cast dbu/dbv to the primal dtypes — qu/qv in the inner residuals
    # only record q's dtype, which may differ from the biases'
    return _xl_merge(out), (residuals, bias_u, bias_v)


def _nhd_xl_bwd(num_heads, sm_scale, band_widths, res, g):
    if len(res) == 1:  # heads-in-lanes residuals: transpose-free backward
        q, k, v, bias_u, bias_v, p, o, lse = res[0]
        return _xl_nhd_backward(q, k, v, bias_u, bias_v, p, o, lse,
                                g.astype(q.dtype), num_heads, sm_scale,
                                band_widths=band_widths)
    residuals, bias_u, bias_v = res
    dqu, dqv, dk, dv, dp = _bwd(sm_scale, band_widths, residuals, _xl_split(g, num_heads))
    # cotangent dtypes must match the primals: a float32 dq next to bf16
    # dk/dv breaks the VJP of the caller's qkv split (lax.concatenate
    # rejects mixed dtypes) — the accumulation stays f32, only the
    # result is cast back
    qu = residuals[0]
    dq = _xl_merge((dqu.astype(jnp.float32) + dqv.astype(jnp.float32))).astype(qu.dtype)
    dbu = jnp.sum(dqu.astype(jnp.float32), axis=(0, 2)).astype(bias_u.dtype)  # [H, d]
    dbv = jnp.sum(dqv.astype(jnp.float32), axis=(0, 2)).astype(bias_v.dtype)
    return dq, _xl_merge(dk), _xl_merge(dv), dbu, dbv, dp


flash_xl_attention_nhd.defvjp(_nhd_xl_fwd, _nhd_xl_bwd)
