"""Pallas TPU kernel for Swin window attention (HTSAT backbone).

The HTSAT-tiny Swin stack spends its time in window attention: 64-token
windows with head_dim 24 lower to thousands of tiny batched GEMMs
(64x24x64) plus an HBM-materialised [B*nW, H, 64, 64] f32 score tensor
— measured 7.6 ms for the stage-1 shape (B=64) where the arithmetic is
worth well under 1 ms. Packing windows into bigger XLA GEMMs makes it
*worse* (18.5 ms): the packed score tensor is 8x larger in HBM.

This kernel takes the packing trade where it is free. Each grid step
loads P windows' q/k/v as ONE [M=P*n, h*d] tile — a pure reshape view
of the model's [B*nW, n, h, d] layout, so no HBM transpose is ever
paid (a first version that transposed heads out measured slower than
XLA end-to-end: 3 packs + 1 unpack cost 4.7 ms per stage-1 block).
Inside the kernel a static loop slices each head's [M, d] lanes,
computes the full [M, M] score tile with one MXU matmul (cross-window
entries are wasted FLOPs but FLOPs are not the bottleneck), adds the
relative-position bias and Swin shift mask (cross-window entries
pre-filled with -inf), row-softmaxes, and multiplies back down to
[M, d] — scores never touch HBM. Measured at the stage-1 shape:
3.7 ms vs 7.6 ms XLA (2.05x), with zero layout overhead.

Mask plumbing: the relative-position bias [H, n, n] tiles identically
into every window-diagonal block, so it is expanded once per forward to
a [H, M, M] tile with -inf off the window diagonal (block index is
constant, so it loads into VMEM once). The shifted-window mask varies
with the window's position inside the image; groups of P windows repeat
with period n_pat = max(nW // P, 1), so the grid iterates (pattern,
batch-chunk) and each [M, M] shift tile also loads once. The pack size
is capped at an 8 MB bias+shift budget — 12 MB measured as a
TPU-internal error (VMEM overflow with double-buffered qkv tiles).

Backward is a fully-Pallas recompute kernel (VERDICT r2 item 7): it
re-runs the score matmul + softmax in VMEM (no LSE is saved — one extra
exp pass beats carrying an awkwardly-laid-out LSE between differently
packed forward/backward grids), takes delta = rowsum(g*o) from the
saved forward OUTPUT (free: custom_vjp residuals), and emits
dq/dk/dv per tile plus dbias/dshift via cross-step VMEM accumulation
(constant output block index; zeroed on the first visiting step). The
-inf off-diagonal bias makes cross-window p (and therefore ds) exactly
zero, so the packed tile never contaminates gradients across windows.
The backward uses its own, smaller pack budget: it keeps both the bias
tile and the dbias accumulator (plus shift/dshift) resident in VMEM.

Reference semantics reproduced: ``src/models/htsat/htsat.py:277-352``
(WindowAttention: scale before bias, f32 softmax) and the -100 additive
shift mask of ``htsat.py:474-495``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer4sed_tpu.kernels.flash_attention import _on_tpu

_NEG_INF = -1e9
_VMEM_MASK_BUDGET = 8 * 1024 * 1024  # bias + shift tiles, bytes


def _choose_pack(bnw: int, n: int, h: int, n_windows: int, n_mask_tiles: Optional[int] = None) -> int:
    """Largest P with M = P*n <= 512, bnw % P == 0, a periodic
    shift-mask pattern (nW % P == 0 or P % nW == 0), and ``n_mask_tiles``
    [M, M] f32 tiles within the VMEM budget (forward: bias + shift =
    h + 1; backward also keeps the dbias/dshift accumulators resident:
    2h + 2)."""
    if n_mask_tiles is None:
        n_mask_tiles = h + 1
    best = 1
    for p in range(1, max(512 // n, 1) + 1):
        if bnw % p:
            continue
        if n_windows % p and p % n_windows:
            continue
        m = p * n
        if n_mask_tiles * m * m * 4 > _VMEM_MASK_BUDGET:
            continue
        best = p
    return best


def _window_kernel(q_ref, k_ref, v_ref, bias_ref, shift_ref, o_ref, *, heads: int, d: int, sm_scale: float):
    """One (pattern, batch-chunk) step: [M, h*d] tiles, static head loop.

    bias_ref: [h, M, M] rel-pos bias, -inf off the window diagonal.
    shift_ref: [M, M] additive shift-mask tile (zeros when unshifted).
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    shift = shift_ref[:]
    outs = []
    for hi in range(heads):
        qh = q[:, hi * d : (hi + 1) * d]
        kh = k[:, hi * d : (hi + 1) * d]
        vh = v[:, hi * d : (hi + 1) * d]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * sm_scale
        s = s + bias_ref[hi] + shift
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _expand_bias(bias: jnp.ndarray, pack: int) -> jnp.ndarray:
    """[H, n, n] rel-pos bias -> [H, M, M] with -inf off the diagonal blocks."""
    h, n, _ = bias.shape
    m = pack * n
    tiled = jnp.tile(bias, (1, pack, pack)).astype(jnp.float32)
    win = np.arange(m) // n
    same = jnp.asarray(win[:, None] == win[None, :])
    return jnp.where(same[None], tiled, _NEG_INF)


def _expand_shift(
    shift_mask: Optional[jnp.ndarray], pack: int, n: int, n_windows: int
) -> jnp.ndarray:
    """[nW, n, n] shift mask -> [n_pat, M, M] block-diagonal pattern tiles.

    Group g covers global windows [g*P, (g+1)*P); window w uses mask
    w % nW, so groups repeat with period n_pat = max(nW // P, 1).
    """
    m = pack * n
    if shift_mask is None:
        return jnp.zeros((1, m, m), jnp.float32)
    n_pat = max(n_windows // pack, 1)
    idx = (np.arange(n_pat * pack).reshape(n_pat, pack)) % n_windows
    blocks = shift_mask[jnp.asarray(idx)]  # [n_pat, P, n, n]
    out = jnp.zeros((n_pat, m, m), jnp.float32)
    for p in range(pack):
        out = jax.lax.dynamic_update_slice(
            out, blocks[:, p].astype(jnp.float32), (0, p * n, p * n)
        )
    return out


def _window_forward(q, k, v, bias, shift_mask, n_windows, sm_scale, interpret=False):
    bnw, n, h, d = q.shape
    if shift_mask is None:
        # no per-window mask -> every window is interchangeable: lift the
        # periodicity constraint on the pack AND keep the zeros shift
        # tile's block index at 0 (n_pat = 1); otherwise the index map
        # would run past the [1, M, M] tile
        n_windows = 1
    elif bnw % n_windows:
        raise ValueError(
            f"bnw={bnw} must be a multiple of n_windows={n_windows} "
            "(q rows are B*nW windows in image order)"
        )
    pack = _choose_pack(bnw, n, h, n_windows)
    m = pack * n
    g = bnw // pack
    n_pat = max(n_windows // pack, 1)
    assert g % n_pat == 0, (g, n_pat)

    # [bnw, n, h, d] -> [G, M, h*d] is a pure view (contiguous dims)
    def view(x):
        return x.reshape(g, m, h * d)

    bias_t = _expand_bias(bias, pack)  # [h, M, M]
    shift_t = _expand_shift(shift_mask, pack, n, n_windows)  # [n_pat, M, M]

    grid = (n_pat, g // n_pat)

    def qkv_spec():
        return pl.BlockSpec(
            (None, m, h * d), lambda t, i: (i * n_pat + t, 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_window_kernel, heads=h, d=d, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            qkv_spec(),
            qkv_spec(),
            qkv_spec(),
            pl.BlockSpec((h, m, m), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, m), lambda t, i: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, m, h * d), lambda t, i: (i * n_pat + t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, m, h * d), q.dtype),
        interpret=interpret,
    )(view(q), view(k), view(v), bias_t, shift_t)

    return out.reshape(bnw, n, h, d)


def _window_backward_kernel(
    q_ref, k_ref, v_ref, o_ref, g_ref, bias_ref, shift_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, dshift_ref,
    *, heads: int, d: int, sm_scale: float,
):
    """One (pattern, batch-chunk) step of the recompute backward.

    Recomputes scores + softmax per head in VMEM, uses the saved forward
    output for delta = rowsum(g*o), and accumulates dbias (constant
    block across ALL steps) / dshift (constant block across a pattern's
    inner steps) in VMEM. Grid order is (pattern t outer, chunk i inner)
    so the accumulators are zeroed exactly when their block is first
    visited.
    """
    t = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    o = o_ref[:]
    g = g_ref[:]
    shift = shift_ref[:]
    m_len = q.shape[0]

    @pl.when(jnp.logical_and(t == 0, i == 0))
    def _zero_dbias():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    @pl.when(i == 0)
    def _zero_dshift():
        dshift_ref[:] = jnp.zeros_like(dshift_ref)

    ds_sum = jnp.zeros((m_len, m_len), jnp.float32)
    dqs, dks, dvs = [], [], []
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        qh, kh, vh, oh, gh = q[:, sl], k[:, sl], v[:, sl], o[:, sl], g[:, sl]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * sm_scale
        s = s + bias_ref[hi] + shift
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        dv = jnp.dot(p.astype(gh.dtype).T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, vh.T, preferred_element_type=jnp.float32)
        delta = jnp.sum(
            gh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1, keepdims=True
        )
        ds = p * (dp - delta)  # f32; zero on cross-window blocks (p == 0)
        ds_m = ds.astype(kh.dtype)
        dq = jnp.dot(ds_m, kh, preferred_element_type=jnp.float32) * sm_scale
        dk = jnp.dot(ds_m.T, qh, preferred_element_type=jnp.float32) * sm_scale
        dbias_ref[hi] = dbias_ref[hi] + ds
        ds_sum = ds_sum + ds
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dshift_ref[:] = dshift_ref[:] + ds_sum
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)


def _window_backward(q, k, v, o, g, bias, shift_mask, n_windows, sm_scale, interpret=False):
    """Fully-Pallas VJP: returns (dq, dk, dv, dbias, dshift-or-None)."""
    bnw, n, h, d = q.shape
    with_shift = shift_mask is not None
    n_w = n_windows if with_shift else 1
    pack = _choose_pack(bnw, n, h, n_w, n_mask_tiles=2 * h + 2)
    m = pack * n
    grp = bnw // pack
    n_pat = max(n_w // pack, 1)

    def view(x):
        return x.reshape(grp, m, h * d)

    bias_t = _expand_bias(bias, pack)
    shift_t = _expand_shift(shift_mask, pack, n, n_w)

    grid = (n_pat, grp // n_pat)

    def tile_spec():
        return pl.BlockSpec(
            (None, m, h * d), lambda t, i: (i * n_pat + t, 0, 0), memory_space=pltpu.VMEM
        )

    dq, dk, dv, dbias_t, dshift_t = pl.pallas_call(
        functools.partial(_window_backward_kernel, heads=h, d=d, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            tile_spec(), tile_spec(), tile_spec(), tile_spec(), tile_spec(),
            pl.BlockSpec((h, m, m), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, m), lambda t, i: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tile_spec(), tile_spec(), tile_spec(),
            pl.BlockSpec((h, m, m), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, m), lambda t, i: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grp, m, h * d), q.dtype),
            jax.ShapeDtypeStruct((grp, m, h * d), k.dtype),
            jax.ShapeDtypeStruct((grp, m, h * d), v.dtype),
            jax.ShapeDtypeStruct((h, m, m), jnp.float32),
            jax.ShapeDtypeStruct((n_pat, m, m), jnp.float32),
        ],
        interpret=interpret,
    )(view(q), view(k), view(v), view(o), view(g), bias_t, shift_t)

    dq = dq.reshape(bnw, n, h, d)
    dk = dk.reshape(bnw, n, h, d)
    dv = dv.reshape(bnw, n, h, d)
    # [h, M, M] accumulator -> [h, n, n]: sum the P window-diagonal blocks
    dbias_blocks = dbias_t.reshape(h, pack, n, pack, n)
    dbias = sum(dbias_blocks[:, p, :, p, :] for p in range(pack)).astype(bias.dtype)
    if not with_shift:
        return dq, dk, dv, dbias, None
    # [n_pat, M, M] tiles -> [nW, n, n]: window (t*P + p) % nW owns the
    # p-th diagonal block of pattern t (summed when P > nW repeats it)
    dshift = jnp.zeros((n_windows, n, n), jnp.float32)
    blocks = dshift_t.reshape(n_pat, pack, n, pack, n)
    for t in range(n_pat):
        for p in range(pack):
            w = (t * pack + p) % n_windows
            dshift = dshift.at[w].add(blocks[t, p, :, p, :])
    return dq, dk, dv, dbias, dshift.astype(shift_mask.dtype)


def _xla_window_attention(q, k, v, bias, shift_mask, n_windows, sm_scale):
    """Plain XLA reference path (also the recompute target for the VJP)."""
    bnw = q.shape[0]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    s = s + bias[None].astype(jnp.float32)
    if shift_mask is not None:
        idx = np.arange(bnw) % n_windows
        s = s + shift_mask[jnp.asarray(idx)][:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def swin_window_attention(q, k, v, bias, shift_mask, n_windows: int, sm_scale: float):
    """Window attention with rel-pos bias and optional Swin shift mask.

    q/k/v: [B*nW, n, h, d]; bias: [h, n, n]; shift_mask: [nW, n, n]
    additive (or None); n_windows = nW (windows per image, for the
    shift-mask periodicity). Returns [B*nW, n, h, d].
    """
    if _on_tpu():
        return _window_forward(q, k, v, bias, shift_mask, n_windows, sm_scale)
    return _xla_window_attention(q, k, v, bias, shift_mask, n_windows, sm_scale)


def _wa_fwd(q, k, v, bias, shift_mask, n_windows, sm_scale):
    out = swin_window_attention(q, k, v, bias, shift_mask, n_windows, sm_scale)
    # o rides in the residuals: the backward's delta = rowsum(g*o) costs
    # nothing extra (the output exists anyway)
    return out, (q, k, v, bias, shift_mask, out)


def _wa_bwd(n_windows, sm_scale, residuals, gout):
    q, k, v, bias, shift_mask, out = residuals
    if _on_tpu():
        dq, dk, dv, dbias, dshift = _window_backward(
            q, k, v, out, gout, bias, shift_mask, n_windows, sm_scale
        )
        return dq, dk, dv, dbias, dshift
    # off-TPU: recompute with XLA ops (differentiable, including the
    # shift mask: a zero cotangent there would silently diverge from the
    # XLA path if anyone ever optimizes the mask)
    if shift_mask is None:
        def f(q_, k_, v_, bias_):
            return _xla_window_attention(q_, k_, v_, bias_, None, n_windows, sm_scale)

        _, vjp = jax.vjp(f, q, k, v, bias)
        return (*vjp(gout), None)

    def f(q_, k_, v_, bias_, shift_):
        return _xla_window_attention(q_, k_, v_, bias_, shift_, n_windows, sm_scale)

    _, vjp = jax.vjp(f, q, k, v, bias, shift_mask)
    return vjp(gout)


swin_window_attention.defvjp(_wa_fwd, _wa_bwd)
