"""Pallas TPU flash attention for the ViT backbones.

The hottest kernel in the framework is PaSST's self-attention: 12
layers over ~1190 tokens. XLA materialises the [B, H, T, T] score
tensor in HBM between the two matmuls (f32: 68 MB per clip per layer);
this kernel computes attention with the online-softmax streaming
recurrence so scores never leave VMEM — the classic FlashAttention
formulation mapped onto the MXU:

  * grid over (batch*heads, query blocks); K/V live in VMEM for the
    whole row (T<=2048, head_dim 64 -> ~512 KB, well under the 16 MB
    VMEM budget), so the inner loop is pure compute;
  * q/k/v blocks feed 128-aligned ``jnp.dot``s with f32 accumulation;
  * ragged T is padded to the block size and masked with -inf key
    columns inside the kernel.

Backward uses a custom VJP that *recomputes* attention with plain XLA
ops (no stored score tensor from the forward; standard recompute
trade). Use :func:`flash_attention` as a drop-in for softmax attention
with no mask; masked paths fall back to the XLA implementation in
``models/vit.py``.
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


def _on_tpu() -> bool:
    """True when tracing will execute on TPU (respects default_device overrides)."""
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _check_blocks(t_pad: int, block_q: int, block_k: int) -> None:
    if t_pad % block_q or t_pad % block_k:
        raise ValueError(
            f"block_q={block_q}/block_k={block_k} must divide t_pad={t_pad}; "
            "rows would otherwise be silently left unwritten"
        )

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int, sm_scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax.

    q_ref: [block_q, d]; k_ref/v_ref: [T_pad, d]; o_ref: [block_q, d].
    """
    # keep q/k in input dtype: bf16 x bf16 -> f32 runs on the MXU at full
    # rate, while upcasting first would force an ~8x slower f32 matmul.
    # sm_scale is applied to the f32 scores after the dot.
    q = q_ref[:]
    block_q, d = q.shape
    t_pad = k_ref.shape[0]
    num_kb = t_pad // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + i * block_k
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, sm_scale, block_q: Optional[int] = None, block_k: Optional[int] = None, interpret: bool = False):
    """q/k/v: [B, H, T, d] -> [B, H, T, d].

    Default blocks from a v5e sweep at T=1190/d=64: block_q=256 with a
    single full-row K block (6.9 ms vs XLA's 10.4 ms at B=32xH=12);
    128x128 blocks under-utilise the MXU (24.5 ms). Explicit block_q /
    block_k always win over the heuristics (used by the sweep tooling).
    """
    b, h, t, d = q.shape
    if block_q is None:
        if t <= 1536:
            # whole [T, T] score tile per program measures fastest on v5e
            # (9.9 ms vs 11.0 ms at bq=256 for B=64, H=12, T=1190)
            block_q = _round_up(t, 128)
        else:
            block_q = 256
    if block_k is None:
        block_k = _round_up(t, block_q) if t <= 2048 else 512
    t_pad = _round_up(t, max(block_q, block_k))
    _check_blocks(t_pad, block_q, block_k)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(b * h, t_pad, d)

    qp, kp, vp = pad(q), pad(k), pad(v)
    grid = (b * h, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d)[:, :, :t]


def _xla_attention(q, k, v, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# -- flash attention with an additive score bias --------------------------------
#
# Used by the TransformerXL decoders: the rel-position term (and any band
# mask, folded in as -inf) arrives as a precomputed [B, H, T, T] bias.
# XLA's path materialises scores + softmax in HBM (2 x T^2 f32 per head
# per direction); here the bias is read once per block and everything
# else stays in VMEM.


def _flash_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k, seq_len, sm_scale):
    q = q_ref[:]  # input dtype: bf16 matmul on the MXU (see _flash_kernel)
    block_q, d = q.shape
    t_pad = k_ref.shape[0]
    num_kb = t_pad // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        bias = bias_ref[:, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale + bias
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


def _flash_bias_forward(q, k, v, bias, sm_scale, block_q=256, block_k=None, interpret=False):
    """q/k/v: [B, H, T, d]; bias: [B, H, T, T] additive scores."""
    b, h, t, d = q.shape
    if block_k is None:
        block_k = _round_up(t, block_q) if t <= 2048 else 512
    t_pad = _round_up(t, max(block_q, block_k))
    _check_blocks(t_pad, block_q, block_k)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(b * h, t_pad, d)

    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, t_pad - t), (0, t_pad - t))).reshape(
        b * h, t_pad, t_pad
    )
    grid = (b * h, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_bias_kernel, block_k=block_k, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, block_q, t_pad), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(pad_qkv(q), pad_qkv(k), pad_qkv(v), bias_p)
    return out.reshape(b, h, t_pad, d)[:, :, :t]


def _xla_attention_bias(q, k, v, bias, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_bias(q, k, v, bias, sm_scale: float = 1.0):
    """Softmax attention with additive [B, H, T, T] score bias."""
    if _on_tpu():
        return _flash_bias_forward(q, k, v, bias, sm_scale)
    return _xla_attention_bias(q, k, v, bias, sm_scale)


def _bias_fwd(q, k, v, bias, sm_scale):
    return flash_attention_bias(q, k, v, bias, sm_scale), (q, k, v, bias)


def _bias_bwd(sm_scale, residuals, g):
    q, k, v, bias = residuals

    def f(q, k, v, bias):
        return _xla_attention_bias(q, k, v, bias, sm_scale)

    out_dtype = jax.eval_shape(f, q, k, v, bias).dtype
    _, vjp = jax.vjp(f, q, k, v, bias)
    return vjp(g.astype(out_dtype))


flash_attention_bias.defvjp(_bias_fwd, _bias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, sm_scale: Optional[float] = None):
    """Softmax attention, [B, H, T, d] layout, no mask.

    Forward runs the Pallas kernel on TPU (XLA fallback elsewhere);
    backward recomputes attention with XLA ops.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if _on_tpu():
        return _flash_forward(q, k, v, scale)
    return _xla_attention(q, k, v, scale)


def _fwd(q, k, v, sm_scale):
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if _on_tpu():
        out, lse = _flash_forward_lse(q, k, v, scale)
        return out, (q, k, v, out, lse)
    return _xla_attention(q, k, v, scale), (q, k, v, None, None)


def _bwd(sm_scale, residuals, g):
    q, k, v, o, lse = residuals
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if o is not None and _on_tpu():
        return _flash_backward(q, k, v, o, lse, g, scale)

    def f(q, k, v):
        return _xla_attention(q, k, v, scale)

    out_dtype = jax.eval_shape(f, q, k, v).dtype
    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g.astype(out_dtype))


flash_attention.defvjp(_fwd, _bwd)


# -- fully-Pallas backward --------------------------------------------------------
#
# Standard FlashAttention backward from saved (O, LSE):
#   Phat = exp(scale*QK^T - lse);  D = rowsum(dO*O)
#   dV = Phat^T dO;  dPhat = dO V^T;  dS = Phat*(dPhat - D)
#   dQ = scale * dS K;   dK = scale * dS^T Q
# Two kernels: dq streams over q blocks (K/V row-resident), dkv streams
# over k blocks (Q/dO row-resident). Padded keys are re-masked; padded
# query rows carry dO = 0 so they contribute nothing.


def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k, seq_len, sm_scale):
    q = q_ref[:]  # input dtype: bf16 matmul on the MXU (see _flash_kernel)
    block_q, d = q.shape
    t_pad = k_ref.shape[0]
    num_kb = t_pad // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
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
    m, l, acc = jax.lax.fori_loop(0, t_pad // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, seq_len, sm_scale):
    # operands stay in input dtype so every matmul runs at bf16 MXU rate;
    # softmax/ds arithmetic is f32 via preferred_element_type
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    lse = lse_ref[:].reshape(-1, 1)
    delta = delta_ref[:].reshape(-1, 1)
    block_q = q.shape[0]
    t_pad = k.shape[0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_pad), 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[:] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, seq_len, sm_scale
):
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]  # k/v: [block_kv, d]
    lse = lse_ref[:].reshape(-1, 1)
    delta = delta_ref[:].reshape(-1, 1)
    t_pad = q.shape[0]
    block_kv = k.shape[0]

    kv_start = pl.program_id(1) * block_kv
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale  # [T_pad, bkv]
    col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, block_kv), 1) + kv_start
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)  # [T_pad, bkv]
    dv_ref[:] = jnp.dot(p.astype(do.dtype).T, do, preferred_element_type=jnp.float32).astype(
        dv_ref.dtype
    )
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # [T_pad, bkv]
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_ref[:] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)


def _flash_forward_lse(q, k, v, sm_scale, block_q=256, block_k=None, interpret=False):
    b, h, t, d = q.shape
    if block_k is None:
        block_k = _round_up(t, block_q) if t <= 2048 else 512
    t_pad = _round_up(t, max(block_q, block_k))
    _check_blocks(t_pad, block_q, block_k)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(b * h, t_pad, d)

    qp, kp, vp = pad(q), pad(k), pad(v)
    grid = (b * h, t_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_lse_kernel, block_k=block_k, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q), lambda bh, qi: (bh, 0, qi), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, t_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d)[:, :, :t], lse.reshape(b, h, t_pad)


def _flash_backward(q, k, v, o, lse, g, sm_scale, block_q=256, interpret=False):
    """Pallas dq/dk/dv from saved (o, lse) and cotangent g."""
    b, h, t, d = q.shape
    t_pad = lse.shape[-1]

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(b * h, t_pad, d)

    qp, kp, vp, gp = pad(q), pad(k), pad(v), pad(g)
    op = pad(o)
    delta = jnp.sum(gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1)  # [BH, T_pad]
    lse_flat = lse.reshape(b * h, 1, t_pad)
    delta = delta.reshape(b * h, 1, t_pad)

    row = lambda bh, i: (bh, i, 0)
    full = lambda bh, i: (bh, 0, 0)
    vec_blk = lambda bh, i: (bh, 0, i)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, seq_len=t, sm_scale=sm_scale),
        grid=(b * h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q), vec_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q), vec_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, gp, lse_flat, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, seq_len=t, sm_scale=sm_scale),
        grid=(b * h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, t_pad), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lse_flat, delta)

    unpad = lambda x: x.reshape(b, h, t_pad, d)[:, :, :t]
    return unpad(dq), unpad(dk), unpad(dv)


# -- heads-in-lanes flash attention (no HBM transposes) ---------------------------
#
# The [B, N, H, d] -> [B, H, N, d] transposes (x3 inputs + output) around
# flash_attention measured 4.2 ms per PaSST layer at B=64 — more than a
# third of the attention cost, ~50 ms across the 12-layer backbone. This
# variant keeps the model's natural layout: q/k/v arrive as [B, N, H*d]
# (a free view of the qkv Dense output) and the kernel slices each
# head's lanes statically inside VMEM, exactly like
# kernels/window_attention.py. Full-row K/V per batch element; ragged T
# masked in-kernel. 12x fewer grid steps than the per-(b,h) kernel.
#
# The custom VJP keeps training in this layout too: the forward-with-LSE
# and backward kernels below slice head lanes the same way, so neither
# direction ever materialises a [B, H, N, d] transpose in HBM. Layouts
# the lane-blocking cannot cover fall back to the [B, H, N, d] pair.
# The backward is ONE fused kernel (r4): each (b, head-pair, q-block)
# program recomputes the score strip once and emits dq directly plus
# dk/dv contributions into f32 accumulators revisited across q-blocks —
# 5 matmuls per head per strip vs 7 for the former dq + dkv kernel pair.


def _flash_nhd_kernel(q_ref, k_ref, v_ref, o_ref, *, d, seq_len, sm_scale):
    """One (batch, head-pair, q-block) step.

    Blocks are 128-lane slices of the [B, T_pad, H*d] arrays — Mosaic
    requires lane blocks of >=128, so each step covers TWO d=64 heads
    and slices them statically. Small tiles keep the VMEM stack bounded
    (a 12-head unrolled loop with full-row K/V measured a 21 MB scoped
    allocation and failed to compile)."""
    bq = q_ref.shape[0]
    t_pad = k_ref.shape[0]
    lanes = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, t_pad), 1)
    for j in range(lanes // d):
        qh = q_ref[:, j * d : (j + 1) * d]
        kh = k_ref[:, j * d : (j + 1) * d]
        vh = v_ref[:, j * d : (j + 1) * d]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(col < seq_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        o_ref[:, j * d : (j + 1) * d] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_nhd_forward(q, k, v, heads, sm_scale, block_q=256, interpret=False):
    """q/k/v: [B, N, H*d] -> [B, N, H*d]; heads per 128-lane block."""
    b, t, c = q.shape
    d = c // heads
    # >=128 lanes per block (Mosaic), or the whole lane dim when smaller
    lane_block = min(max(128 // d, 1) * d, c)
    t_pad = _round_up(t, block_q)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    grid = (b, c // lane_block, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_nhd_kernel, d=d, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, block_q, lane_block), lambda bi, hi, qi: (bi, qi, hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, t_pad, lane_block), lambda bi, hi, qi: (bi, 0, hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, t_pad, lane_block), lambda bi, hi, qi: (bi, 0, hi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, lane_block), lambda bi, hi, qi: (bi, qi, hi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out[:, :t]


# -- heads-in-lanes TRAINING path ---------------------------------------------------
#
# The custom-VJP fallback below (split-heads -> [B, H, T, d] kernel pair ->
# merge-heads) costs ~8 HBM transposes of [B, T, H*d] per layer per train
# step (fwd: 3 splits + 1 merge; bwd: 1 split + 3 merges) — measured
# 4.2 ms/layer at B=64 for the forward set alone. These kernels keep the
# model layout END TO END: the forward also emits a per-head LSE
# ([B, H, T_pad] f32, written as sublane rows of the lane-blocked grid
# step), and the backward recomputes p = exp(s - lse) in VMEM with the
# same static head-lane slicing. delta = rowsum(g*o) is computed outside
# per head ([B, T, H] -> [B, H, T] — a 12-lane transpose of a tiny
# tensor, not the [B, T, 768] round-trips this path removes).


def _flash_nhd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, d, seq_len, sm_scale):
    bq = q_ref.shape[0]
    t_pad = k_ref.shape[0]
    lanes = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, t_pad), 1)
    for j in range(lanes // d):
        qh = q_ref[:, j * d : (j + 1) * d]
        kh = k_ref[:, j * d : (j + 1) * d]
        vh = v_ref[:, j * d : (j + 1) * d]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(col < seq_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        o_ref[:, j * d : (j + 1) * d] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[j, :] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_nhd_forward_lse(q, k, v, heads, sm_scale, block_q=256, interpret=False):
    """q/k/v: [B, N, H*d] -> ([B, N, H*d], lse [B, H, T_pad] f32)."""
    b, t, c = q.shape
    d = c // heads
    lane_block = min(max(128 // d, 1) * d, c)
    t_pad = _round_up(t, block_q)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    hpb = lane_block // d
    grid = (b, c // lane_block, t_pad // block_q)
    # LSE lives as [B, n_pairs, hpb, T_pad] so its block's sublane dim
    # (hpb, e.g. 2) EQUALS the full array dim — Mosaic requires the last
    # two block dims be (8, 128)-divisible or full (hpb alone is neither)
    out, lse = pl.pallas_call(
        functools.partial(_flash_nhd_lse_kernel, d=d, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, lane_block), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, lane_block), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hpb, block_q), lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, heads // hpb, hpb, t_pad), jnp.float32),
        ),
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out[:, :t], lse.reshape(b, heads, t_pad)


def _nhd_dqkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dq_ref, dk_ref, dv_ref, *, d, seq_len, sm_scale):
    """One (b, head-pair, q-block) program: the score strip [bq, T_pad]
    is recomputed ONCE and yields dq (direct block write) AND this
    block's dk/dv contributions, accumulated into full-[T_pad] f32
    outputs the grid revisits across q-blocks (q innermost). Fusing the
    former separate dq / dkv kernels halves the score+dp recompute:
    5 matmuls per head per strip instead of 7."""
    bq = q_ref.shape[0]
    t_pad = k_ref.shape[0]
    lanes = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, t_pad), 1)
    first = pl.program_id(2) == 0
    for j in range(lanes // d):
        sl = slice(j * d, (j + 1) * d)
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]
        doh = do_ref[:, sl]
        lse = lse_ref[j, :].reshape(-1, 1)
        delta = delta_ref[j, :].reshape(-1, 1)
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(col < seq_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(doh, vh.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(qh.dtype)
        dq_ref[:, sl] = (
            jnp.dot(ds, kh, preferred_element_type=jnp.float32) * sm_scale
        ).astype(dq_ref.dtype)
        # dv_j += p^T @ do, dk_j += ds^T @ q (padded q rows have do=0 ->
        # ds=0 and contribute nothing)
        dv_c = jax.lax.dot_general(
            p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        @pl.when(first)
        def _():
            dv_ref[:, sl] = dv_c
            dk_ref[:, sl] = dk_c

        @pl.when(jnp.logical_not(first))
        def _():
            dv_ref[:, sl] += dv_c
            dk_ref[:, sl] += dk_c


def _flash_nhd_backward(q, k, v, o, lse, g, heads, sm_scale, block_q=256, interpret=False):
    """Pallas dq/dk/dv in the [B, N, H*d] layout from saved (o, lse [B, H, T_pad])."""
    b, t, c = q.shape
    d = c // heads
    lane_block = min(max(128 // d, 1) * d, c)
    hpb = lane_block // d
    t_pad = lse.shape[-1]

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    qp, kp, vp, gp, op = pad(q), pad(k), pad(v), pad(g), pad(o)
    # delta[b, h, t] = sum_d g*o over head h's lanes (padded rows carry
    # g=0); lse/delta ride as [B, n_pairs, hpb, T_pad] so their blocks'
    # sublane dim (hpb) equals the full array dim (Mosaic constraint)
    delta = jnp.transpose(
        (gp.astype(jnp.float32) * op.astype(jnp.float32)).reshape(b, t_pad, heads, d).sum(-1),
        (0, 2, 1),
    ).reshape(b, heads // hpb, hpb, t_pad)
    lse4 = lse.reshape(b, heads // hpb, hpb, t_pad)

    qkv_blk = lambda bi, hi, qi: (bi, qi, hi)
    qkv_full = lambda bi, hi, qi: (bi, 0, hi)
    vec_blk = lambda bi, hi, qi: (bi, hi, 0, qi)
    grid = (b, c // lane_block, t_pad // block_q)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_nhd_dqkv_kernel, d=d, seq_len=t, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, lane_block), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, lane_block), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hpb, block_q), vec_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hpb, block_q), vec_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, lane_block), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, lane_block), qkv_full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            # dk/dv accumulate across q-blocks — keep f32 until the final cast
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lse4, delta)
    return dq[:, :t], dk[:, :t].astype(k.dtype), dv[:, :t].astype(v.dtype)


def _split_heads(x, heads):
    b, t, c = x.shape
    return x.reshape(b, t, heads, c // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_nhd(q, k, v, num_heads: int, sm_scale: Optional[float] = None):
    """Softmax attention in the model's [B, N, H*d] layout, no mask.

    Forward AND backward run heads-in-lanes Pallas kernels (no HBM
    transposes in either direction); layouts the lane blocking cannot
    cover fall back to the [B, H, N, d] kernel pair.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1] // num_heads)
    c = q.shape[-1]
    d = c // num_heads
    lane_block = min(max(128 // d, 1) * d, c)
    if _on_tpu() and c % lane_block == 0 and (lane_block % 128 == 0 or lane_block == c):
        return _flash_nhd_forward(q, k, v, num_heads, scale)
    if _on_tpu():
        return _merge_heads(
            _flash_forward(_split_heads(q, num_heads), _split_heads(k, num_heads),
                           _split_heads(v, num_heads), scale)
        )
    return _merge_heads(
        _xla_attention(_split_heads(q, num_heads), _split_heads(k, num_heads),
                       _split_heads(v, num_heads), scale)
    )


def _nhd_fwd(q, k, v, num_heads, sm_scale):
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1] // num_heads)
    c = q.shape[-1]
    d = c // num_heads
    lane_block = min(max(128 // d, 1) * d, c)
    if _on_tpu() and c % lane_block == 0 and (lane_block % 128 == 0 or lane_block == c):
        # fully heads-in-lanes: residuals stay in the model layout
        # (3-dim; the backward dispatches on residual rank)
        out, lse = _flash_nhd_forward_lse(q, k, v, num_heads, scale)
        return out, (q, k, v, out, lse)
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    if _on_tpu():
        out, lse = _flash_forward_lse(qh, kh, vh, scale)
        return _merge_heads(out), (qh, kh, vh, out, lse)
    return _merge_heads(_xla_attention(qh, kh, vh, scale)), (qh, kh, vh, None, None)


def _nhd_bwd(num_heads, sm_scale, residuals, g):
    q_, k_, v_, o, lse = residuals
    if q_.ndim == 3:  # heads-in-lanes residuals: transpose-free backward
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q_.shape[-1] // num_heads)
        return _flash_nhd_backward(q_, k_, v_, o, lse, g, num_heads, scale)
    qh, kh, vh = q_, k_, v_
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(qh.shape[-1])
    gh = _split_heads(g, num_heads)
    if o is not None and _on_tpu():
        dq, dk, dv = _flash_backward(qh, kh, vh, o, lse, gh, scale)
    else:
        def f(q__, k__, v__):
            return _xla_attention(q__, k__, v__, scale)

        out_dtype = jax.eval_shape(f, qh, kh, vh).dtype
        _, vjp = jax.vjp(f, qh, kh, vh)
        dq, dk, dv = vjp(gh.astype(out_dtype))
    return _merge_heads(dq), _merge_heads(dk), _merge_heads(dv)


flash_attention_nhd.defvjp(_nhd_fwd, _nhd_bwd)
