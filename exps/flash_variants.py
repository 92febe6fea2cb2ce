"""Timing + numerics for flash-kernel micro-variants at the backbone shape.

Variant A (tail-only masking): skip the full-tile -inf select. Padded K
columns are zero vectors -> their scores are exactly 0, so rowmax(s) is
still an upper bound of the real max (softmax is shift-invariant; any
m >= max works). PV needs no mask because padded V rows are zero; only
the row-sum l must exclude pad columns, and only in the 128-lane groups
that cross seq_len.

Variant B: A + exp2 with log2(e) folded into sm_scale (TPU exp lowers to
exp2(x*log2e) anyway; folding removes one VPU multiply per element).

Run: python exps/flash_variants.py [B] [T]
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
LOG2E = math.log2(math.e)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel_a(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, sm_scale: float, use_exp2: bool):
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    t_pad = k.shape[0]
    scale = sm_scale * LOG2E if use_exp2 else sm_scale
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    # m >= 0 >= padded-column scores, so subtracting m keeps pads <= 0
    p = jnp.exp2(s - m) if use_exp2 else jnp.exp(s - m)
    # l: exclude pad columns; only the lane groups crossing seq_len need work
    full = (seq_len // 128) * 128
    if full == t_pad:
        l = jnp.sum(p, axis=-1, keepdims=True)
    else:
        l_head = jnp.sum(p[:, :full], axis=-1, keepdims=True)
        tail = p[:, full:]
        col = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1) + full
        l_tail = jnp.sum(jnp.where(col < seq_len, tail, 0.0), axis=-1, keepdims=True)
        l = l_head + l_tail
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_a(q, k, v, sm_scale, use_exp2=False):
    b, h, t, d = q.shape
    block_q = _round_up(t, 128)
    t_pad = block_q

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(b * h, t_pad, d)

    qp, kp, vp = pad(q), pad(k), pad(v)
    out = pl.pallas_call(
        functools.partial(_kernel_a, seq_len=t, sm_scale=sm_scale, use_exp2=use_exp2),
        grid=(b * h, 1),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d)[:, :, :t]


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from transformer4sed_tpu.kernels.flash_attention import _flash_forward, _xla_attention

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1190
    h, d = 12, 64
    scale = d ** -0.5
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    q, k, v = (
        jax.device_put(jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16), dev)
        for _ in range(3)
    )

    ref_fn = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
    ref = np.asarray(ref_fn(q[:2], k[:2], v[:2]), np.float32)

    for name, fn in [
        ("current", jax.jit(lambda q, k, v: _flash_forward(q, k, v, scale))),
        ("A tail-mask", jax.jit(lambda q, k, v: flash_a(q, k, v, scale, use_exp2=False))),
        ("B tail+exp2", jax.jit(lambda q, k, v: flash_a(q, k, v, scale, use_exp2=True))),
    ]:
        out = np.asarray(fn(q[:2], k[:2], v[:2]), np.float32)
        err = np.max(np.abs(out - ref))
        ms = timeit(fn, q, k, v)
        print(f"{name:12s}: {ms:7.2f} ms   max|err| vs XLA = {err:.2e}")


if __name__ == "__main__":
    main()
