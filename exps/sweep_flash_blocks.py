"""Sweep (block_q, block_k) for the flash kernel at the backbone shape.

Hypothesis: with the full-row K block (current default) the kernel
serializes QK (MXU) -> softmax (VPU) -> PV (MXU); a K-loop exposes
independent QK_{i+1} work the Mosaic scheduler can overlap with the
softmax of block i. Run: `python exps/sweep_flash_blocks.py [B] [T]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    from transformer4sed_tpu.kernels.flash_attention import _flash_forward

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1190
    h, d = 12, 64
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    q, k, v = (
        jax.device_put(jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16), dev)
        for _ in range(3)
    )

    configs = [
        (None, None),  # current default (full row)
        (1280, 640),
        (1280, 320),
        (1280, 256),
        (640, 640),
        (640, 1280),
        (256, 1280),
        (128, 1280),
    ]
    for bq, bk in configs:
        if bq is not None:

            def fn(q, k, v, bq=bq, bk=bk):
                return _flash_forward(q, k, v, sm_scale=d ** -0.5, block_q=bq, block_k=bk)

        else:

            def fn(q, k, v):
                return _flash_forward(q, k, v, sm_scale=d ** -0.5)

        try:
            ms = timeit(jax.jit(fn), q, k, v)
            print(f"block_q={bq} block_k={bk}: {ms:7.2f} ms")
        except Exception as e:
            print(f"block_q={bq} block_k={bk}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
