"""Compile-check the heads-in-lanes XL differentiated path on the real TPU.

Repro for the scoped-vmem OOM seen in bench.py r4 (B=24, T=1000, C=768,
H=12: Mosaic needed 21.25 MiB stack vs the 16 MiB default). Run after
changing kernel blocking / compiler params.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from transformer4sed_tpu.kernels.xl_attention import flash_xl_attention_nhd


def main():
    B, T, C, H = 24, 1000, 768, 12
    d = C // H
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, C), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, C), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, C), jnp.bfloat16)
    bu = jax.random.normal(ks[3], (H, d), jnp.float32)
    bv = jax.random.normal(ks[4], (H, d), jnp.float32)
    p = jax.random.normal(ks[5], (H, 2 * T - 1, d), jnp.bfloat16)
    scale = d ** -0.5

    def loss(q, k, v, bu, bv, p):
        o = flash_xl_attention_nhd(q, k, v, bu, bv, p, H, scale, None)
        return (o.astype(jnp.float32) ** 2).sum()

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
    t0 = time.time()
    grads = f(q, k, v, bu, bv, p)
    s = sum(float(g.astype(jnp.float32).sum()) for g in grads)
    print(f"compiled+ran in {time.time() - t0:.1f}s, grad checksum {s:.3e}")

    # timed steps
    for _ in range(3):
        t0 = time.time()
        grads = f(q, k, v, bu, bv, p)
        _ = float(grads[0].astype(jnp.float32).sum())
        print(f"step {1e3 * (time.time() - t0):.1f} ms")


if __name__ == "__main__":
    main()
