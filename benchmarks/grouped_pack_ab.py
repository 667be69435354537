"""A/B the MXU-tile-packed per-group Gram (ops/linalg.grouped_gram_packed)
against the naive batched einsum on the grouped shapes that carry ResNeXt-50
and the depthwise families' factor FLOPs. Correctness asserted at 1e-4
relative; timings use the host-fetch sync (benchmarks/NOTES.md).

Run: python benchmarks/grouped_pack_ab.py [--iters N]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.ops.linalg import grouped_gram_packed

# (label, tokens N, groups g, block cols c) — resnext grouped 3x3s are
# bias-free (models/resnet.py), so their A blocks are 36 cols, no ones
# column appended
SHAPES = [
    ("resnext50 3x3 A (56px)", 16 * 56 * 56, 32, 36),
    ("resnext50 3x3 A (28px)", 16 * 28 * 28, 32, 36),
    ("resnext50 3x3 A (14px)", 16 * 14 * 14, 32, 36),
    ("resnext101_64x4d A", 16 * 28 * 28, 64, 36),
    ("depthwise 3x3 A (mbnet)", 16 * 56 * 56, 96, 10),
    ("depthwise 5x5 A (effnet)", 16 * 28 * 28, 240, 26),
    ("resnext50 G (out 128)", 16 * 56 * 56, 32, 4),
    ("resnext50 G (out 512)", 16 * 14 * 14, 32, 16),
]


@jax.jit
def naive(t):
    return jnp.einsum("ngi,ngj->gij", t, t,
                      preferred_element_type=jnp.float32)


packed = jax.jit(functools.partial(grouped_gram_packed, dtype=jnp.float32))


@jax.jit
def dense(t):
    """Full [g*c, g*c] Gram, diagonal blocks extracted.

    Wastes (g-1)/g of the FLOPs on cross-group blocks, but: the
    reshape [N, g, c] -> [N, g*c] is layout-free (no [g, N, c]
    transpose of the token stream like the batched einsum needs), and
    one deep-K dense GEMM runs near MXU peak where g tiny [c, c]
    matmuls run at (c/128)^2 utilization each.
    """
    n, g, c = t.shape
    flat = t.reshape(n, g * c)
    full = jnp.einsum("ni,nj->ij", flat, flat,
                      preferred_element_type=jnp.float32)
    blocks = full.reshape(g, c, g, c)
    idx = jnp.arange(g)
    return blocks[idx, :, idx, :]


def sync(v):
    np.asarray(jax.device_get(v.ravel()[0]))


def bench(fn, t, iters):
    sync(fn(t))                                 # compile + warm
    best = float("inf")
    for _ in range(3):                          # best-of-3 blocks (NOTES.md)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(t)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    print(f"{'shape':28s} {'N':>8s} {'g':>4s} {'c':>4s} "
          f"{'naive ms':>9s} {'packed ms':>9s} {'dense ms':>9s} "
          f"{'pack x':>7s} {'dense x':>8s}")
    for label, n, g, c in SHAPES:
        t = jnp.asarray(rng.standard_normal((n, g, c)), jnp.float32)
        np.testing.assert_allclose(np.asarray(packed(t)),
                                   np.asarray(naive(t)),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dense(t)),
                                   np.asarray(naive(t)),
                                   rtol=1e-4, atol=1e-4)
        tn = bench(naive, t, args.iters)
        tp = bench(packed, t, args.iters)
        td = bench(dense, t, args.iters)
        print(f"{label:28s} {n:8d} {g:4d} {c:4d} "
              f"{tn * 1e3:9.3f} {tp * 1e3:9.3f} {td * 1e3:9.3f} "
              f"{tn / tp:7.2f} {tn / td:8.2f}")


if __name__ == "__main__":
    main()
