"""Correlation patch-Gram A/B (round 5): corr_patch_gram vs the current
per-shape policy (pallas tiled/v2 or the XLA patches+einsum path) on every
distinct stride-1 3x3 ResNet-50 conv shape, f32 and bf16, one v5e.

The correlation formulation computes (2k-1)^2 token-deep [C, C] products
instead of the k^4 tap-pair Gram — 13/81 of the FLOPs for 3x3 after the
transpose symmetry — and is exact (boundary-corrected; parity tested).

Run: python benchmarks/corr_gram_ab.py [--iters N] [--batch B]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.ops.corr_gram import corr_patch_gram
from curvature_tpu.ops.pallas import (patch_gram_tiled, patch_gram_v2,
                                      select_patch_gram)
from curvature_tpu.ops.patches import extract_patches


def sync(v):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(v)[0].ravel()[0]))


def best_of(fn, x, iters, blocks=3):
    fn(x)
    sync(fn(x))
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    from curvature_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    b = args.batch
    pad = ((1, 1), (1, 1))
    ks = (3, 3)
    print(f"device={jax.devices()[0]} batch={b}", flush=True)
    print(f"{'shape':16s} {'dtype':9s} {'policy':7s} {'base ms':>8s} "
          f"{'corr ms':>8s} {'speedup':>8s} {'rel err':>8s}", flush=True)
    for h, w, c in [(56, 56, 64), (28, 28, 128), (14, 14, 256), (7, 7, 512)]:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), dt)
            which = select_patch_gram(c, ks, (1, 1), h, w, b, dt.dtype.itemsize) \
                if hasattr(dt, "dtype") else None
            which = select_patch_gram(c, ks, (1, 1), h, w, b,
                                      jnp.dtype(dt).itemsize)

            @jax.jit
            def xla_gram(x):
                p = extract_patches(x, ks, (1, 1), pad)
                p = p.reshape(-1, c * 9)
                p = jnp.concatenate(
                    [p, jnp.ones((p.shape[0], 1), p.dtype)], axis=1)
                return jnp.einsum("ni,nj->ij", p, p,
                                  preferred_element_type=jnp.float32)

            if which == "tiled":
                base = jax.jit(lambda x: patch_gram_tiled(x, ks, pad, (1, 1)))
            elif which == "v2":
                base = jax.jit(lambda x: patch_gram_v2(x, ks, pad, (1, 1)))
            else:
                base = xla_gram
            corr = jax.jit(lambda x: corr_patch_gram(x, ks, pad))
            wref = np.asarray(xla_gram(x.astype(jnp.float32)))
            err = np.abs(np.asarray(corr(x.astype(jnp.float32))) - wref).max() \
                / max(np.abs(wref).max(), 1)
            tb = best_of(base, x, args.iters)
            tc = best_of(corr, x, args.iters)
            print(f"{h}x{w}x{c:4d}     {jnp.dtype(dt).name:9s} "
                  f"{which or 'xla':7s} {tb * 1e3:8.2f} {tc * 1e3:8.2f} "
                  f"{tb / tc:7.2f}x {err:8.1e}", flush=True)


if __name__ == "__main__":
    main()
