"""A/B XLA's native grouped-conv lowering against a dense conv with
block-diagonal (zero-masked) weights, on the shapes that carry ResNeXt's
forward/backward FLOPs.

Motivation (benchmarks/NOTES.md round-3): the resnext50_32x4d KFAC step
attribution shows fwd 13.5 ms + probe-bwd 25.9 ms — 52% of the step — vs
5.0 + 7.6 ms for resnet50 at the SAME dense-equivalent FLOP budget, and the
30-sample BNN eval runs at ~10 TFLOP/s vs resnet50's ~40. The hypothesis:
``feature_group_count=g`` with c/g = 4..16 channels per group gives the MXU
a K=36..144 contraction per group that can't fill the 128-lane tile, while
the dense-masked formulation (weights scattered into a [kh, kw, C, O] block
diagonal) wastes (g-1)/g of its FLOPs but runs the one GEMM shape the MXU
is built for. Both compute bit-identical results (zero weights contribute
exactly zero).

Run: python benchmarks/grouped_conv_ab.py [--iters N]
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
from jax import lax

# (label, px, C, O, g, stride) — resnext50_32x4d / resnext101_64x4d grouped
# 3x3 shapes at batch 16, plus one depthwise (g == C) control row
SHAPES = [
    ("rx50 s2 128g32 (56px)", 56, 128, 128, 32, 1),
    ("rx50 s3 256g32 (28px)", 28, 256, 256, 32, 1),
    ("rx50 s4 512g32 (14px)", 14, 512, 512, 32, 1),
    ("rx50 s5 1024g32 (7px)", 7, 1024, 1024, 32, 1),
    ("rx101 256g64 (28px)", 28, 256, 256, 64, 1),
    ("depthwise 96g96 (56px)", 56, 96, 96, 96, 1),
]
BATCH = 16


def conv_grouped(x, w, g, stride):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)


def scatter_dense(w, g):
    """[kh, kw, C/g, O] grouped weights -> [kh, kw, C, O] block-diagonal."""
    kh, kw, cg, o = w.shape
    og = o // g
    dense = jnp.zeros((kh, kw, cg * g, o), w.dtype)
    for j in range(g):
        dense = dense.at[:, :, j * cg:(j + 1) * cg,
                         j * og:(j + 1) * og].set(
            w[:, :, :, j * og:(j + 1) * og])
    return dense


def conv_dense(x, wd, stride):
    return lax.conv_general_dilated(
        x, wd, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def sync(v):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(v)[0].ravel()[0]))


def bench(fn, args, iters):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    hdr = (f"{'shape':24s} {'fwd g ms':>9s} {'fwd d ms':>9s} {'x':>5s} "
           f"{'vjp g ms':>9s} {'vjp d ms':>9s} {'x':>5s}")
    print(hdr)
    for label, px, c, o, g, stride in SHAPES:
        x = jnp.asarray(rng.standard_normal((BATCH, px, px, c)) * 0.1,
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, c // g, o)) * 0.05,
                        jnp.float32)
        wd = scatter_dense(w, g)

        f_g = jax.jit(functools.partial(conv_grouped, g=g, stride=stride))
        f_d = jax.jit(functools.partial(conv_dense, stride=stride))
        np.testing.assert_allclose(np.asarray(f_g(x, w)),
                                   np.asarray(f_d(x, wd)),
                                   rtol=1e-4, atol=1e-4)

        # activation-gradient VJP (the probe-backward path: grads flow to
        # the INPUT; weight grads are never needed by the factor capture)
        def vjp_in(fwd, xx, ww):
            _, pull = jax.vjp(lambda q: fwd(q, ww), xx)
            return pull(jnp.ones((BATCH, px // stride, px // stride, o),
                                 jnp.float32))[0]
        v_g = jax.jit(functools.partial(vjp_in, f_g))
        v_d = jax.jit(functools.partial(vjp_in, f_d))
        np.testing.assert_allclose(np.asarray(v_g(x, w)),
                                   np.asarray(v_d(x, wd)),
                                   rtol=1e-4, atol=1e-4)

        tfg = bench(f_g, (x, w), args.iters)
        tfd = bench(f_d, (x, wd), args.iters)
        tvg = bench(v_g, (x, w), args.iters)
        tvd = bench(v_d, (x, wd), args.iters)
        print(f"{label:24s} {1e3*tfg:9.3f} {1e3*tfd:9.3f} {tfg/tfd:5.2f} "
              f"{1e3*tvg:9.3f} {1e3*tvd:9.3f} {tvg/tvd:5.2f}", flush=True)


if __name__ == "__main__":
    main()
