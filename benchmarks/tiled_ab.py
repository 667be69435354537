"""A/B the tiled patch-Gram kernel against the XLA patch path and the
whole-image v2 kernel on every distinct ResNet-50 3x3-conv shape — the
layers that carry the factor-Gram FLOPs (55% of the KFAC update step by
round-2 ablation). Correctness asserted against the XLA path at 1e-3
relative; timings use the host-fetch sync (benchmarks/NOTES.md).

Run: python benchmarks/tiled_ab.py [--interpret] [--bf16] [--iters N]
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

from curvature_tpu.nn.core import LayerMeta
from curvature_tpu.estimators.base import act_tokens
from curvature_tpu.ops.pallas.patch_gram import (
    patch_gram_tiled, patch_gram_tiled_supported, patch_gram_v2,
    patch_gram_v2_supported, tiled_plan)

SHAPES = [  # (batch, h, w, c, strides) — every distinct ResNet-50 3x3 conv
    (16, 56, 56, 64, (1, 1)),     # layer1 (x3), F=577
    (16, 56, 56, 128, (2, 2)),    # layer2.0, F=1153
    (16, 28, 28, 128, (1, 1)),    # layer2 (x3), F=1153
    (16, 28, 28, 256, (2, 2)),    # layer3.0, F=2305
    (16, 14, 14, 256, (1, 1)),    # layer3 (x5), F=2305
    (16, 14, 14, 512, (2, 2)),    # layer4.0, F=4609
    (16, 7, 7, 512, (1, 1)),      # layer4 (x2), F=4609
]
PAD = ((1, 1), (1, 1))


@functools.partial(jax.jit, static_argnames=("ks", "pad", "strides"))
def xla_gram(x, ks, pad, strides):
    meta = LayerMeta("l", "conv", 1, x.shape[-1] * ks[0] * ks[1], True,
                     ks, strides, pad)
    a = act_tokens(meta, x, append_ones=True)
    return jnp.einsum("ni,nj->ij", a, a, preferred_element_type=jnp.float32)


def sync(v):
    np.asarray(jax.device_get(v.ravel()[0]))


def bench(fn, x, iters):
    out = fn(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    ks = (3, 3)
    print(f"dtype={dtype.__name__} iters={args.iters} "
          f"device={jax.devices()[0]}")
    for (b, h, w, c, st) in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), dtype)
        f1 = c * 9 + 1
        row = f"{h}x{w}x{c} s{st[0]} F={f1}:"
        want = np.asarray(xla_gram(x, ks, PAD, st), np.float64)
        t_xla = bench(lambda v: xla_gram(v, ks, PAD, st), x, args.iters)
        row += f" xla {1e3 * t_xla:.2f}ms"
        if patch_gram_v2_supported(c, ks, st, h, w, x.dtype.itemsize):
            got = np.asarray(patch_gram_v2(x, ks, PAD, st,
                                           interpret=args.interpret))
            err = np.abs(got - want).max() / np.abs(want).max()
            t = bench(lambda v: patch_gram_v2(v, ks, PAD, st,
                                              interpret=args.interpret),
                      x, args.iters)
            row += f" | v2 {1e3 * t:.2f}ms ({t_xla / t:.2f}x, err {err:.1e})"
        else:
            row += " | v2 unsupported"
        if patch_gram_tiled_supported(c, ks, st, h, w, b, x.dtype.itemsize):
            plan = tiled_plan(c, ks, st, h, w, b, x.dtype.itemsize)
            got = np.asarray(patch_gram_tiled(x, ks, PAD, st,
                                              interpret=args.interpret))
            err = np.abs(got - want).max() / np.abs(want).max()
            t = bench(lambda v: patch_gram_tiled(v, ks, PAD, st,
                                                 interpret=args.interpret),
                      x, args.iters)
            row += (f" | tiled{plan} {1e3 * t:.2f}ms "
                    f"({t_xla / t:.2f}x, err {err:.1e})")
        else:
            row += " | tiled unsupported"
        print(row, flush=True)


if __name__ == "__main__":
    main()
