"""A/B the stride-2 pallas patch-Gram against the XLA patch path on the
real chip (ResNet downsampling-conv shapes). Correctness is asserted at
1e-3 relative Frobenius error; timings use the host-fetch sync (NOTES.md).

Run: python benchmarks/stride2_ab.py [--interpret]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import LayerMeta
from curvature_tpu.estimators.base import act_tokens
from curvature_tpu.ops.pallas.patch_gram import (patch_gram_v2,
                                                 patch_gram_v2_supported)

SHAPES = [  # (batch, h, w, c, strides) — ResNet-50 downsample 3x3 convs
    (16, 56, 56, 128, (2, 2)),
    (16, 28, 28, 256, (2, 2)),
    (16, 14, 14, 512, (2, 2)),
    (16, 28, 28, 128, (1, 1)),   # stride-1 control (round-1 measured 1.4x)
]
PAD = ((1, 1), (1, 1))


import functools


@functools.partial(jax.jit, static_argnames=("ks", "pad", "strides"))
def xla_gram(x, ks, pad, strides):
    meta = LayerMeta("l", "conv", 1, x.shape[-1] * ks[0] * ks[1], True,
                     ks, strides, pad)
    a = act_tokens(meta, x, append_ones=True)
    return jnp.einsum("ni,nj->ij", a, a, preferred_element_type=jnp.float32)


def sync(v):
    np.asarray(jax.device_get(v.ravel()[0]))


def bench(fn, x, iters=50):
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
    args = ap.parse_args()
    ks = (3, 3)
    for b, h, w, c, strides in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c),
                              jnp.float32)
        supported = patch_gram_v2_supported(c, ks, strides, h, w)
        if not supported and not args.interpret:
            # compiling past the gate OOMs VMEM (the f1^2 accumulator);
            # the gate is the contract — skip, do not crash
            print(f"{h}x{w}x{c} s{strides[0]}: gated_on=False (skipped)")
            continue
        ref = np.asarray(xla_gram(x, ks=ks, pad=PAD, strides=strides))
        got = np.asarray(patch_gram_v2(x, ks, PAD, strides,
                                       interpret=args.interpret))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert err < 1e-3, f"{(h, w, c, strides)}: rel err {err:.2e}"
        t_xla = bench(lambda v: xla_gram(v, ks=ks, pad=PAD,
                                         strides=strides), x)
        t_pal = bench(lambda v: patch_gram_v2(v, ks, PAD, strides,
                                              interpret=args.interpret), x)
        print(f"{h}x{w}x{c} s{strides[0]}: xla {t_xla * 1e3:.2f} ms, "
              f"pallas {t_pal * 1e3:.2f} ms ({t_xla / t_pal:.2f}x), "
              f"rel_err {err:.1e}, gated_on={supported}")


if __name__ == "__main__":
    main()
