"""What binds the factor-Gram GEMM? The bf16 attribution (bf16_attrib.py)
shows the Gram phase is dtype-insensitive (15.2 ms f32 vs 15.1 ms bf16 on
the ResNet-50 step) and runs at ~18 TFLOP/s — a third of f32 peak, a tenth
of bf16 peak. Candidate binders, each isolated here on one shape family:

  a. the self-transpose formulation (ni,nj->ij on one operand) vs a plain
     pre-transposed [F,N]@[N,F] GEMM
  b. 128-misalignment from the +1 bias row (F=4609 vs 4608) and the token
     count (N=784 vs 768)
  c. contraction depth: N=784 is shallow for an F=4609 output tile —
     sweep N to find where the MXU saturates
  d. f32 vs bf16 operands at fixed formulation

Run: python benchmarks/gram_roofline.py [--iters N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(v):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(v)[0].ravel()[0]))


def timed(fn, args, iters):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench(iters):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gram(p):                      # the product formulation
        return jnp.einsum("ni,nj->ij", p, p,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def gemm(pt, p):                  # pre-transposed plain GEMM
        return jnp.dot(pt, p, preferred_element_type=jnp.float32)

    print(f"device={jax.devices()[0]}", flush=True)
    print(f"{'case':38s} {'ms':>7s} {'TFLOP/s':>8s}", flush=True)
    for f, n, dt in [
        (4609, 784, jnp.float32), (4608, 784, jnp.float32),
        (4608, 768, jnp.float32), (4609, 784, jnp.bfloat16),
        (4608, 768, jnp.bfloat16),
        (4608, 1536, jnp.float32), (4608, 3072, jnp.float32),
        (4608, 6144, jnp.float32), (4608, 6144, jnp.bfloat16),
        (4608, 12288, jnp.bfloat16),
    ]:
        p = jax.random.normal(key, (n, f), dt)
        pt = jnp.asarray(p.T)
        flops = 2.0 * f * f * n
        t_g = timed(gram, (p,), iters)
        t_m = timed(gemm, (pt, p), iters)
        print(f"F={f} N={n} {dt.__name__:9s} gram   {1e3*t_g:7.2f} "
              f"{flops/t_g/1e12:8.1f}", flush=True)
        print(f"F={f} N={n} {dt.__name__:9s} gemm^T {1e3*t_m:7.2f} "
              f"{flops/t_m/1e12:8.1f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    bench(args.iters)
