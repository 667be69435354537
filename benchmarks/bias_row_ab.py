"""A/B the bias-column Gram formulations (gram_roofline.py follow-up).

The +1 ones column makes every A-factor GEMM 128-misaligned (F=C*kh*kw+1),
measured 36-57% slower at F=4609 than the aligned F=4608 Gram. Candidates:

  direct    einsum over the ones-appended [N, F0+1] (status quo)
  assemble  aligned Gram of [N, F0] + column sums s, then block-assemble
            [[G0, s], [s^T, N]] (one concat copy of the [F,F] output)
  pad128    zero-pad the patch matrix to the next multiple of 128, Gram,
            slice back (zero cols -> zero rows/cols, sliced off)

Shapes: every misaligned XLA-path A-Gram in ResNet-50 at batch 16
(3x3 C>=256 layers + the 1x1 bottleneck convs; C<=128 3x3 go to pallas).

Run: python benchmarks/bias_row_ab.py [--iters N]
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


@jax.jit
def direct(a0):
    ones = jnp.ones((a0.shape[0], 1), a0.dtype)
    a = jnp.concatenate([a0, ones], 1)
    return jnp.einsum("ni,nj->ij", a, a,
                      preferred_element_type=jnp.float32) / a0.shape[0]


@jax.jit
def assemble(a0):
    n = a0.shape[0]
    g0 = jnp.einsum("ni,nj->ij", a0, a0,
                    preferred_element_type=jnp.float32)
    s = jnp.sum(a0, axis=0, dtype=jnp.float32)
    top = jnp.concatenate([g0, s[:, None]], 1)
    bot = jnp.concatenate([s, jnp.asarray([n], jnp.float32)])[None, :]
    return jnp.concatenate([top, bot], 0) / n


@jax.jit
def pad128(a0):
    n, f0 = a0.shape
    f = f0 + 1
    fp = -(-f // 128) * 128
    ones = jnp.ones((n, 1), a0.dtype)
    a = jnp.concatenate([a0, ones], 1)
    a = jnp.pad(a, ((0, 0), (0, fp - f)))
    g = jnp.einsum("ni,nj->ij", a, a, preferred_element_type=jnp.float32)
    return g[:f, :f] / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}", flush=True)
    # (F0, N): ResNet-50 b16 XLA-path A-Grams (3x3 C>=256 + all 1x1s)
    shapes = [
        (2304, 3136),   # layer3 3x3, 14x14
        (4608, 784),    # layer4 3x3, 7x7
        (256, 12544),   # layer2 1x1 reduce, 28x28
        (512, 3136),    # layer3 1x1 reduce
        (1024, 3136),   # layer3 1x1 expand input side (C=1024), 14x14
        (2048, 784),    # layer4 1x1, 7x7
    ]
    for f0, n in shapes:
        for dt in (jnp.float32, jnp.bfloat16):
            a0 = jax.random.normal(key, (n, f0), dt)
            t_d = timed(direct, (a0,), args.iters)
            t_a = timed(assemble, (a0,), args.iters)
            t_p = timed(pad128, (a0,), args.iters)
            ref = np.asarray(direct(a0), np.float64)
            err_a = np.abs(np.asarray(assemble(a0)) - ref).max()
            err_p = np.abs(np.asarray(pad128(a0)) - ref).max()
            print(f"F0={f0:5d} N={n:6d} {dt.__name__:9s} "
                  f"direct {1e3*t_d:6.2f} | assemble {1e3*t_a:6.2f} "
                  f"({t_d/t_a:4.2f}x, err {err_a:.1e}) | pad128 "
                  f"{1e3*t_p:6.2f} ({t_d/t_p:4.2f}x, err {err_p:.1e})",
                  flush=True)


if __name__ == "__main__":
    main()
