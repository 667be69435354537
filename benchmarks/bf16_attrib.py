"""Attribute the bf16 factor-update shortfall (VERDICT r2 weak #2).

Round-2 measured bf16 at only 1.29x over f32 on the ResNet-50 KFAC update
where the MXU should approach 2x. Two experiments:

1. Step decomposition: forward-capture only, forward+probe-backward, and
   the full update (adds the factor Grams), each timed in f32 and bf16 —
   the deltas attribute the step to fwd / bwd / Grams per dtype.
2. Large-C A-Gram microscope: the tiled A/B showed XLA bf16 patch-Grams
   are SLOWER than f32 at C>=256 (0.59-0.72x). Separate patch extraction
   from the GEMM, and test the hybrid (bf16 extraction -> f32 cast ->
   f32 GEMM) that keeps the HBM-bound half in bf16 and gives the MXU the
   layout it likes.

Run: python benchmarks/bf16_attrib.py [--iters N]
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

from curvature_tpu import estimators, models
from curvature_tpu.estimators.capture import collect
from curvature_tpu.nn.core import LayerMeta
from curvature_tpu.ops.patches import extract_patches


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


def step_decomposition(iters, batch=16, model_name="resnet50"):
    model = models.build(model_name, num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        est = estimators.KFAC(model, variables, compute_dtype=dtype)

        @jax.jit
        def fwd_only(v, xx):
            v, xx = est._cast_compute(v, xx)
            logits, aux = model.apply(v, xx, train=True, capture=True)
            return logits, aux["acts"]

        @jax.jit
        def fwd_bwd(v, xx, r):
            v, xx = est._cast_compute(v, xx)
            cap = collect(model, est.metas, v, xx, rng=r, num_samples=1,
                          train=True, need_param_grads=False,
                          need_probe_grads=True)
            return cap.probe_grads

        # carry + donate the state exactly like benchmarks/suite.py — a
        # fresh init_state() per call dispatches ~100 MB of zero factors
        # through the tunnel and swamps the compute being measured
        step = jax.jit(lambda st, v, xx, r:
                       est._step_rng(st, v, xx, r, 1), donate_argnums=0)
        t_f = timed(fwd_only, (variables, x), iters)
        t_fb = timed(fwd_bwd, (variables, x, rng), iters)
        st = step(est.init_state(), variables, x, rng)
        sync(st)
        n = max(iters // 2, 4)
        t0 = time.perf_counter()
        for _ in range(n):
            st = step(st, variables, x, rng)
        sync(st)
        t_u = (time.perf_counter() - t0) / n
        print(f"[b{batch} {tag}] fwd {1e3*t_f:.1f} ms | +bwd {1e3*t_fb:.1f} "
              f"ms (bwd {1e3*(t_fb-t_f):.1f}) | full {1e3*t_u:.1f} ms "
              f"(grams {1e3*(t_u-t_fb):.1f}) | {batch/t_u:.0f} img/s",
              flush=True)


def gram_microscope(iters):
    """C=256/512 3x3 stride-1 A-Grams: extraction vs GEMM vs hybrid."""
    ks, pad, st = (3, 3), ((1, 1), (1, 1)), (1, 1)
    for (b, h, w, c) in ((16, 14, 14, 256), (16, 7, 7, 512)):
        meta = LayerMeta("l", "conv", 1, c * 9, True, ks, st, pad)
        for in_dtype in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c),
                                  in_dtype)

            @jax.jit
            def extract(v):
                return extract_patches(v, ks, st, pad).reshape(-1, c * 9)

            @functools.partial(jax.jit, static_argnames="cast")
            def gram(p, cast=False):
                if cast:
                    p = p.astype(jnp.float32)
                ones = jnp.ones((p.shape[0], 1), p.dtype)
                p1 = jnp.concatenate([p, ones], 1)
                return jnp.einsum("ni,nj->ij", p1, p1,
                                  preferred_element_type=jnp.float32)

            @functools.partial(jax.jit, static_argnames="cast")
            def full(v, cast=False):
                return gram(extract(v), cast=cast)

            p = extract(x)
            t_ex = timed(extract, (x,), iters)
            t_gm = timed(lambda q: gram(q), (p,), iters)
            t_all = timed(lambda v: full(v), (x,), iters)
            row = (f"{h}x{w}x{c} {in_dtype.__name__}: extract "
                   f"{1e3*t_ex:.2f} | gemm {1e3*t_gm:.2f} | fused "
                   f"{1e3*t_all:.2f}")
            if in_dtype == jnp.bfloat16:
                t_hyb = timed(lambda v: full(v, cast=True), (x,), iters)
                row += f" | hybrid(cast-f32) {1e3*t_hyb:.2f}"
            print(row + " ms", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="resnet50",
                    help="any zoo name; e.g. resnext50_32x4d attributes "
                    "the grouped-factor step")
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-microscope", action="store_true")
    args = ap.parse_args()
    print(f"device={jax.devices()[0]}", flush=True)
    if not args.skip_microscope:
        gram_microscope(args.iters)
    if not args.skip_step:
        step_decomposition(args.iters, args.batch, args.model)
