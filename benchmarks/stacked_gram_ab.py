"""Cross-layer Gram stacking A/B (round 5, VERDICT r4 item 2).

Same-shape token matrices across layers stacked into one batched Gram
einsum (KFAC stack_grams=True) vs the per-layer einsums, measured on the
full jitted ResNet-50 factor-update step (the driver's
resnet50_kfac_update_img_s metric) in f32, bf16, and bf16+sub4.

Run: python benchmarks/stacked_gram_ab.py [--iters N] [--batch B]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._timing import best_of, sync
from curvature_tpu import estimators, models




def run(batch, iters, compute_dtype, token_subsample, stacked, model,
        variables, x, rng):
    est = estimators.KFAC(model, variables, compute_dtype=compute_dtype,
                          token_subsample=token_subsample,
                          stack_grams=stacked)
    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                   donate_argnums=0)
    t0 = time.perf_counter()
    state = step(est.init_state(), variables, x, rng)
    sync(state)
    compile_s = time.perf_counter() - t0
    dt = best_of(lambda s: step(s, variables, x, rng), state, iters)
    return batch / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    from curvature_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (args.batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    print(f"device={jax.devices()[0]} batch={args.batch}", flush=True)
    print(f"{'config':14s} {'per-layer':>12s} {'stacked':>12s} "
          f"{'speedup':>8s}", flush=True)
    for tag, dt_, sub in [("f32", None, 1.0),
                          ("bf16", jnp.bfloat16, 1.0),
                          ("bf16+sub4", jnp.bfloat16, 0.25)]:
        base, c0 = run(args.batch, args.iters, dt_, sub, False,
                       model, variables, x, rng)
        stck, c1 = run(args.batch, args.iters, dt_, sub, True,
                       model, variables, x, rng)
        print(f"{tag:14s} {base:9.1f} i/s {stck:9.1f} i/s "
              f"{stck / base:7.2f}x   (compile {c0:.0f}s vs {c1:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
