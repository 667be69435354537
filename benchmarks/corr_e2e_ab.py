"""Correlation patch-Gram whole-step A/B (round 5, VERDICT r4 item 2).

corr_gram=True (stride-1 3x3 A factors via windowed channel correlations,
ops/corr_gram.py) vs corr_gram=False, measured on the full jitted
ResNet-50 factor-update step (the driver's resnet50_kfac_update_img_s
metric) in f32 and bf16. Standalone per-shape timings are unreliable on
this deployment (NOTES: ~0.28 ms/call dispatch floor); only this
whole-step A/B carries the verdict.

Run: python benchmarks/corr_e2e_ab.py [--iters N] [--batch B]
     [--min_c C] [--min_hw H]
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




def run(batch, iters, compute_dtype, corr, model, variables, x, rng,
        min_c, min_hw, grouped=False):
    est = estimators.KFAC(model, variables, compute_dtype=compute_dtype,
                          corr_gram=corr, corr_gram_grouped=grouped,
                          corr_gram_min_channels=min_c,
                          corr_gram_min_extent=min_hw)
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
    ap.add_argument("--min_c", type=int, default=128)
    ap.add_argument("--min_hw", type=int, default=14)
    ap.add_argument("--model", default="resnet50",
                    help="resnet50 (dense corr) or a grouped-conv model "
                         "like efficientnet_b0 (adds the corr_gram_grouped "
                         "A/B row)")
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args()
    from curvature_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    model = getattr(models, args.model)(num_classes=1000)
    grouped_model = args.model != "resnet50"
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (args.batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    print(f"device={jax.devices()[0]} model={args.model} "
          f"batch={args.batch} gate=(C>={args.min_c}, hw>={args.min_hw})",
          flush=True)
    print(f"{'config':14s} {'base':>12s} {'corr':>12s} {'speedup':>8s}",
          flush=True)
    dts = {"f32": None, "bf16": jnp.bfloat16}
    for tag in args.dtypes.split(","):
        dt_ = dts[tag]
        base, c0 = run(args.batch, args.iters, dt_, False,
                       model, variables, x, rng, args.min_c, args.min_hw)
        corr, c1 = run(args.batch, args.iters, dt_, True,
                       model, variables, x, rng, args.min_c, args.min_hw,
                       grouped=grouped_model)
        print(f"{tag:14s} {base:9.1f} i/s {corr:9.1f} i/s "
              f"{corr / base:7.2f}x   (compile {c0:.0f}s vs {c1:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
