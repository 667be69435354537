"""ResNet-50 KFAC factor-update batch-size scaling (round 5, VERDICT r4 item 2).

NOTES round-5 attribution: the b16 step's Gram phase is
scheduling/output-accumulation bound, ~6x above the HBM bandwidth bound.
If the step time is dominated by a per-step scheduling floor rather than
by per-image resources, throughput (img/s) should rise with batch size.
This harness measures the full jitted factor-update step at b16/b32/b64
in one process, f32 and (optionally) bf16.

Run: python benchmarks/batch_scaling_ab.py [--iters N] [--dtypes f32,bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._timing import sync
from curvature_tpu import estimators, models




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=str, default="16,32,64")
    ap.add_argument("--dtypes", type=str, default="f32")
    args = ap.parse_args()

    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, 224, 224, 3), jnp.float32))

    for dt_name in args.dtypes.split(","):
        cdt = jnp.bfloat16 if dt_name == "bf16" else None
        for b in (int(s) for s in args.batches.split(",")):
            # fresh estimator per batch: goes through the PRODUCT update()
            # path, so a Pallas scoped-vmem compile failure at large batch
            # exercises the automatic use_pallas fallback
            est = estimators.KFAC(model, variables, compute_dtype=cdt)
            x = jax.random.normal(rng, (b, 224, 224, 3), jnp.float32)
            est.update(x, rng=rng, num_samples=1)
            sync(est.state)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    est.update(x, rng=rng, num_samples=1)
                sync(est.state)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            note = "" if est.use_pallas else "  [pallas fell back]"
            print(f"{dt_name} b{b}: {best*1e3:8.2f} ms/step  "
                  f"{b/best:8.1f} img/s{note}", flush=True)


if __name__ == "__main__":
    main()
