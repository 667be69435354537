"""End-to-end Pallas patch-Gram policy A/B (VERDICT r3 #2 closure).

Measures the FULL ResNet-50 KFAC update step (forward + MC label draw +
probe backward + per-layer factor Grams) with the measured kernel policy
(``use_pallas='auto'`` -> select_patch_gram) vs the pure-XLA patch path
(``use_pallas=False``), so the per-shape standalone wins recorded in
benchmarks/NOTES.md (tiled 2.0x at F=577, 1.5x at F=1153; v2 1.6-1.8x on
stride-2) get an honest end-to-end delta.

Run on the TPU: ``python benchmarks/pallas_e2e_ab.py [--iters 10]``.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
# shared sync helper (axon tunnel rationale documented there); importing
# the suite also enables the persistent compile cache
from benchmarks.suite import device_sync


def measure(use_pallas, batch, iters, compute_dtype=None, subsample=1.0):
    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    est = estimators.KFAC(model, variables, use_pallas=use_pallas,
                          compute_dtype=compute_dtype,
                          token_subsample=subsample)
    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1),
                   donate_argnums=0)
    state = step(est.init_state(), variables, x, rng)
    device_sync(state)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state, variables, x, rng)
        device_sync(state)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    for tag, kw in [("f32", {}),
                    ("bf16", {"compute_dtype": jnp.bfloat16}),
                    ("bf16_sub4", {"compute_dtype": jnp.bfloat16,
                                   "subsample": 0.25})]:
        xla = measure(False, args.batch, args.iters, **kw)
        pal = measure("auto", args.batch, args.iters, **kw)
        print(json.dumps({
            "config": tag,
            "xla_ms": round(xla * 1e3, 2),
            "policy_ms": round(pal * 1e3, 2),
            "xla_img_s": round(args.batch / xla, 1),
            "policy_img_s": round(args.batch / pal, 1),
            "speedup": round(xla / pal, 3)}), flush=True)


if __name__ == "__main__":
    main()
