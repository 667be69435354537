"""A/B: fused G-Gram backward (gram-tap) vs materialized probe gradients.

VERDICT r3 next-round #3: the [S, B, H, W, O] probe gradients round-trip
HBM between the vjp (7.7 ms in the r3 ablation) and the G-factor Gram
einsums; `KFAC(fused_g=True)` reduces each layer's gradient to its
[out, out] token Gram inside the backward (nn.core.gram_tap custom_vjp)
so the probe tensors never become vjp outputs.

Measures the FULL KFAC update step (forward + MC draw + backward +
factor Grams + accumulate) on ResNet-50, f32 and bf16(+subsample),
fused vs probe path, plus the peak-HBM estimate per compiled program
(compiled memory analysis — the fused path's scheduling freedom should
show up there even if wall time ties).

Run: python benchmarks/fused_gbwd_ab.py [--iters N] [--batch B] [--model M]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models
# one shared sync helper (axon tunnel rationale documented there) + the
# persistent compile cache the other A/B drivers use
from benchmarks.suite import device_sync as sync


def measure(est, variables, x, iters):
    step = jax.jit(lambda st, v, xx, r: est._step_rng(st, v, xx, r, 1))
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = step(est.init_state(), variables, x, rng)
    sync(state)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state, variables, x, rng)
        sync(state)
        best = min(best, (time.perf_counter() - t0) / iters)
    peak = None
    try:
        lowered = step.lower(est.init_state(), variables, x, rng)
        mem = lowered.compile().memory_analysis()
        if mem is not None:
            peak = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        pass
    return best, compile_s, peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="resnet50")
    args = ap.parse_args()

    model = models.build(args.model, num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (args.batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x)
    print(f"device={jax.devices()[0]} model={args.model} "
          f"batch={args.batch}", flush=True)

    configs = [
        ("f32", dict()),
        ("bf16", dict(compute_dtype=jnp.bfloat16)),
        ("bf16+sub4", dict(compute_dtype=jnp.bfloat16,
                           token_subsample=0.25)),
    ]
    for tag, kw in configs:
        row = {}
        for fused in (False, True):
            est = estimators.KFAC(model, variables, fused_g=fused, **kw)
            n_fused = len(est.gram_probe_names)
            dt, comp, peak = measure(est, variables, x, args.iters)
            row[fused] = dt
            peak_s = f"{peak / 2**20:.0f} MiB" if peak else "n/a"
            print(f"  {tag:10s} fused={int(fused)} ({n_fused:3d} layers): "
                  f"{dt * 1e3:8.2f} ms/step  "
                  f"{args.batch / dt:8.1f} img/s  "
                  f"compile {comp:5.1f} s  peak-temp {peak_s}", flush=True)
        print(f"  {tag:10s} fused speedup: {row[False] / row[True]:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
