"""Production-scale example: ResNet-50 KFAC on TPU.

Demonstrates the scale knobs: bfloat16 compute, state donation, device
prefetch, mesh sharding, sample-chunked Bayesian eval, and the serving
predictor with uncertainty decomposition. Runs on synthetic data (swap the
loader for data.loaders.imagenet with a real ImageNet tree).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu import estimators, models, parallel
from curvature_tpu.data import DevicePrefetcher
from curvature_tpu.eval import BayesianPredictor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    print("Building ResNet-50")
    model = models.resnet50(num_classes=1000)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.batch, 224, 224, 3), jnp.float32)
    variables = model.init(rng, x0)

    est = estimators.KFAC(
        model, variables,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)

    # synthetic input pipeline with device prefetch
    host = np.random.default_rng(0)
    batches = [(host.standard_normal((args.batch, 224, 224, 3),
                                     dtype=np.float32), None)
               for _ in range(4)]
    loader = DevicePrefetcher([(x, np.zeros(len(x), np.int32))
                               for x, _ in batches])

    print("Estimating factors")
    step = jax.jit(est._step_rng, static_argnums=4, donate_argnums=0)
    state = est.init_state()
    # compile warmup before timing
    x0_dev, _ = next(iter(loader))
    state = step(state, variables, x0_dev, jax.random.PRNGKey(99), 1)
    leaf0 = jax.tree_util.tree_leaves(state)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf0)[0]))
    t0 = time.perf_counter()
    n = 0
    for i in range(args.steps):
        for x, _ in loader:
            rng, key = jax.random.split(rng)
            state = step(state, variables, x, key, 1)
            n += args.batch
    leaf = jax.tree_util.tree_leaves(state)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))   # true sync
    print(f"factor update: {n / (time.perf_counter() - t0):.0f} img/s")
    est.state = state

    print("Invert + predictor")
    est.invert(add=1.0, multiply=18916.0)            # README.rst ResNet18 row
    pred = BayesianPredictor(model, variables, est, samples=30,
                             rng=jax.random.PRNGKey(1))
    out = pred(batches[0][0])
    print("mean prob shape:", out.mean.shape,
          "| mean epistemic:", float(jnp.mean(out.epistemic)))


if __name__ == "__main__":
    main()
