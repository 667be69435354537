"""Benchmark: KFAC factor update throughput, LeNet-5/MNIST blitz config.

Headline comparison against the reference's only published timing for this
exact workload: the tutorial notebook's KFAC update loop on LeNet-5/MNIST at
batch 32 with 1 MC label sample ran at ~259 it/s on the authors' GPU
(BASELINE.md, tutorial.ipynb cell 11). One "iteration" is the full reference
semantics per batch: forward pass, MC label draw from the model distribution,
backward pass, and the per-layer factor products + accumulation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp


def device_sync(tree):
    """True device sync: jax.block_until_ready does not block on the axon
    tunnel backend; fetch a data-dependent scalar instead."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

BASELINE_IT_S = 259.0  # tutorial.ipynb cell 11 (unstated GPU)
BATCH = 32
MC_SAMPLES = 1
WARMUP = 5
ITERS = 600


def main():
    from curvature_tpu import estimators, models

    model = models.lenet5()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (BATCH, 28, 28, 1), jnp.float32)
    variables = model.init(rng, x0)
    est = estimators.KFAC(model, variables)

    def step(state, variables, x, rng):
        from curvature_tpu.estimators.capture import collect
        cap = collect(model, est.metas, variables, x, rng=rng,
                      num_samples=MC_SAMPLES, train=True)
        return est.update_state(state, cap)

    step = jax.jit(step, donate_argnums=0)

    # distinct batches so the device can't cache anything across iterations
    data = [jax.random.normal(jax.random.PRNGKey(i), (BATCH, 28, 28, 1),
                              jnp.float32) for i in range(8)]
    rngs = [jax.random.PRNGKey(1000 + i) for i in range(8)]

    state = est.init_state()
    for i in range(WARMUP):
        state = step(state, variables, data[i % 8], rngs[i % 8])
    device_sync(state)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state = step(state, variables, data[i % 8], rngs[i % 8])
    device_sync(state)
    dt = time.perf_counter() - t0

    it_s = ITERS / dt
    print(json.dumps({
        "metric": "kfac_update_lenet5_mnist_b32_it_s",
        "value": round(it_s, 2),
        "unit": "it/s",
        "vs_baseline": round(it_s / BASELINE_IT_S, 3),
    }))


if __name__ == "__main__":
    main()
