"""Benchmark: KFAC factor update throughput, LeNet-5/MNIST blitz config.

Headline comparison against the reference's only published timing for this
exact workload: the tutorial notebook's KFAC update loop on LeNet-5/MNIST at
batch 32 with 1 MC label sample ran at ~259 it/s on the authors' GPU
(BASELINE.md, tutorial.ipynb cell 11). One "iteration" is the full reference
semantics per batch: forward pass, MC label draw from the model distribution,
backward pass, and the per-layer factor products + accumulation.

Batches are folded through one jitted lax.scan (the framework's batched
ingest path, Estimator.update_batches) with a fresh MC label draw per batch;
throughput is per-batch update steps per second, synced to the device by a
host fetch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

from curvature_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def device_sync(tree):
    """True device sync: jax.block_until_ready does not block on the axon
    tunnel backend; fetch a data-dependent scalar instead."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))

BASELINE_IT_S = 259.0  # tutorial.ipynb cell 11 (unstated GPU)
BATCH = 32
MC_SAMPLES = 1
SCAN_T = 32            # batches folded per dispatch
REPS = 20


def _probe_backend(timeout_s: float = 300.0):
    """Fail FAST if the device backend never comes up (a wedged axon
    tunnel hangs jax backend initialization indefinitely — better a
    non-zero exit the driver can record than an eternal hang)."""
    import sys
    import threading
    out = []
    t = threading.Thread(target=lambda: out.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print(f"bench: jax backend init did not return within {timeout_s}s "
              "(tunnel wedged?) — aborting", file=sys.stderr)
        sys.exit(2)
    return out[0]


def main():
    from curvature_tpu import estimators, models

    _probe_backend()

    model = models.lenet5()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (BATCH, 28, 28, 1), jnp.float32)
    variables = model.init(rng, x0)
    est = estimators.KFAC(model, variables)

    xs = jax.random.normal(jax.random.PRNGKey(1),
                           (SCAN_T, BATCH, 28, 28, 1), jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(2), SCAN_T)
    scan = est._jit_update_scan

    state = scan(est.init_state(), variables, xs, rngs, MC_SAMPLES)
    device_sync(state)

    # best of 3 measurement blocks: the axon tunnel's dispatch latency
    # varies minute-to-minute by >40%; the max is the reproducible
    # device-bound number (each block is still REPS*SCAN_T = 640 full
    # update steps, synced)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            state = scan(state, variables, xs, rngs, MC_SAMPLES)
        device_sync(state)
        best_dt = min(best_dt, time.perf_counter() - t0)

    it_s = REPS * SCAN_T / best_dt
    print(json.dumps({
        "metric": "kfac_update_lenet5_mnist_b32_it_s",
        "value": round(it_s, 2),
        "unit": "it/s",
        "vs_baseline": round(it_s / BASELINE_IT_S, 3),
    }))


if __name__ == "__main__":
    main()
