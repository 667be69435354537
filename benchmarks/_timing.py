"""Shared timing helpers for the A/B harnesses.

One copy, because the donated-buffer threading bug (restarting a timing
block from an already-donated state) had to be patched in three separate
harness-local copies this round.
"""
import time

import numpy as np
import jax


def sync(v):
    """True device sync: jax.block_until_ready does not block on the axon
    tunnel backend; fetch a data-dependent scalar instead."""
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(v)[0].ravel()[0]))


def best_of(fn, state, iters, blocks=3):
    """Best-of-N timing blocks of ``iters`` chained ``state = fn(state)``
    steps. The state is THREADED across blocks: the jitted step donates
    its input buffer, so restarting a block from the original ``state``
    would dispatch a deleted buffer (the axon backend reports that as an
    async INVALID_ARGUMENT at the sync, not at dispatch). Returns seconds
    per step."""
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = fn(state)
        sync(state)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
