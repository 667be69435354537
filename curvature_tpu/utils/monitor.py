"""Telemetry: host/device memory, wall-clock timers, RNG seeding.

TPU-native analogue of the reference's tqdm RAM/VRAM postfix telemetry
(reference utils.py:270-285) plus jax.profiler integration.
"""
import contextlib
import os
import random
import time
from typing import Dict, Optional

import numpy as np


def ram() -> float:
    """System RAM utilization in percent (reference utils.py:270-276)."""
    import psutil
    return psutil.virtual_memory()[2]


def device_memory_gb(device=None) -> float:
    """Bytes in use on a jax device, in GB (the reference's ``vram``,
    utils.py:279-285)."""
    import jax
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return 0.0
    return stats.get("bytes_in_use", 0) / 1024.0 ** 3


class Timer:
    """Accumulating phase timer; blocks on device completion when given."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            import jax
            jax.block_until_ready(block_on)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (replaces the reference's absent profiler)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed numpy/python RNGs; auto-generate entropy-mixed seed when None
    (reference utils.py:313-330). jax RNG is explicit via PRNGKey."""
    if seed is None:
        from datetime import datetime
        seed = (os.getpid() + int(datetime.now().strftime("%S%f"))
                + int.from_bytes(os.urandom(2), "big")) % (2 ** 31)
    np.random.seed(seed % (2 ** 32))
    random.seed(seed)
    return seed
