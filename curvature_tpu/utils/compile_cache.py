"""Persistent XLA compilation cache.

On this deployment a *remote* compile service makes every distinct program
cost ~10-300 s to compile regardless of size (a 4608^2 batched eigh: 209 s
compile, 5 s execute; even a top-k: 33 s). The persistent cache makes those
one-time-per-machine instead of one-time-per-process: measured 214 s -> 70 s
for the eigh program and 33.7 s -> 2.4 s for top-k on the second process.

Enabled by every pipeline CLI (utils/config.setup) and the benchmark
suite. Opt out with CURVATURE_TPU_NO_COMPILE_CACHE=1; relocate with the
standard JAX_COMPILATION_CACHE_DIR.
"""
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/curvature_tpu/xla")


def enable_persistent_cache(path: str = "") -> str:
    """Idempotently enable the JAX persistent compilation cache."""
    import jax

    if os.environ.get("CURVATURE_TPU_NO_COMPILE_CACHE"):
        return ""
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold (1 s) skips small programs, but on a remote compile
    # service even tiny programs cost seconds to build — cache everything
    # that took non-trivial time.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
