from curvature_tpu.utils.config import Config, parse_args, setup
from curvature_tpu.utils.checkpoint import (
    save_pytree, load_pytree, factors_path, results_paths,
)
from curvature_tpu.utils.monitor import ram, device_memory_gb, Timer, seed_all_rng

__all__ = [
    "Config", "parse_args", "setup",
    "save_pytree", "load_pytree", "factors_path", "results_paths",
    "ram", "device_memory_gb", "Timer", "seed_all_rng",
]
