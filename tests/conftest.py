"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding tests run on simulated devices
(``--xla_force_host_platform_device_count=8``), mirroring the reference's lack
of any distributed tests (SURVEY.md section 4) with an actual sharding suite.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by site customization (axon); the config
# update below still wins as long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests get their OWN persistent compile cache (NOT the pipelines' shared
# dir: that one also holds executables produced by the remote compile
# service, whose CPU target features differ from this host — XLA warns
# about possible SIGILL when loading them). Repeat lanes skip most of the
# CPU compile work, which dominates the quick lane's wall-clock.
if not os.environ.get("CURVATURE_TPU_NO_COMPILE_CACHE"):
    _cache = os.path.expanduser("~/.cache/curvature_tpu/xla-tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end tests (full-suite only; "
        "deselect with -m 'not slow' for the quick CI lane)")
