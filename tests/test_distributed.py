"""Real multi-process distributed execution (VERDICT r1 item 6).

Spawns 2 OS processes (4 virtual CPU devices each) joined via
``jax.distributed.initialize`` over localhost, runs one batch-sharded
Diagonal factor update on the global 8-device mesh, and checks the result
equals the single-process computation — executing the multi-process
branches of parallel/distributed.py that no in-process test can reach.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_sharded_update(tmp_path):
    port = _free_port()
    out = str(tmp_path / "proc0_state.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "distributed_worker.py"),
             str(port), str(pid), "2", out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o}"
    assert os.path.exists(out)

    # single-process ground truth (same deterministic inputs as the worker)
    from curvature_tpu import estimators, models
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 5)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 16))
    model = models.mlp([7], 4)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    est = estimators.Diagonal(model, variables)
    est.update(jnp.asarray(x), labels=jnp.asarray(labels))

    dist = np.load(out)
    assert set(dist.files) == set(est.state)
    for name in est.state:
        np.testing.assert_allclose(dist[name], np.asarray(est.state[name]),
                                    rtol=1e-5, atol=1e-6)
