"""Executable examples stay executable (they are documentation)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        cwd=ROOT, capture_output=True, text=True, timeout=900)


def test_blitz_example():
    res = _run("blitz.py", "--samples", "3", "--mc_samples", "1",
               "--platform", "cpu")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "accuracy" in res.stdout.lower()


def test_modern_laplace_example():
    res = _run("modern_laplace.py", "--platform", "cpu", "--epochs", "2",
               "--samples", "4")
    assert res.returncode == 0, res.stderr[-2000:]
    for marker in ("MAP", "KFAC GLM", "last-layer", "SWAG",
                   "log marginal likelihood"):
        assert marker in res.stdout, (marker, res.stdout[-2000:])


def test_ewc_example():
    res = _run("ewc.py", "--platform", "cpu", "--steps", "150")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "EWC retention gain" in res.stdout


def test_influence_example():
    res = _run("influence.py", "--platform", "cpu", "--steps", "250")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "influence OK" in res.stdout


def test_moe_laplace_example():
    res = _run("moe_laplace.py", "--platform", "cpu", "--samples", "3",
               "--batches", "2")
    assert res.returncode == 0, res.stderr[-2000:]
    for marker in ("per-expert A factors", "expert utilization",
                   "per-token NLL"):
        assert marker in res.stdout, res.stdout[-2000:]
    # under the test env's 8 virtual devices the ep-sharded parity
    # section must have executed too
    assert "expert-sharded factors" in res.stdout, res.stdout[-2000:]
