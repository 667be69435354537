"""End-to-end smoke of benchmarks/real_parity.sh on fabricated idx data.

The harness itself (VERDICT r3 #8) targets real MNIST statistics; this
test runs the IDENTICAL script against synthetic idx files so the chain,
flag surface, artifact paths, and output parsing cannot rot while the
machine has no datasets (PARITY_SKIP_TARGETS=1 skips only the final
numeric diff)."""
import os
import struct
import subprocess

import numpy as np
import pytest


def _write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x800 + arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


@pytest.mark.slow
def test_real_parity_harness_runs(tmp_path):
    rng = np.random.default_rng(0)
    for name in ("MNIST", "KMNIST"):
        d = tmp_path / "datasets" / name / "raw"
        d.mkdir(parents=True)
        _write_idx(d / "train-images-idx3-ubyte",
                   rng.integers(0, 255, (64, 28, 28)))
        _write_idx(d / "train-labels-idx1-ubyte",
                   rng.integers(0, 10, (64,)))
        _write_idx(d / "t10k-images-idx3-ubyte",
                   rng.integers(0, 255, (10000, 28, 28)))
        _write_idx(d / "t10k-labels-idx1-ubyte",
                   rng.integers(0, 10, (10000,)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PARITY_SKIP_TARGETS="1", PARITY_PLATFORM="cpu")
    proc = subprocess.run(
        ["bash", os.path.join(repo, "benchmarks", "real_parity.sh"),
         str(tmp_path), str(tmp_path / "results")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "chain + parsing verified" in proc.stdout
    # the parsed rows made it through: both summary lines present
    assert "NN :" in proc.stdout and "BNN:" in proc.stdout
