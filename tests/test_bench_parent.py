"""Driver-proofing contract of bench.py's parent loop (VERDICT r4 #1).

The round-4 artifact was destroyed by a driver timeout (rc=124) because
the headline metric was withheld for the final line. The contract now:

  * the LAST stdout line is ALWAYS the headline record with vs_baseline
    populated and an `extra` dict of everything measured so far;
  * a failing child and a watchdog-killed child are skipped loudly
    without poisoning the artifact;
  * the invariant holds at EVERY point, so an external kill at any moment
    still leaves a parseable artifact whose last line is the headline.

CURVATURE_TPU_BENCH_FAKE=1 swaps in stub metrics (one headline, one extra,
one that raises, one that sleeps past its 2 s watchdog) so this runs in CI
without a TPU.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_parent_last_line_is_always_headline(tmp_path):
    # the wedge sentinel makes the FIRST worker die before any output,
    # exercising the wedge-strike respawn (no metric may be blamed)
    env = dict(os.environ, CURVATURE_TPU_BENCH_FAKE="1",
               CURVATURE_TPU_BENCH_FAKE_WEDGE=str(tmp_path / "wedged"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    # EVERY printed line is a headline snapshot (kill-anywhere safety)
    for line in lines:
        rec = json.loads(line)
        assert rec["metric"] == "kfac_update_lenet5_mnist_b32_it_s"
        assert rec["vs_baseline"] is not None
        assert "extra" in rec
    final = json.loads(lines[-1])
    assert final["value"] == 1000.0
    assert final["extra"] == {"fake_extra_img_s":
                              {"value": 42.0, "unit": "img/s"}}
    # failure + watchdog skips are reported on stderr, not swallowed
    assert "boom" in proc.stderr and "slow" in proc.stderr
    # failed metrics get exactly one retry round
    assert "retry round" in proc.stderr
    # the simulated startup wedge cost a strike/respawn, not a metric:
    # the headline still carries its real value (asserted above)
    assert "wedge strike" in proc.stderr
