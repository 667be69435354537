#!/bin/bash
# Real-data statistical-parity harness (VERDICT r3 #8) — ready to fire the
# moment MNIST files exist on this machine.
#
# Reproduces the reference tutorial chain (tutorial.ipynb cells 7-20) on
# LeNet-5/MNIST with the bundled reference checkpoint (auto-converted by
# pipelines.common.build_model) and diffs the resulting accuracy/ECE
# against the published targets (BASELINE.md):
#
#   NN  : accuracy 94.11 %, ECE 0.79 %          (cell 7 / cell 20)
#   BNN : accuracy 94.11 %, ECE 0.78 %          (INF, 10 posterior samples,
#                                                add=1e15 multiply=1e20,
#                                                cells 17-18 / 20)
#
# Usage:
#   benchmarks/real_parity.sh <data_root> [results_dir]
#
#   <data_root>/datasets/MNIST/raw/ must hold the four idx files
#   (train/t10k images+labels, .gz accepted — the torchvision layout the
#   reference reads, datasets.py:265-315); KMNIST/raw likewise — the
#   reference's evaluate pairs MNIST with KMNIST as the OOD set
#   (evaluate.py:221-243), and the BNN stats come from that chain's
#   in-domain pass.
#
# Env knobs:
#   PARITY_TOL_ACC (default 0.5, abs %) PARITY_TOL_ECE (default 0.3, abs %)
#   PARITY_SKIP_TARGETS=1  run the chain + parsing but skip the target
#                          diff (the synthetic-data CI smoke uses this —
#                          fabricated idx files prove the harness, not the
#                          statistics).
#   PARITY_PLATFORM=cpu    force a jax platform (--platform) — the CI
#                          smoke pins cpu; unset = the default device.
set -u -o pipefail
ROOT="${1:?usage: real_parity.sh <data_root> [results_dir]}"
RESULTS="${2:-$ROOT/parity_results}"
cd "$(dirname "$0")/.."
PLATFORM_FLAGS=()
if [ -n "${PARITY_PLATFORM:-}" ]; then
    PLATFORM_FLAGS=(--platform "$PARITY_PLATFORM")
fi

if [ ! -d "$ROOT/datasets/MNIST/raw" ] \
        || [ ! -d "$ROOT/datasets/KMNIST/raw" ]; then
    echo "real_parity: need $ROOT/datasets/{MNIST,KMNIST}/raw idx files" >&2
    exit 2
fi
mkdir -p "$RESULTS"

COMMON=(--model lenet5 --data mnist --root_dir "$ROOT"
        --results_dir "$RESULTS" "${PLATFORM_FLAGS[@]}")

run_factors() {  # est mc_samples
    echo "== factors $1 (mc=$2)"
    python -m curvature_tpu.pipelines.factors "${COMMON[@]}" \
        --estimator "$1" --mc_samples "$2" --rank 100 || exit 1
}

# the tutorial's MC budgets: Diagonal/EFB 10, KFAC 1 (cells 9/11/13);
# INF builds from the saved diag+kfac+efb artifacts at rank 100 (cell 15)
run_factors diag 10
run_factors kfac 1
run_factors efb 10
run_factors inf 1

echo "== evaluate inf (10 posterior samples, add=1e15 multiply=1e20)"
EVAL_OUT="$RESULTS/evaluate_inf.log"
python -m curvature_tpu.pipelines.evaluate "${COMMON[@]}" \
    --estimator inf --rank 100 --norm 1e15 --scale 1e20 \
    --samples 10 --ood | tee "$EVAL_OUT" || exit 1

python - "$EVAL_OUT" <<'EOF'
import os
import re
import sys

text = open(sys.argv[1]).read()
rows = {}
for tag in ("NN", "BNN"):
    # anchored: "NN" must not match inside the "BNN:" line
    m = re.search("^" + tag + r"\s*: accuracy ([\d.]+)% \| ECE ([\d.]+)%",
                  text, re.MULTILINE)
    if not m:
        sys.exit(f"real_parity: no '{tag}' summary line in {sys.argv[1]}")
    rows[tag] = (float(m.group(1)), float(m.group(2)))

targets = {"NN": (94.11, 0.79), "BNN": (94.11, 0.78)}  # BASELINE.md
tol_acc = float(os.environ.get("PARITY_TOL_ACC", 0.5))
tol_ece = float(os.environ.get("PARITY_TOL_ECE", 0.3))
skip = os.environ.get("PARITY_SKIP_TARGETS") == "1"

ok = True
for tag, (acc, ece) in rows.items():
    tacc, tece = targets[tag]
    line = (f"{tag:3s}: accuracy {acc:6.2f}% (target {tacc}%, "
            f"diff {acc - tacc:+.2f}) | ECE {ece:5.2f}% "
            f"(target {tece}%, diff {ece - tece:+.2f})")
    print(line)
    if not skip and (abs(acc - tacc) > tol_acc or abs(ece - tece) > tol_ece):
        ok = False
if skip:
    print("real_parity: PARITY_SKIP_TARGETS=1 — chain + parsing verified, "
          "target diff skipped (synthetic data)")
elif ok:
    print("real_parity: PASS — within tolerance of the reference tutorial")
else:
    print("real_parity: FAIL — outside tolerance")
    sys.exit(1)
EOF
