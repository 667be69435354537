#!/bin/bash
# End-to-end pipeline proof on the real TPU chip (VERDICT r1 item 1).
#
# Drives the reference's published pipeline order (README.rst:226-244) —
# factors -> hyper (random, 5 calls) -> evaluate --ood — for every estimator
# on resnet18/synthetic (no datasets exist in this environment), all on the
# one real chip (no --platform override). Per-stage logs land in
# $ROOT/logs/<stage>.log; a wall-clock + exit-code summary is printed at the
# end and recorded in benchmarks/NOTES.md. One retry per stage absorbs
# transient axon-tunnel/remote-compile hiccups (see ROADMAP environment
# quirks); a stage failing twice aborts the run. Each attempt is bounded by
# STAGE_TIMEOUT (default 45 min — covers the worst observed cold INF compile
# at 630 s with 4x headroom): a wedged axon tunnel otherwise hangs a stage
# forever with no output, which stalls the whole chain silently.
set -u
cd /root/repo
ROOT=${1:-/tmp/tpu_e2e}
STAGE_TIMEOUT=${STAGE_TIMEOUT:-2700}
RES=$ROOT/results
rm -rf "$ROOT"
mkdir -p "$RES" "$ROOT/logs"

COMMON="--model resnet18 --data synthetic --root_dir $ROOT --results_dir $RES"
SUMMARY=$ROOT/summary.txt
: > "$SUMMARY"

stage() {  # stage <name> <cmd...>
    local name=$1; shift
    local log=$ROOT/logs/${name//\//_}.log
    local t0=$SECONDS rc attempt
    for attempt in 1 2; do
        timeout -k 30 "$STAGE_TIMEOUT" "$@" > "$log" 2>&1
        rc=$?
        [ $rc -eq 0 ] && break
        if [ $rc -eq 124 ]; then
            echo "stage $name attempt $attempt TIMED OUT after ${STAGE_TIMEOUT}s (wedged tunnel?); retrying" >&2
        else
            echo "stage $name attempt $attempt failed (rc=$rc); retrying" >&2
        fi
        tail -5 "$log" >&2
    done
    printf '%-16s %5ss  rc=%d  attempts=%d\n' \
        "$name" "$((SECONDS - t0))" "$rc" "$attempt" | tee -a "$SUMMARY"
    grep -E "^(NN |BNN|Minimal cost)" "$log" | sed 's/^/    /' \
        | tee -a "$SUMMARY"
    if [ $rc -ne 0 ]; then
        echo "== $name failed twice; last log: =="
        tail -30 "$log"
        exit $rc
    fi
}

# -- factors (kfac first: efb consumes its factors; inf consumes all three)
for est in kfac diag efb; do
    stage "factors/$est" python -m curvature_tpu.pipelines.factors \
        $COMMON --estimator $est --mc_samples 2
done
stage "factors/inf" python -m curvature_tpu.pipelines.factors \
    $COMMON --estimator inf --rank 50

# -- hyper (random, 5 calls) -> evaluate --ood per estimator
for est in diag kfac efb inf; do
    stage "hyper/$est" python -m curvature_tpu.pipelines.hyper \
        $COMMON --estimator $est --optimizer random --calls 5 --samples 3 \
        --rank 50
    stage "evaluate/$est" python -m curvature_tpu.pipelines.evaluate \
        $COMMON --estimator $est --samples 5 --ood --rank 50
done

# -- the remaining CLI surface: training, loss landscape, figure assembly
# training writes weights/<model>_<data>.npz, which build_model would pick
# up for every later (or re-run) stage — keep it in its own root so the
# chain's factors/evaluate artifacts stay consistent with the init weights
stage "training" python -m curvature_tpu.pipelines.training \
    --model resnet18 --data synthetic --root_dir $ROOT/train \
    --results_dir $RES --epochs 1
stage "loss1d" python -m curvature_tpu.pipelines.loss_landscape \
    $COMMON --loss1d
# visualize is host-side matplotlib; --platform cpu avoids compiling the
# largest-factor eigh on the chip just for a histogram
stage "visualize" python -m curvature_tpu.pipelines.visualize \
    $COMMON --estimator kfac --calibration --ood --eigvals --hyper \
    --summary --plot --platform cpu

echo "== TPU E2E summary =="
cat "$SUMMARY"
