"""Diagnose the INF `evaluate --ood` stage (VERDICT r2 weak #6: 630 s vs
185-379 s for the other estimators on identical eval work).

Reproduces the stage piecewise with wall-clock phase timers:

  1. construct INF from the saved diag/kfac/efb artifacts
     (pipelines/evaluate.load_estimator) — previously this eagerly ran
     `kfac_eigenvectors` over the FULL KFAC factors (ResNet-18: eigh of
     4608^2 and friends, plus their one-time compile) even though the
     evaluate stage loads the saved low-rank state and never calls
     update(); now lazy (estimators/inf.py eigvecs property).
  2. load the saved rank-50 low-rank state
  3. invert (per-bucketed-shape pre-sampler compile + run)
  4. in-domain NN+BNN eval pass
  5. OOD NN+BNN eval pass

`--eager-eigvecs` forces the old behavior for the A/B.

Run (artifacts from benchmarks/tpu_e2e.sh):
  python benchmarks/inf_eval_diag.py --root /tmp/tpu_e2e [--eager-eigvecs]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/tpu_e2e")
    ap.add_argument("--eager-eigvecs", action="store_true")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--rank", type=int, default=50)
    args = ap.parse_args()

    t0 = time.perf_counter()
    phases = []

    def phase(name):
        now = time.perf_counter()
        phases.append((name, now - phase.last))
        phase.last = now
        print(f"  [{name}] {phases[-1][1]:.1f} s", flush=True)
    phase.last = t0

    import jax
    from curvature_tpu.utils.config import setup
    from curvature_tpu.pipelines.common import build_model, build_ood_data
    from curvature_tpu.pipelines import evaluate as ev
    from curvature_tpu.eval import eval_nn_and_bnn

    cfg = setup([
        "--model", "resnet18", "--data", "synthetic",
        "--root_dir", args.root, "--results_dir", f"{args.root}/results",
        "--estimator", "inf", "--rank", str(args.rank),
        "--samples", str(args.samples), "--ood",
    ])
    print(f"device={jax.devices()[0]}", flush=True)
    phase("imports+jax-init")

    model, variables = build_model(cfg)
    phase("build_model")

    est = ev.load_estimator(cfg, model, variables)
    if args.eager_eigvecs:
        _ = est.eigvecs  # the pre-fix constructor behavior
        jax.block_until_ready(jax.tree_util.tree_leaves(est.eigvecs)[0])
        import numpy as np
        np.asarray(jax.tree_util.tree_leaves(est.eigvecs)[0].ravel()[0])
    phase("load_estimator" + ("+eager_eigvecs" if args.eager_eigvecs else ""))

    results_path, _ = __import__(
        "curvature_tpu.utils.checkpoint", fromlist=["results_paths"]
    ).results_paths(cfg)
    ev.invert_from_config(cfg, est, results_path)
    phase("invert")

    in_data, out_data = build_ood_data(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    preds, bnn_preds, labels, _ = eval_nn_and_bnn(
        model, variables, est, in_data, cfg.samples, rng, False)
    phase("eval in-domain")

    eval_nn_and_bnn(model, variables, est, out_data, cfg.samples, rng, False)
    phase("eval ood")

    total = time.perf_counter() - t0
    print(f"total {total:.1f} s")
    for name, dt in phases:
        print(f"  {name:28s} {dt:7.1f} s  {100 * dt / total:4.1f}%")


if __name__ == "__main__":
    main()
