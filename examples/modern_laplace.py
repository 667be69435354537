"""The modern Laplace workflow in one script (round-3 toolbox tour).

Trains a small model, then compares calibrated predictives side by side:

  MAP            plain softmax
  MAP + temp     temperature scaling (Guo et al., 2017)
  KFAC sampled   the reference's MC push-through
  KFAC GLM       linearized-Laplace predictive (Immer et al., 2021)
  last-layer     subnetwork Laplace via layer_filter='last'
  SWAG           SGD-iterate Gaussian (Maddox et al., 2019)

with damping tuned by evidence gradient ascent (no validation passes).

    python examples/modern_laplace.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from curvature_tpu import laplace
from curvature_tpu.estimators.swag import SWAG
from curvature_tpu.eval import (eval_bnn, eval_nn, eval_nn_temperature,
                                metrics)
from curvature_tpu.utils.config import Config
from curvature_tpu.pipelines.common import build_data, build_model
from curvature_tpu.pipelines import training


def row(name, probs, labels):
    acc = float(metrics.accuracy(probs, labels))
    ece = 100 * float(metrics.expected_calibration_error(probs, labels)[0])
    nll = float(metrics.negative_log_likelihood(probs, labels))
    print(f"{name:<14} acc {acc:6.2f}%   ECE {ece:5.2f}%   NLL {nll:.4f}")
    return acc, ece, nll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--samples", type=int, default=20)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = Config(model="lenet5", data="synthetic", batch_size=64,
                 epochs=args.epochs, lr=5e-2, samples=args.samples,
                 swag=True, seed=0)
    model, variables = build_model(cfg)
    train_data = list(build_data(cfg, splits="train"))
    test_data = list(build_data(cfg, splits="test"))

    print(f"Training ({cfg.epochs} epochs) with SWAG collection...")
    swag = SWAG(model, variables, max_rank=cfg.swag_rank)
    variables, _ = training.train(model, variables, train_data, cfg,
                                  swag=swag)
    swag.invert(multiply=1.0)

    probs, labels = eval_nn(model, variables, test_data)
    row("MAP", probs, labels)

    t_probs, _, temp = eval_nn_temperature(model, variables, train_data,
                                           test_data)
    row(f"MAP + T={temp:.2f}", t_probs, labels)

    print("Fitting KFAC + tuning damping by evidence gradient ascent...")
    la = laplace.fit(model, variables, train_data, estimator="kfac",
                     mc_samples=2, rng=jax.random.PRNGKey(0))
    res = la.optimize_prior_precision(steps=150)
    print(f"  log marginal likelihood {res['log_marglik']:.1f}")
    xs = np.concatenate([x for x, _ in test_data])
    row("KFAC sampled", la.predictive(xs, samples=cfg.samples), labels)
    row("KFAC GLM", la.predictive(xs, method="linearized",
                                  samples=cfg.samples), labels)

    ll = laplace.fit(model, variables, train_data, estimator="kfac",
                     subset="last", mc_samples=2, rng=jax.random.PRNGKey(0))
    ll.optimize_prior_precision(steps=150)
    row("last-layer", ll.predictive(xs, samples=cfg.samples), labels)

    sw_probs, _, _ = eval_bnn(model, variables, swag, test_data,
                              samples=cfg.samples, rng=jax.random.PRNGKey(2))
    row("SWAG", sw_probs, labels)


if __name__ == "__main__":
    main()
