"""The 60-second blitz (reference scripts/test.py, README.rst:91-149):
KFAC on LeNet-5 -> invert -> sample posterior weights -> Bayesian eval.

Runs on real MNIST when idx files exist under --data_dir, otherwise on
synthetic data. The bundled reference checkpoint is converted automatically
when available, so metrics on real MNIST are directly comparable with the
reference tutorial (NN accuracy 94.11%, tutorial.ipynb cell 7).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from curvature_tpu import estimators
from curvature_tpu.eval import eval_bnn, eval_nn, metrics
from curvature_tpu.utils.config import Config
from curvature_tpu.pipelines.common import build_data, build_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="")
    ap.add_argument("--samples", type=int, default=30)
    ap.add_argument("--mc_samples", type=int, default=10)
    ap.add_argument("--platform", default="",
                    help="force a jax backend (e.g. 'cpu'); the env var "
                    "JAX_PLATFORMS is ignored by this image's site "
                    "customization")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    have_mnist = args.data_dir and os.path.exists(
        os.path.join(args.data_dir, "MNIST/raw"))
    cfg = Config(model="lenet5",
                 data="mnist" if have_mnist else "synthetic",
                 data_dir=args.data_dir or ".", batch_size=100,
                 samples=args.samples, mc_samples=args.mc_samples)

    print(f"Building LeNet-5 ({cfg.data})")
    model, variables = build_model(cfg)
    train_data = build_data(cfg, splits="train")
    test_data = list(build_data(cfg, splits="test"))

    # Estimate the Fisher: one jitted step per batch — forward, MC label
    # draws from the model distribution, vmapped backwards, factor update.
    print("Estimating KFAC factors")
    kfac = estimators.KFAC(model, variables)
    rng = jax.random.PRNGKey(0)
    for x, _ in train_data:
        rng, key = jax.random.split(rng)
        kfac.update(x, rng=key, num_samples=cfg.mc_samples)

    # Invert the damped factors: 'add' and 'multiply' are the two Laplace
    # regularization hyperparameters.
    print("Inverting")
    kfac.invert(add=0.5, multiply=1.0)

    # Deterministic vs Bayesian predictions.
    probs, labels = eval_nn(model, variables, test_data)
    bnn_probs, _, _ = eval_bnn(model, variables, kfac, test_data,
                               samples=cfg.samples, rng=jax.random.PRNGKey(1))
    for name, p in (("NN ", probs), ("BNN", bnn_probs)):
        acc = float(metrics.accuracy(p, labels))
        ece = 100 * float(metrics.expected_calibration_error(p, labels)[0])
        nll = float(metrics.negative_log_likelihood(p, labels))
        print(f"{name}: accuracy {acc:.2f}% | ECE {ece:.2f}% | NLL {nll:.3f}")


if __name__ == "__main__":
    main()
