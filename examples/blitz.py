"""The 60-second blitz (reference scripts/test.py, README.rst:91-149):
KFAC on LeNet-5 -> invert -> sample posterior weights -> Bayesian eval.

Zero-setup: with no flags it runs on the CHECKED-IN artifacts — the bundled
converted LeNet-5 checkpoint (curvature_tpu/models/assets/lenet5_mnist.npz,
the reference's lenet5_mnist.pth) and the bundled real-digits fixture
(curvature_tpu/data/fixtures/digits: 1024 genuine handwritten digit scans
in the MNIST idx layout; the MNIST-trained net reads them at ~75%). Point
--data_dir at a directory holding MNIST/raw idx files to reproduce the
reference tutorial numbers on real MNIST (NN accuracy 94.11%,
tutorial.ipynb cell 7); --synthetic forces random data.
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
    ap.add_argument("--norm", type=float, default=1.0,
                    help="damping 'add' (reference test.py uses 0.5)")
    ap.add_argument("--scale", type=float, default=5e4,
                    help="damping 'multiply' — the default reproduces the "
                    "reference tutorial's regime (BNN acc == NN acc, "
                    "slightly better ECE) on the bundled digits fixture")
    ap.add_argument("--platform", default="",
                    help="force a jax backend (e.g. 'cpu'); the env var "
                    "JAX_PLATFORMS is ignored by this image's site "
                    "customization")
    ap.add_argument("--synthetic", action="store_true",
                    help="random data instead of the bundled digits fixture")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from curvature_tpu import data as data_pkg
    fixture_dir = os.path.join(os.path.dirname(data_pkg.__file__),
                               "fixtures", "digits")
    data_dir = args.data_dir
    if not data_dir and not args.synthetic:
        data_dir = fixture_dir        # checked-in real handwritten digits
    have_mnist = data_dir and os.path.exists(
        os.path.join(data_dir, "MNIST/raw")) and not args.synthetic
    cfg = Config(model="lenet5",
                 data="mnist" if have_mnist else "synthetic",
                 data_dir=data_dir or ".", batch_size=100,
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
    # regularization hyperparameters (tune with pipelines.hyper).
    print("Inverting")
    kfac.invert(add=args.norm, multiply=args.scale)

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
