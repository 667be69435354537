"""curvature_tpu — a TPU-native JAX framework for Laplace approximation in
Bayesian deep learning.

Re-designed from scratch with the capability surface of DLR-RM/curvature
(reference layout: curvature/curvatures.py, curvature/utils.py, scripts/*):
four Fisher-information estimators of increasing fidelity

  * :class:`~curvature_tpu.estimators.Diagonal`       (diagonal Fisher)
  * :class:`~curvature_tpu.estimators.BlockDiagonal`  (exact per-layer Fisher)
  * :class:`~curvature_tpu.estimators.KFAC`           (Kronecker-factored)
  * :class:`~curvature_tpu.estimators.EFB`            (eigenvalue-corrected KFAC)
  * :class:`~curvature_tpu.estimators.INF`            (low-rank + diagonal information form)

with the lifecycle ``update -> invert(add, multiply) -> sample``, plus Bayesian
evaluation (ECE/NLL/OOD/FGSM), BayesOpt damping search, and loss-landscape
tooling.

TPU-native design (not a port):
  - no autograd hooks: per-layer activations and pre-activation output
    gradients are captured by a single ``jax.vjp`` with zero-valued probe
    inputs (see :mod:`curvature_tpu.estimators.capture`);
  - Monte-Carlo label sampling is a vmapped vjp over cotangent seeds
    (one forward, S batched backwards);
  - factor state is a pure pytree keyed by layer *name*; update/invert/sample
    are pure jitted functions;
  - posterior evaluation vmaps the model over an ensemble axis of sampled
    weights so a 30-sample eval is one batched forward;
  - multi-chip scaling via ``jax.sharding.Mesh`` with psum'd factor moments.
"""

__version__ = "0.1.0"

from curvature_tpu import nn, ops, models, estimators, parallel, data
from curvature_tpu.estimators import Diagonal, BlockDiagonal, KFAC, EFB, INF
from curvature_tpu import laplace

__all__ = [
    "nn", "ops", "models", "estimators", "parallel", "data",
    "Diagonal", "BlockDiagonal", "KFAC", "EFB", "INF",
]
