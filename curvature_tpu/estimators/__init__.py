from curvature_tpu.estimators.base import Estimator, act_tokens, grad_tokens
from curvature_tpu.estimators.capture import (
    Captured, collect, sample_labels, softmax_cross_entropy,
)
from curvature_tpu.estimators.diagonal import Diagonal
from curvature_tpu.estimators.block import BlockDiagonal
from curvature_tpu.estimators.kfac import KFAC
from curvature_tpu.estimators.efb import EFB, kfac_eigenvectors
from curvature_tpu.estimators.inf import INF
from curvature_tpu.estimators.swag import SWAG, update_batch_stats
from curvature_tpu.estimators.subspace import Subspace

__all__ = [
    "Estimator", "Captured", "collect", "sample_labels",
    "softmax_cross_entropy", "act_tokens", "grad_tokens",
    "Diagonal", "BlockDiagonal", "KFAC", "EFB", "INF", "kfac_eigenvectors",
    "SWAG", "update_batch_stats", "Subspace",
]
