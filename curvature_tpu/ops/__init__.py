from curvature_tpu.ops.linalg import (
    kron,
    sym,
    eigh_sym,
    damped_inverse_cholesky,
    diag_add,
    chol_inv,
    group_by_shape,
)
from curvature_tpu.ops.patches import extract_patches

__all__ = [
    "kron", "sym", "eigh_sym", "damped_inverse_cholesky", "diag_add",
    "chol_inv", "group_by_shape", "extract_patches",
]
