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
from curvature_tpu.ops.matfree import (
    ggn_quad, ggn_matvec, lanczos_topk, hutchinson_trace, random_deltas,
    delta_shapes,
)

__all__ = [
    "kron", "sym", "eigh_sym", "damped_inverse_cholesky", "diag_add",
    "chol_inv", "group_by_shape", "extract_patches",
    "ggn_quad", "ggn_matvec", "lanczos_topk", "hutchinson_trace",
    "random_deltas", "delta_shapes",
]
