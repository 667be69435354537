from curvature_tpu.ops.pallas.patch_gram import (
    patch_gram, patch_gram_supported, patch_gram_v2, patch_gram_v2_supported,
)

__all__ = ["patch_gram", "patch_gram_supported",
           "patch_gram_v2", "patch_gram_v2_supported"]
