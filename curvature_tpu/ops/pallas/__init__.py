from curvature_tpu.ops.pallas.patch_gram import (
    patch_gram, patch_gram_supported, patch_gram_v2, patch_gram_v2_supported,
    patch_gram_tiled, patch_gram_tiled_supported, tiled_plan,
    select_patch_gram,
)

__all__ = ["patch_gram", "patch_gram_supported",
           "patch_gram_v2", "patch_gram_v2_supported",
           "patch_gram_tiled", "patch_gram_tiled_supported", "tiled_plan",
           "select_patch_gram"]
