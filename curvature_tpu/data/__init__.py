from curvature_tpu.data.synthetic import synthetic_classification, synthetic_images
from curvature_tpu.data.prefetch import (
    CachedLoader, DevicePrefetcher, ParallelDecodeLoader,
)

__all__ = [
    "synthetic_classification", "synthetic_images",
    "CachedLoader", "DevicePrefetcher", "ParallelDecodeLoader",
]
