"""Synthetic data generators for tests and benchmarks (no dataset downloads
are possible in this environment; real loaders live in data/loaders.py and
read local files when present)."""
from typing import Tuple

import numpy as np


def synthetic_images(rng: np.random.Generator, num: int, height: int,
                     width: int, channels: int, num_classes: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    x = rng.standard_normal((num, height, width, channels), dtype=np.float32)
    y = rng.integers(0, num_classes, size=(num,))
    return x, y.astype(np.int32)


def synthetic_classification(rng: np.random.Generator, num: int, dim: int,
                             num_classes: int) -> Tuple[np.ndarray, np.ndarray]:
    x = rng.standard_normal((num, dim), dtype=np.float32)
    w = rng.standard_normal((dim, num_classes), dtype=np.float32)
    y = np.argmax(x @ w + rng.standard_normal((num, num_classes)) * 0.1, axis=1)
    return x, y.astype(np.int32)
