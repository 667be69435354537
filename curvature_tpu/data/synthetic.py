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


def synthetic_tokens(rng: np.random.Generator, num: int, seq_len: int,
                     vocab: int, order: float = 0.8,
                     perm: np.ndarray = None) -> Tuple[np.ndarray, np.ndarray]:
    """Markov token streams for causal-LM pipelines: (inputs [N, T],
    next-token labels [N, T]).

    Each step either follows a fixed random permutation of the vocab (with
    probability ``order``) or jumps uniformly — so sequences have learnable
    structure (a trained LM beats the uniform baseline) without any text
    download. Pass the same ``perm`` across train/val/test splits so they
    share the underlying process while drawing disjoint sequences."""
    if perm is None:
        perm = rng.permutation(vocab)
    seq = np.empty((num, seq_len + 1), dtype=np.int64)
    seq[:, 0] = rng.integers(0, vocab, size=num)
    for t in range(seq_len):
        follow = rng.random(num) < order
        seq[:, t + 1] = np.where(follow, perm[seq[:, t]],
                                 rng.integers(0, vocab, size=num))
    return seq[:, :-1].astype(np.int32), seq[:, 1:].astype(np.int32)
