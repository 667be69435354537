"""Small MLP used by unit/parity tests (exact-Fisher scale)."""
from typing import Sequence

from curvature_tpu import nn


def mlp(features: Sequence[int], num_classes: int) -> nn.Model:
    layers = []
    for i, f in enumerate(features):
        layers.append(nn.Dense(f, name=f"fc{i + 1}"))
        layers.append(nn.ReLU())
    layers.append(nn.Dense(num_classes, name=f"fc{len(features) + 1}"))
    return nn.Model(nn.Sequential(layers))
