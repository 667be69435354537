"""VGG family (11/13/16/19, with/without BN) in NHWC with torchvision
naming — part of the torchvision-zoo coverage the reference gets via
``getattr(torchvision.models, name)`` (reference factors.py:80-84).

Checkpoint conversion: layer names follow torchvision state-dict paths
(``features.<i>``, ``classifier.<i>``), so ``load_torch_checkpoint``
works unmodified. The classifier keeps torch's 7x7 adaptive-pool input
(channel-major flatten lines up with converted weights).
"""
from typing import List

import jax.numpy as jnp

from curvature_tpu import nn

_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class AdaptiveAvgPool7(nn.Module):
    """torchvision's AdaptiveAvgPool2d((7,7)).

    Exact bin-mean when the spatial extent divides 7 (the 224-input case);
    nearest-repeat upsampling for smaller maps (small-image variants)."""

    def __call__(self, ctx, x):
        b, h, w, c = x.shape
        if (h, w) == (7, 7):
            return x
        if h >= 7 and h % 7 == 0 and w % 7 == 0:
            return jnp.mean(
                x.reshape(b, 7, h // 7, 7, w // 7, c), axis=(2, 4))
        # upsample by repetition then crop (h, w < 7 after deep pooling)
        rh = -(-7 // h)
        rw = -(-7 // w)
        up = jnp.repeat(jnp.repeat(x, rh, axis=1), rw, axis=2)
        return up[:, :7, :7, :]


def vgg(arch: str, num_classes: int = 1000, batch_norm: bool = False) -> nn.Model:
    layers: List[nn.Module] = []
    idx = 0
    for v in _CFGS[arch]:
        if v == "M":
            layers.append(nn.MaxPool(2, 2))
            idx += 1
        else:
            layers.append(nn.Conv(v, 3, padding=1, name=f"features.{idx}"))
            idx += 1
            if batch_norm:
                layers.append(nn.BatchNorm(name=f"features.{idx}"))
                idx += 1
            layers.append(nn.ReLU())
            idx += 1
    layers += [
        AdaptiveAvgPool7(),
        nn.Flatten(),
        nn.Dense(4096, name="classifier.0"),
        nn.ReLU(),
        nn.Dense(4096, name="classifier.3"),
        nn.ReLU(),
        nn.Dense(num_classes, name="classifier.6"),
    ]
    return nn.Model(nn.Sequential(layers))


def vgg16(num_classes: int = 1000, batch_norm: bool = False) -> nn.Model:
    return vgg("vgg16", num_classes, batch_norm)


def vgg19(num_classes: int = 1000, batch_norm: bool = False) -> nn.Model:
    return vgg("vgg19", num_classes, batch_norm)


def vgg11(num_classes: int = 1000, batch_norm: bool = False) -> nn.Model:
    return vgg("vgg11", num_classes, batch_norm)


def vgg13(num_classes: int = 1000, batch_norm: bool = False) -> nn.Model:
    return vgg("vgg13", num_classes, batch_norm)
