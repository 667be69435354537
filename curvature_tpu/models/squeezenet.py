"""SqueezeNet 1.0/1.1 in NHWC with torchvision state-dict naming.

Part of the "any torchvision model by name" surface (reference
factors.py:80-84). BN-free: every conv carries a bias, so the bias-column
factor path gets exercised on a real zoo architecture. The classifier is a
1x1 conv over the final feature map followed by global average pooling
(torchvision squeezenet.py) — a tracked conv like any other.

Layer names follow torchvision paths (``features.3.squeeze``,
``classifier.1``) so pretrained checkpoints convert mechanically.
"""
import jax.numpy as jnp

from curvature_tpu import nn


class Fire(nn.Module):
    """squeeze (1x1) -> ReLU -> [expand1x1 | expand3x3] -> concat."""

    def __init__(self, squeeze: int, expand1: int, expand3: int, name: str):
        self.squeeze = nn.Conv(squeeze, 1, name=f"{name}.squeeze")
        self.expand1 = nn.Conv(expand1, 1, name=f"{name}.expand1x1")
        self.expand3 = nn.Conv(expand3, 3, padding=1,
                               name=f"{name}.expand3x3")

    def __call__(self, ctx, x):
        s = nn.ReLU()(ctx, self.squeeze(ctx, x))
        e1 = nn.ReLU()(ctx, self.expand1(ctx, s))
        e3 = nn.ReLU()(ctx, self.expand3(ctx, s))
        return jnp.concatenate([e1, e3], axis=-1)


#: arch -> (stem kernel, stem stride, stem features, fire plan) where the
#: fire plan lists (feature index, squeeze, expand) — torchvision
#: squeezenet.py; maxpools (ceil_mode=True) sit at the gaps
_CONFIGS = {
    "squeezenet1_0": (7, 2, 96,
                      ((3, 16, 64), (4, 16, 64), (5, 32, 128),
                       (7, 32, 128), (8, 48, 192), (9, 48, 192),
                       (10, 64, 256), (12, 64, 256))),
    "squeezenet1_1": (3, 2, 64,
                      ((3, 16, 64), (4, 16, 64), (6, 32, 128),
                       (7, 32, 128), (9, 48, 192), (10, 48, 192),
                       (11, 64, 256), (12, 64, 256))),
}


class SqueezeNet(nn.Module):
    def __init__(self, arch: str, num_classes: int):
        self.name = None
        kernel, stride, stem, plan = _CONFIGS[arch]
        self.stem = nn.Conv(stem, kernel, strides=stride, name="features.0")
        self.pool = nn.MaxPool(3, 2, padding=0, ceil_mode=True)
        self.fires = []
        prev = None
        for idx, sq, ex in plan:
            # a maxpool sits wherever the torch Sequential skips an index
            pool_before = prev is not None and idx - prev > 1
            self.fires.append((pool_before, Fire(sq, ex, ex,
                                                 f"features.{idx}")))
            prev = idx
        self.classifier = nn.Conv(num_classes, 1, name="classifier.1")

    def __call__(self, ctx, x):
        x = self.pool(ctx, nn.ReLU()(ctx, self.stem(ctx, x)))
        for pool_before, fire in self.fires:
            if pool_before:
                x = self.pool(ctx, x)
            x = fire(ctx, x)
        x = nn.ReLU()(ctx, self.classifier(ctx, x))
        return nn.GlobalAvgPool()(ctx, x)


def squeezenet(arch: str, num_classes: int = 1000) -> nn.Model:
    return nn.Model(SqueezeNet(arch, num_classes))


def squeezenet1_0(num_classes: int = 1000) -> nn.Model:
    return squeezenet("squeezenet1_0", num_classes)


def squeezenet1_1(num_classes: int = 1000) -> nn.Model:
    return squeezenet("squeezenet1_1", num_classes)
