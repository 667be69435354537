"""DenseNet family (121/161/169/201) in NHWC with torchvision naming.

The reference applies its estimators to torchvision DenseNets (README.rst
hyperparameter table rows DenseNet121/DenseNet161, factors.py:80-84 loads
any torchvision model by name). Layer names follow torchvision state-dict
paths (``features.denseblock1.denselayer1.conv1`` ...) so pretrained torch
checkpoints convert mechanically.
"""
from typing import Sequence

import jax.numpy as jnp

from curvature_tpu import nn


class DenseLayer(nn.Module):
    def __init__(self, growth: int, bn_size: int, name: str):
        self.name = name
        self.norm1 = nn.BatchNorm(name=f"{name}.norm1")
        self.conv1 = nn.Conv(bn_size * growth, 1, use_bias=False,
                             name=f"{name}.conv1")
        self.norm2 = nn.BatchNorm(name=f"{name}.norm2")
        self.conv2 = nn.Conv(growth, 3, padding=1, use_bias=False,
                             name=f"{name}.conv2")

    def __call__(self, ctx, x):
        out = self.conv1(ctx, nn.ReLU()(ctx, self.norm1(ctx, x)))
        out = self.conv2(ctx, nn.ReLU()(ctx, self.norm2(ctx, out)))
        return jnp.concatenate([x, out], axis=-1)


class Transition(nn.Module):
    def __init__(self, out_features: int, name: str):
        self.name = name
        self.norm = nn.BatchNorm(name=f"{name}.norm")
        self.conv = nn.Conv(out_features, 1, use_bias=False,
                            name=f"{name}.conv")
        self.pool = nn.AvgPool(2, 2)

    def __call__(self, ctx, x):
        return self.pool(ctx, self.conv(ctx, nn.ReLU()(ctx, self.norm(ctx, x))))


class DenseNet(nn.Module):
    def __init__(self, growth: int, blocks: Sequence[int], init_features: int,
                 num_classes: int, bn_size: int = 4):
        self.name = None
        self.conv0 = nn.Conv(init_features, 7, strides=2, padding=3,
                             use_bias=False, name="features.conv0")
        self.norm0 = nn.BatchNorm(name="features.norm0")
        self.pool0 = nn.MaxPool(3, 2, padding=1)
        self.blocks = []
        feats = init_features
        for bi, n_layers in enumerate(blocks):
            layers = []
            for li in range(n_layers):
                layers.append(DenseLayer(
                    growth, bn_size,
                    f"features.denseblock{bi + 1}.denselayer{li + 1}"))
                feats += growth
            trans = None
            if bi != len(blocks) - 1:
                trans = Transition(feats // 2,
                                   f"features.transition{bi + 1}")
                feats //= 2
            self.blocks.append((layers, trans))
        self.norm5 = nn.BatchNorm(name="features.norm5")
        self.classifier = nn.Dense(num_classes, name="classifier")

    def __call__(self, ctx, x):
        x = self.pool0(ctx, nn.ReLU()(ctx, self.norm0(ctx, self.conv0(ctx, x))))
        for layers, trans in self.blocks:
            for layer in layers:
                x = layer(ctx, x)
            if trans is not None:
                x = trans(ctx, x)
        x = nn.ReLU()(ctx, self.norm5(ctx, x))
        x = nn.GlobalAvgPool()(ctx, x)
        return self.classifier(ctx, x)


_CONFIGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


def densenet(arch: str, num_classes: int = 1000) -> nn.Model:
    growth, blocks, init = _CONFIGS[arch]
    return nn.Model(DenseNet(growth, blocks, init, num_classes))


def densenet121(num_classes: int = 1000) -> nn.Model:
    return densenet("densenet121", num_classes)


def densenet161(num_classes: int = 1000) -> nn.Model:
    return densenet("densenet161", num_classes)


def densenet169(num_classes: int = 1000) -> nn.Model:
    return densenet("densenet169", num_classes)


def densenet201(num_classes: int = 1000) -> nn.Model:
    return densenet("densenet201", num_classes)
