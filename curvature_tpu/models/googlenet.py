"""GoogLeNet (Inception v1) in NHWC with torchvision naming.

The reference loads it by name with ``aux_logits=False`` and a 299-px eval
size (reference factors.py:81-82, 106-107; evaluate.py:339-340). Aux
classifier heads are omitted to match that configuration. Layer names
follow torchvision state-dict paths (``inception3a.branch2.0.conv`` ...)
so pretrained checkpoints convert mechanically.
"""
from typing import Optional

import jax.numpy as jnp

from curvature_tpu import nn


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3) + ReLU, torchvision-style."""

    def __init__(self, features: int, kernel_size, name: str, strides=1,
                 padding=0):
        self.name = name
        self.conv = nn.Conv(features, kernel_size, strides=strides,
                            padding=padding, use_bias=False,
                            name=f"{name}.conv")
        self.bn = nn.BatchNorm(eps=1e-3, name=f"{name}.bn")

    def __call__(self, ctx, x):
        return nn.ReLU()(ctx, self.bn(ctx, self.conv(ctx, x)))


class Inception(nn.Module):
    def __init__(self, c1: int, c3r: int, c3: int, c5r: int, c5: int,
                 pool_proj: int, name: str):
        self.name = name
        self.b1 = BasicConv2d(c1, 1, f"{name}.branch1")
        self.b2a = BasicConv2d(c3r, 1, f"{name}.branch2.0")
        self.b2b = BasicConv2d(c3, 3, f"{name}.branch2.1", padding=1)
        self.b3a = BasicConv2d(c5r, 1, f"{name}.branch3.0")
        # torchvision's "5x5" branch actually uses a 3x3 conv
        self.b3b = BasicConv2d(c5, 3, f"{name}.branch3.1", padding=1)
        self.pool = nn.MaxPool(3, 1, padding=1)
        self.b4 = BasicConv2d(pool_proj, 1, f"{name}.branch4.1")

    def __call__(self, ctx, x):
        y1 = self.b1(ctx, x)
        y2 = self.b2b(ctx, self.b2a(ctx, x))
        y3 = self.b3b(ctx, self.b3a(ctx, x))
        y4 = self.b4(ctx, self.pool(ctx, x))
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class GoogLeNet(nn.Module):
    def __init__(self, num_classes: int):
        self.name = None
        self.conv1 = BasicConv2d(64, 7, "conv1", strides=2, padding=3)
        self.pool1 = nn.MaxPool(3, 2, padding="SAME")
        self.conv2 = BasicConv2d(64, 1, "conv2")
        self.conv3 = BasicConv2d(192, 3, "conv3", padding=1)
        self.pool2 = nn.MaxPool(3, 2, padding="SAME")
        self.i3a = Inception(64, 96, 128, 16, 32, 32, "inception3a")
        self.i3b = Inception(128, 128, 192, 32, 96, 64, "inception3b")
        self.pool3 = nn.MaxPool(3, 2, padding="SAME")
        self.i4a = Inception(192, 96, 208, 16, 48, 64, "inception4a")
        self.i4b = Inception(160, 112, 224, 24, 64, 64, "inception4b")
        self.i4c = Inception(128, 128, 256, 24, 64, 64, "inception4c")
        self.i4d = Inception(112, 144, 288, 32, 64, 64, "inception4d")
        self.i4e = Inception(256, 160, 320, 32, 128, 128, "inception4e")
        self.pool4 = nn.MaxPool(2, 2, padding="SAME")
        self.i5a = Inception(256, 160, 320, 32, 128, 128, "inception5a")
        self.i5b = Inception(384, 192, 384, 48, 128, 128, "inception5b")
        self.fc = nn.Dense(num_classes, name="fc")

    def __call__(self, ctx, x):
        x = self.pool1(ctx, self.conv1(ctx, x))
        x = self.pool2(ctx, self.conv3(ctx, self.conv2(ctx, x)))
        x = self.pool3(ctx, self.i3b(ctx, self.i3a(ctx, x)))
        x = self.i4e(ctx, self.i4d(ctx, self.i4c(ctx, self.i4b(
            ctx, self.i4a(ctx, x)))))
        x = self.pool4(ctx, x)
        x = self.i5b(ctx, self.i5a(ctx, x))
        x = nn.GlobalAvgPool()(ctx, x)
        return self.fc(ctx, x)


def googlenet(num_classes: int = 1000) -> nn.Model:
    return nn.Model(GoogLeNet(num_classes))
