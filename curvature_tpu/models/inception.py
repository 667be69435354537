"""Inception v3 in NHWC with torchvision naming (aux_logits omitted).

The reference builds any torchvision model by name (reference
factors.py:80-84) and reserves the 299-px eval size for the inception
family (utils.py input-size handling). Layer names follow torchvision
state-dict paths (``Mixed_5b.branch1x1.conv`` ...) so pretrained
checkpoints convert mechanically via models.torch_convert; the aux
classifier is dropped — torchvision itself discards it in eval mode.
"""
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


class InceptionA(nn.Module):
    def __init__(self, pool_features: int, name: str):
        self.name = name
        self.b1 = BasicConv2d(64, 1, f"{name}.branch1x1")
        self.b5_1 = BasicConv2d(48, 1, f"{name}.branch5x5_1")
        self.b5_2 = BasicConv2d(64, 5, f"{name}.branch5x5_2", padding=2)
        self.bd_1 = BasicConv2d(64, 1, f"{name}.branch3x3dbl_1")
        self.bd_2 = BasicConv2d(96, 3, f"{name}.branch3x3dbl_2", padding=1)
        self.bd_3 = BasicConv2d(96, 3, f"{name}.branch3x3dbl_3", padding=1)
        self.pool = nn.AvgPool(3, 1, padding=1)
        self.bp = BasicConv2d(pool_features, 1, f"{name}.branch_pool")

    def __call__(self, ctx, x):
        y1 = self.b1(ctx, x)
        y2 = self.b5_2(ctx, self.b5_1(ctx, x))
        y3 = self.bd_3(ctx, self.bd_2(ctx, self.bd_1(ctx, x)))
        y4 = self.bp(ctx, self.pool(ctx, x))
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class InceptionB(nn.Module):
    def __init__(self, name: str):
        self.name = name
        self.b3 = BasicConv2d(384, 3, f"{name}.branch3x3", strides=2)
        self.bd_1 = BasicConv2d(64, 1, f"{name}.branch3x3dbl_1")
        self.bd_2 = BasicConv2d(96, 3, f"{name}.branch3x3dbl_2", padding=1)
        self.bd_3 = BasicConv2d(96, 3, f"{name}.branch3x3dbl_3", strides=2)
        self.pool = nn.MaxPool(3, 2)

    def __call__(self, ctx, x):
        y1 = self.b3(ctx, x)
        y2 = self.bd_3(ctx, self.bd_2(ctx, self.bd_1(ctx, x)))
        y3 = self.pool(ctx, x)
        return jnp.concatenate([y1, y2, y3], axis=-1)


class InceptionC(nn.Module):
    def __init__(self, c7: int, name: str):
        self.name = name
        self.b1 = BasicConv2d(192, 1, f"{name}.branch1x1")
        self.b7_1 = BasicConv2d(c7, 1, f"{name}.branch7x7_1")
        self.b7_2 = BasicConv2d(c7, (1, 7), f"{name}.branch7x7_2",
                                padding=(0, 3))
        self.b7_3 = BasicConv2d(192, (7, 1), f"{name}.branch7x7_3",
                                padding=(3, 0))
        self.bd_1 = BasicConv2d(c7, 1, f"{name}.branch7x7dbl_1")
        self.bd_2 = BasicConv2d(c7, (7, 1), f"{name}.branch7x7dbl_2",
                                padding=(3, 0))
        self.bd_3 = BasicConv2d(c7, (1, 7), f"{name}.branch7x7dbl_3",
                                padding=(0, 3))
        self.bd_4 = BasicConv2d(c7, (7, 1), f"{name}.branch7x7dbl_4",
                                padding=(3, 0))
        self.bd_5 = BasicConv2d(192, (1, 7), f"{name}.branch7x7dbl_5",
                                padding=(0, 3))
        self.pool = nn.AvgPool(3, 1, padding=1)
        self.bp = BasicConv2d(192, 1, f"{name}.branch_pool")

    def __call__(self, ctx, x):
        y1 = self.b1(ctx, x)
        y2 = self.b7_3(ctx, self.b7_2(ctx, self.b7_1(ctx, x)))
        y3 = self.bd_5(ctx, self.bd_4(ctx, self.bd_3(
            ctx, self.bd_2(ctx, self.bd_1(ctx, x)))))
        y4 = self.bp(ctx, self.pool(ctx, x))
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class InceptionD(nn.Module):
    def __init__(self, name: str):
        self.name = name
        self.b3_1 = BasicConv2d(192, 1, f"{name}.branch3x3_1")
        self.b3_2 = BasicConv2d(320, 3, f"{name}.branch3x3_2", strides=2)
        self.b7_1 = BasicConv2d(192, 1, f"{name}.branch7x7x3_1")
        self.b7_2 = BasicConv2d(192, (1, 7), f"{name}.branch7x7x3_2",
                                padding=(0, 3))
        self.b7_3 = BasicConv2d(192, (7, 1), f"{name}.branch7x7x3_3",
                                padding=(3, 0))
        self.b7_4 = BasicConv2d(192, 3, f"{name}.branch7x7x3_4", strides=2)
        self.pool = nn.MaxPool(3, 2)

    def __call__(self, ctx, x):
        y1 = self.b3_2(ctx, self.b3_1(ctx, x))
        y2 = self.b7_4(ctx, self.b7_3(ctx, self.b7_2(
            ctx, self.b7_1(ctx, x))))
        y3 = self.pool(ctx, x)
        return jnp.concatenate([y1, y2, y3], axis=-1)


class InceptionE(nn.Module):
    def __init__(self, name: str):
        self.name = name
        self.b1 = BasicConv2d(320, 1, f"{name}.branch1x1")
        self.b3_1 = BasicConv2d(384, 1, f"{name}.branch3x3_1")
        self.b3_2a = BasicConv2d(384, (1, 3), f"{name}.branch3x3_2a",
                                 padding=(0, 1))
        self.b3_2b = BasicConv2d(384, (3, 1), f"{name}.branch3x3_2b",
                                 padding=(1, 0))
        self.bd_1 = BasicConv2d(448, 1, f"{name}.branch3x3dbl_1")
        self.bd_2 = BasicConv2d(384, 3, f"{name}.branch3x3dbl_2", padding=1)
        self.bd_3a = BasicConv2d(384, (1, 3), f"{name}.branch3x3dbl_3a",
                                 padding=(0, 1))
        self.bd_3b = BasicConv2d(384, (3, 1), f"{name}.branch3x3dbl_3b",
                                 padding=(1, 0))
        self.pool = nn.AvgPool(3, 1, padding=1)
        self.bp = BasicConv2d(192, 1, f"{name}.branch_pool")

    def __call__(self, ctx, x):
        y1 = self.b1(ctx, x)
        y2m = self.b3_1(ctx, x)
        y2 = jnp.concatenate([self.b3_2a(ctx, y2m), self.b3_2b(ctx, y2m)],
                             axis=-1)
        y3m = self.bd_2(ctx, self.bd_1(ctx, x))
        y3 = jnp.concatenate([self.bd_3a(ctx, y3m), self.bd_3b(ctx, y3m)],
                             axis=-1)
        y4 = self.bp(ctx, self.pool(ctx, x))
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class InceptionV3(nn.Module):
    def __init__(self, num_classes: int):
        self.name = None
        self.c1a = BasicConv2d(32, 3, "Conv2d_1a_3x3", strides=2)
        self.c2a = BasicConv2d(32, 3, "Conv2d_2a_3x3")
        self.c2b = BasicConv2d(64, 3, "Conv2d_2b_3x3", padding=1)
        self.pool1 = nn.MaxPool(3, 2)
        self.c3b = BasicConv2d(80, 1, "Conv2d_3b_1x1")
        self.c4a = BasicConv2d(192, 3, "Conv2d_4a_3x3")
        self.pool2 = nn.MaxPool(3, 2)
        self.m5b = InceptionA(32, "Mixed_5b")
        self.m5c = InceptionA(64, "Mixed_5c")
        self.m5d = InceptionA(64, "Mixed_5d")
        self.m6a = InceptionB("Mixed_6a")
        self.m6b = InceptionC(128, "Mixed_6b")
        self.m6c = InceptionC(160, "Mixed_6c")
        self.m6d = InceptionC(160, "Mixed_6d")
        self.m6e = InceptionC(192, "Mixed_6e")
        self.m7a = InceptionD("Mixed_7a")
        self.m7b = InceptionE("Mixed_7b")
        self.m7c = InceptionE("Mixed_7c")
        self.fc = nn.Dense(num_classes, name="fc")

    def __call__(self, ctx, x):
        x = self.c2b(ctx, self.c2a(ctx, self.c1a(ctx, x)))
        x = self.c4a(ctx, self.c3b(ctx, self.pool1(ctx, x)))
        x = self.pool2(ctx, x)
        x = self.m5d(ctx, self.m5c(ctx, self.m5b(ctx, x)))
        x = self.m6e(ctx, self.m6d(ctx, self.m6c(
            ctx, self.m6b(ctx, self.m6a(ctx, x)))))
        x = self.m7c(ctx, self.m7b(ctx, self.m7a(ctx, x)))
        x = nn.GlobalAvgPool()(ctx, x)
        return self.fc(ctx, x)


def inception_v3(num_classes: int = 1000) -> nn.Model:
    return nn.Model(InceptionV3(num_classes))
