"""MobileNetV2 in NHWC with torchvision state-dict naming.

The reference loads "any torchvision model by name" (factors.py:80-84);
MobileNetV2 is the canonical depthwise-separable architecture that the
reference's KFAC-family estimators cannot actually run (its unfold-built A
factor has C*kh*kw columns while a grouped weight matrix has (C/g)*kh*kw —
curvatures.py:328-335 would shape-mismatch at sampling). Here the depthwise
3x3s run through the per-group block factors (estimators/kfac.py
``_is_grouped``), so the full estimator chain works.

Layer names follow torchvision state-dict paths (``features.1.conv.0.0``,
``classifier.1`` ...) so pretrained checkpoints convert mechanically via
models.torch_convert (the inverted-residual blocks nest ConvBNActivation
sequentials exactly as torchvision does).
"""
import jax.numpy as jnp

from curvature_tpu import nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel-rounding rule (mobilenetv2.py _make_divisible)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Module):
    """Conv -> BatchNorm -> ReLU6, named like torchvision's ConvBNActivation
    (conv at ``{name}.0``, BN at ``{name}.1``)."""

    def __init__(self, features: int, kernel_size: int, stride: int,
                 groups: int, name: str):
        self.name = name
        self.conv = nn.Conv(features, kernel_size, strides=stride,
                            padding=(kernel_size - 1) // 2, groups=groups,
                            use_bias=False, name=f"{name}.0")
        self.bn = nn.BatchNorm(name=f"{name}.1")

    def __call__(self, ctx, x):
        return nn.ReLU6()(ctx, self.bn(ctx, self.conv(ctx, x)))


class InvertedResidual(nn.Module):
    """Expand (1x1) -> depthwise (3x3, groups=hidden) -> project (1x1),
    with a residual when stride == 1 and channels match. Sub-layer indices
    mirror torchvision: with expansion the pieces sit at conv.0 / conv.1 /
    conv.2+conv.3; without (t=1) at conv.0 / conv.1+conv.2."""

    def __init__(self, inp: int, oup: int, stride: int, expand_ratio: int,
                 name: str):
        self.use_res = stride == 1 and inp == oup
        hidden = int(round(inp * expand_ratio))
        self.stages = []
        idx = 0
        if expand_ratio != 1:
            self.stages.append(ConvBNReLU(hidden, 1, 1, 1,
                                          f"{name}.conv.{idx}"))
            idx += 1
        self.stages.append(ConvBNReLU(hidden, 3, stride, hidden,
                                      f"{name}.conv.{idx}"))
        idx += 1
        self.project = nn.Conv(oup, 1, use_bias=False,
                               name=f"{name}.conv.{idx}")
        self.project_bn = nn.BatchNorm(name=f"{name}.conv.{idx + 1}")

    def __call__(self, ctx, x):
        y = x
        for stage in self.stages:
            y = stage(ctx, y)
        y = self.project_bn(ctx, self.project(ctx, y))
        return x + y if self.use_res else y


#: (expand_ratio t, channels c, repeats n, first-stride s) — torchvision
#: mobilenetv2.py inverted_residual_setting
_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    def __init__(self, num_classes: int, width_mult: float = 1.0):
        self.name = None
        input_channel = _make_divisible(32 * width_mult)
        last_channel = _make_divisible(1280 * max(1.0, width_mult))
        self.stem = ConvBNReLU(input_channel, 3, 2, 1, "features.0")
        self.blocks = []
        fi = 1
        for t, c, n, s in _SETTINGS:
            oup = _make_divisible(c * width_mult)
            for i in range(n):
                self.blocks.append(InvertedResidual(
                    input_channel, oup, s if i == 0 else 1, t,
                    f"features.{fi}"))
                input_channel = oup
                fi += 1
        self.head = ConvBNReLU(last_channel, 1, 1, 1, f"features.{fi}")
        # classifier.0 is torchvision's Dropout (eval no-op)
        self.classifier = nn.Dense(num_classes, name="classifier.1")

    def __call__(self, ctx, x):
        x = self.stem(ctx, x)
        for block in self.blocks:
            x = block(ctx, x)
        x = self.head(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.classifier(ctx, x)


def mobilenet_v2(num_classes: int = 1000,
                 width_mult: float = 1.0) -> nn.Model:
    return nn.Model(MobileNetV2(num_classes, width_mult))


# ------------------------------------------------------------ MobileNetV3
class _V3ConvBN(nn.Module):
    """Conv -> BN -> {ReLU | Hardswish | none}, torchvision
    Conv2dNormActivation naming (conv ``{name}.0``, BN ``{name}.1``)."""

    def __init__(self, features: int, kernel_size: int, stride: int,
                 groups: int, name: str, act: str = "hswish"):
        self.conv = nn.Conv(features, kernel_size, strides=stride,
                            padding=(kernel_size - 1) // 2, groups=groups,
                            use_bias=False, name=f"{name}.0")
        self.bn = nn.BatchNorm(name=f"{name}.1")
        self.act = act

    def __call__(self, ctx, x):
        y = self.bn(ctx, self.conv(ctx, x))
        if self.act == "hswish":
            return nn.Hardswish()(ctx, y)
        if self.act == "relu":
            return nn.ReLU()(ctx, y)
        return y


class _V3SqueezeExcitation(nn.Module):
    """MobileNetV3's SE: ReLU squeeze activation, Hardsigmoid gate
    (torchvision mobilenetv3.py SElayer); fc1/fc2 are tracked 1x1 convs."""

    def __init__(self, input_ch: int, squeeze_ch: int, name: str):
        self.fc1 = nn.Conv(squeeze_ch, 1, name=f"{name}.fc1")
        self.fc2 = nn.Conv(input_ch, 1, name=f"{name}.fc2")

    def __call__(self, ctx, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.ReLU()(ctx, self.fc1(ctx, s))
        s = nn.Hardsigmoid()(ctx, self.fc2(ctx, s))
        return x * s


class _V3InvertedResidual(nn.Module):
    """Expand -> depthwise -> (SE) -> project with torchvision block
    sub-indices (expand only when expanded != input channels)."""

    def __init__(self, inp: int, kernel: int, expanded: int, oup: int,
                 use_se: bool, act: str, stride: int, name: str):
        self.use_res = stride == 1 and inp == oup
        self.stages = []
        k = 0
        if expanded != inp:
            self.stages.append(_V3ConvBN(expanded, 1, 1, 1,
                                         f"{name}.block.{k}", act))
            k += 1
        self.stages.append(_V3ConvBN(expanded, kernel, stride, expanded,
                                     f"{name}.block.{k}", act))
        k += 1
        if use_se:
            squeeze = _make_divisible(expanded // 4)
            self.stages.append(_V3SqueezeExcitation(expanded, squeeze,
                                                    f"{name}.block.{k}"))
            k += 1
        self.project = _V3ConvBN(oup, 1, 1, 1, f"{name}.block.{k}",
                                 act="none")

    def __call__(self, ctx, x):
        y = x
        for stage in self.stages:
            y = stage(ctx, y)
        y = self.project(ctx, y)
        return x + y if self.use_res else y


#: (input, kernel, expanded, out, use_se, act, stride) — torchvision
#: mobilenetv3.py _mobilenet_v3_conf at width_mult=1.0
_V3_LARGE = (
    (16, 3, 16, 16, False, "relu", 1),
    (16, 3, 64, 24, False, "relu", 2),
    (24, 3, 72, 24, False, "relu", 1),
    (24, 5, 72, 40, True, "relu", 2),
    (40, 5, 120, 40, True, "relu", 1),
    (40, 5, 120, 40, True, "relu", 1),
    (40, 3, 240, 80, False, "hswish", 2),
    (80, 3, 200, 80, False, "hswish", 1),
    (80, 3, 184, 80, False, "hswish", 1),
    (80, 3, 184, 80, False, "hswish", 1),
    (80, 3, 480, 112, True, "hswish", 1),
    (112, 3, 672, 112, True, "hswish", 1),
    (112, 5, 672, 160, True, "hswish", 2),
    (160, 5, 960, 160, True, "hswish", 1),
    (160, 5, 960, 160, True, "hswish", 1),
)
_V3_SMALL = (
    (16, 3, 16, 16, True, "relu", 2),
    (16, 3, 72, 24, False, "relu", 2),
    (24, 3, 88, 24, False, "relu", 1),
    (24, 5, 96, 40, True, "hswish", 2),
    (40, 5, 240, 40, True, "hswish", 1),
    (40, 5, 240, 40, True, "hswish", 1),
    (40, 5, 120, 48, True, "hswish", 1),
    (48, 5, 144, 48, True, "hswish", 1),
    (48, 5, 288, 96, True, "hswish", 2),
    (96, 5, 576, 96, True, "hswish", 1),
    (96, 5, 576, 96, True, "hswish", 1),
)


class MobileNetV3(nn.Module):
    def __init__(self, settings, last_channel: int, num_classes: int):
        self.name = None
        self.stem = _V3ConvBN(settings[0][0], 3, 2, 1, "features.0")
        self.blocks = [
            _V3InvertedResidual(*cnf, name=f"features.{i}")
            for i, cnf in enumerate(settings, start=1)
        ]
        lastconv_in = settings[-1][3]
        self.head = _V3ConvBN(6 * lastconv_in, 1, 1, 1,
                              f"features.{len(settings) + 1}")
        # classifier: Linear / Hardswish / Dropout(no-op) / Linear
        self.fc1 = nn.Dense(last_channel, name="classifier.0")
        self.fc2 = nn.Dense(num_classes, name="classifier.3")

    def __call__(self, ctx, x):
        x = self.stem(ctx, x)
        for block in self.blocks:
            x = block(ctx, x)
        x = self.head(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        x = nn.Hardswish()(ctx, self.fc1(ctx, x))
        return self.fc2(ctx, x)


def mobilenet_v3_large(num_classes: int = 1000) -> nn.Model:
    return nn.Model(MobileNetV3(_V3_LARGE, 1280, num_classes))


def mobilenet_v3_small(num_classes: int = 1000) -> nn.Model:
    return nn.Model(MobileNetV3(_V3_SMALL, 1024, num_classes))
