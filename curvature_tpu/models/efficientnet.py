"""EfficientNet B0-B7 in NHWC with torchvision state-dict naming.

The reference loads "any torchvision model by name" (factors.py:80-84);
EfficientNet is the flagship depthwise-separable family there. Every MBConv
block carries a depthwise conv (runs through the per-group block KFAC/EFB
factors, estimators/kfac.py ``_is_grouped``) and a squeeze-excitation gate
whose fc1/fc2 are 1x1 convs — tracked layers like any other, so the
curvature chain covers the full parameter set. The reference's KFAC cannot
run any of these models (grouped convs shape-mismatch its unfold A,
curvatures.py:328-335).

Layer names follow torchvision paths (``features.1.0.block.0.0``,
``features.8.0``, ``classifier.1``) so pretrained checkpoints convert
mechanically via models.torch_convert. B1-B7 are the standard compound
width/depth scalings of the same stage table.
"""
import math

import jax
import jax.numpy as jnp

from curvature_tpu import nn
from curvature_tpu.models.mobilenet import _make_divisible


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> SiLU (or no activation), named like
    torchvision's Conv2dNormActivation (conv ``{name}.0``, BN ``{name}.1``)."""

    def __init__(self, features: int, kernel_size: int, stride: int,
                 groups: int, name: str, act: bool = True,
                 bn_eps: float = 1e-5):
        self.conv = nn.Conv(features, kernel_size, strides=stride,
                            padding=(kernel_size - 1) // 2, groups=groups,
                            use_bias=False, name=f"{name}.0")
        self.bn = nn.BatchNorm(eps=bn_eps, name=f"{name}.1")
        self.act = act

    def __call__(self, ctx, x):
        y = self.bn(ctx, self.conv(ctx, x))
        return nn.SiLU()(ctx, y) if self.act else y


class SqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation: global-average squeeze, two 1x1
    convs (``fc1``/``fc2``, bias=True), sigmoid gate scaling the input.
    EfficientNet passes activation=SiLU; the fc convs are tracked layers
    (their [N, 1, 1, C] activations capture as single-token patches)."""

    def __init__(self, input_ch: int, squeeze_ch: int, name: str):
        self.fc1 = nn.Conv(squeeze_ch, 1, name=f"{name}.fc1")
        self.fc2 = nn.Conv(input_ch, 1, name=f"{name}.fc2")

    def __call__(self, ctx, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.SiLU()(ctx, self.fc1(ctx, s))
        s = jax.nn.sigmoid(self.fc2(ctx, s))
        return x * s


class MBConv(nn.Module):
    """Expand (1x1) -> depthwise (kxk) -> SE -> project (1x1), residual
    when stride == 1 and channels match; stochastic depth is an eval no-op.
    Sub-block indices mirror torchvision: with expansion block.0/1/2/3,
    without (t=1) block.0/1/2."""

    def __init__(self, inp: int, oup: int, kernel: int, stride: int,
                 expand_ratio: int, name: str, bn_eps: float = 1e-5):
        self.use_res = stride == 1 and inp == oup
        expanded = _make_divisible(inp * expand_ratio)
        self.stages = []
        k = 0
        if expanded != inp:
            self.stages.append(ConvBNAct(expanded, 1, 1, 1,
                                         f"{name}.block.{k}",
                                         bn_eps=bn_eps))
            k += 1
        self.stages.append(ConvBNAct(expanded, kernel, stride, expanded,
                                     f"{name}.block.{k}", bn_eps=bn_eps))
        k += 1
        # squeeze channels derive from the UN-expanded input (torchvision
        # efficientnet.py MBConv: max(1, input_channels // 4))
        self.se = SqueezeExcitation(expanded, max(1, inp // 4),
                                    f"{name}.block.{k}")
        k += 1
        self.project = ConvBNAct(oup, 1, 1, 1, f"{name}.block.{k}",
                                 act=False, bn_eps=bn_eps)

    def __call__(self, ctx, x):
        y = x
        for stage in self.stages:
            y = stage(ctx, y)
        y = self.project(ctx, self.se(ctx, y))
        return x + y if self.use_res else y


#: (expand_ratio t, kernel k, first-stride s, channels c, repeats n) — the
#: B0 stage table (torchvision efficientnet.py _efficientnet_conf); B1-B7
#: scale widths by _make_divisible(c * w) and depths by ceil(n * d)
_SETTINGS = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

#: arch -> (width_mult, depth_mult), torchvision's compound scalings
_ARCH = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}


class EfficientNet(nn.Module):
    def __init__(self, num_classes: int, width_mult: float,
                 depth_mult: float):
        self.name = None
        adjust = lambda c: _make_divisible(c * width_mult)  # noqa: E731
        inp = adjust(32)
        self.stem = ConvBNAct(inp, 3, 2, 1, "features.0")
        self.blocks = []
        for fi, (t, k, s, c, n) in enumerate(_SETTINGS, start=1):
            oup = adjust(c)
            for j in range(int(math.ceil(n * depth_mult))):
                self.blocks.append(MBConv(inp, oup, k, s if j == 0 else 1,
                                          t, f"features.{fi}.{j}"))
                inp = oup
        self.head = ConvBNAct(4 * inp, 1, 1, 1,
                              f"features.{len(_SETTINGS) + 1}")
        # classifier.0 is torchvision's Dropout (eval no-op)
        self.classifier = nn.Dense(num_classes, name="classifier.1")

    def __call__(self, ctx, x):
        x = self.stem(ctx, x)
        for block in self.blocks:
            x = block(ctx, x)
        x = self.head(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.classifier(ctx, x)


class FusedMBConv(nn.Module):
    """EfficientNetV2's fused block: the expand 1x1 + depthwise kxk merge
    into one dense kxk conv (torchvision efficientnet.py FusedMBConv —
    no SE). With expansion: block.0 (kxk expand CNA) + block.1 (1x1
    project CNA, no act); without: a single kxk CNA at block.0."""

    def __init__(self, inp: int, oup: int, kernel: int, stride: int,
                 expand_ratio: int, name: str, bn_eps: float = 1e-3):
        self.use_res = stride == 1 and inp == oup
        expanded = _make_divisible(inp * expand_ratio)
        if expanded != inp:
            self.expand = ConvBNAct(expanded, kernel, stride, 1,
                                    f"{name}.block.0", bn_eps=bn_eps)
            self.project = ConvBNAct(oup, 1, 1, 1, f"{name}.block.1",
                                     act=False, bn_eps=bn_eps)
        else:
            self.expand = None
            self.project = ConvBNAct(oup, kernel, stride, 1,
                                     f"{name}.block.0", bn_eps=bn_eps)

    def __call__(self, ctx, x):
        if self.expand is not None:
            y = self.project(ctx, self.expand(ctx, x))
        else:
            y = self.project(ctx, x)
        return x + y if self.use_res else y


#: EfficientNetV2 stage tables (torchvision _efficientnet_conf "v2_s"...):
#: (block kind, expand t, kernel k, stride s, in, out, repeats)
_V2_CONFIGS = {
    "efficientnet_v2_s": (
        ("fused", 1, 3, 1, 24, 24, 2),
        ("fused", 4, 3, 2, 24, 48, 4),
        ("fused", 4, 3, 2, 48, 64, 4),
        ("mb", 4, 3, 2, 64, 128, 6),
        ("mb", 6, 3, 1, 128, 160, 9),
        ("mb", 6, 3, 2, 160, 256, 15),
    ),
    "efficientnet_v2_m": (
        ("fused", 1, 3, 1, 24, 24, 3),
        ("fused", 4, 3, 2, 24, 48, 5),
        ("fused", 4, 3, 2, 48, 80, 5),
        ("mb", 4, 3, 2, 80, 160, 7),
        ("mb", 6, 3, 1, 160, 176, 14),
        ("mb", 6, 3, 2, 176, 304, 18),
        ("mb", 6, 3, 1, 304, 512, 5),
    ),
    "efficientnet_v2_l": (
        ("fused", 1, 3, 1, 32, 32, 4),
        ("fused", 4, 3, 2, 32, 64, 7),
        ("fused", 4, 3, 2, 64, 96, 7),
        ("mb", 4, 3, 2, 96, 192, 10),
        ("mb", 6, 3, 1, 192, 224, 19),
        ("mb", 6, 3, 2, 224, 384, 25),
        ("mb", 6, 3, 1, 384, 640, 7),
    ),
}


class EfficientNetV2(nn.Module):
    """torchvision efficientnet_v2_{s,m,l}: explicit stage tables (no
    compound scaling), FusedMBConv early stages, 1280-wide head."""

    def __init__(self, arch: str, num_classes: int):
        self.name = None
        table = _V2_CONFIGS[arch]
        inp = table[0][4]
        # torchvision builds every v2 BN with eps=1e-3 (efficientnet.py
        # _efficientnet partial(nn.BatchNorm2d, eps=1e-3))
        self.stem = ConvBNAct(inp, 3, 2, 1, "features.0", bn_eps=1e-3)
        self.blocks = []
        for fi, (kind, t, k, s, ci, co, n) in enumerate(table, start=1):
            for j in range(n):
                cls = FusedMBConv if kind == "fused" else MBConv
                self.blocks.append(cls(ci if j == 0 else co, co, k,
                                       s if j == 0 else 1, t,
                                       f"features.{fi}.{j}", bn_eps=1e-3))
        self.head = ConvBNAct(1280, 1, 1, 1, f"features.{len(table) + 1}",
                              bn_eps=1e-3)
        self.classifier = nn.Dense(num_classes, name="classifier.1")

    def __call__(self, ctx, x):
        x = self.stem(ctx, x)
        for block in self.blocks:
            x = block(ctx, x)
        x = self.head(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.classifier(ctx, x)


def efficientnet(arch: str, num_classes: int = 1000) -> nn.Model:
    if arch in _V2_CONFIGS:
        return nn.Model(EfficientNetV2(arch, num_classes))
    width, depth = _ARCH[arch]
    return nn.Model(EfficientNet(num_classes, width, depth))


def efficientnet_b0(num_classes: int = 1000) -> nn.Model:
    return efficientnet("efficientnet_b0", num_classes)
