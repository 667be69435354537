"""RegNet X/Y families in NHWC with torchvision state-dict naming.

The last big torchvision CNN family on the reference's "any model by
name" surface (reference factors.py:80-84). Every stage's 3x3 bottleneck
conv is grouped (group_width channels per group — per-group block
KFAC/EFB/INF factors, estimators/kfac.py ``_is_grouped``); the Y variants
add squeeze-excitation gates whose fc1/fc2 are tracked 1x1 convs. The
reference's KFAC cannot run any of these (curvatures.py:328-335).

Widths replicate torchvision's quantized log-space generator
(``BlockParams.from_init_params`` + ``_adjust_widths_groups_compat``)
exactly, so pretrained checkpoints convert 1:1; layer names follow
torchvision paths (``trunk_output.block1.block1-0.f.a.0``, ``stem.0``,
``fc``).
"""
import math

import jax
import jax.numpy as jnp

from curvature_tpu import nn


def _quantize_float(f: float, q: int) -> int:
    return int(round(f / q) * q)


def block_params(depth: int, w_0: int, w_a: float, w_m: float,
                 group_width: int):
    """torchvision regnet.py BlockParams.from_init_params: continuous
    widths w_0 + w_a*i quantized to powers of w_m (rounded to multiples
    of 8), split into stages wherever the width changes, then adjusted
    for group compatibility (bottleneck_multiplier = 1)."""
    QUANT = 8
    widths_cont = [w_0 + w_a * i for i in range(depth)]
    caps = [round(math.log(w / w_0) / math.log(w_m)) for w in widths_cont]
    block_widths = [int(round(w_0 * w_m ** c / QUANT) * QUANT) for c in caps]
    stage_widths, stage_depths = [], []
    for w in block_widths:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(w)
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    # group compatibility (bottleneck ratio 1: w_bot == w)
    gws = [min(group_width, w) for w in stage_widths]
    stage_widths = [_quantize_float(w, g) for w, g in zip(stage_widths, gws)]
    return stage_widths, stage_depths, gws


class _ConvBN(nn.Module):
    """Conv2dNormActivation: conv ``{name}.0``, BN ``{name}.1``."""

    def __init__(self, features, kernel_size, stride, groups, name,
                 relu=True):
        self.conv = nn.Conv(features, kernel_size, strides=stride,
                            padding=(kernel_size - 1) // 2, groups=groups,
                            use_bias=False, name=f"{name}.0")
        self.bn = nn.BatchNorm(name=f"{name}.1")
        self.relu = relu

    def __call__(self, ctx, x):
        y = self.bn(ctx, self.conv(ctx, x))
        return nn.ReLU()(ctx, y) if self.relu else y


class _SE(nn.Module):
    """RegNetY squeeze-excitation: ReLU squeeze, sigmoid gate; squeeze
    channels derive from the block's INPUT width (torchvision regnet.py
    ResBottleneckBlock: round(se_ratio * width_in))."""

    def __init__(self, input_ch: int, squeeze_ch: int, name: str):
        self.fc1 = nn.Conv(squeeze_ch, 1, name=f"{name}.fc1")
        self.fc2 = nn.Conv(input_ch, 1, name=f"{name}.fc2")

    def __call__(self, ctx, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.ReLU()(ctx, self.fc1(ctx, s))
        s = jax.nn.sigmoid(self.fc2(ctx, s))
        return x * s


class ResBottleneckBlock(nn.Module):
    """proj (1x1, on downsample) + f(a: 1x1 -> b: grouped 3x3 -> [se] ->
    c: 1x1 no-act), ReLU after the sum."""

    def __init__(self, w_in: int, w_out: int, stride: int, group_width: int,
                 se_ratio: float, name: str):
        self.proj = None
        if w_in != w_out or stride != 1:
            self.proj = _ConvBN(w_out, 1, stride, 1, f"{name}.proj",
                                relu=False)
        self.a = _ConvBN(w_out, 1, 1, 1, f"{name}.f.a")
        self.b = _ConvBN(w_out, 3, stride, w_out // group_width,
                         f"{name}.f.b")
        self.se = None
        if se_ratio:
            self.se = _SE(w_out, int(round(se_ratio * w_in)),
                          f"{name}.f.se")
        self.c = _ConvBN(w_out, 1, 1, 1, f"{name}.f.c", relu=False)

    def __call__(self, ctx, x):
        y = self.b(ctx, self.a(ctx, x))
        if self.se is not None:
            y = self.se(ctx, y)
        y = self.c(ctx, y)
        shortcut = x if self.proj is None else self.proj(ctx, x)
        return nn.ReLU()(ctx, shortcut + y)


#: arch -> (depth, w_0, w_a, w_m, group_width, se_ratio) — torchvision
#: regnet.py _regnet dispatch table
_CONFIGS = {
    "regnet_y_400mf": (16, 48, 27.89, 2.09, 8, 0.25),
    "regnet_y_800mf": (14, 56, 38.84, 2.4, 16, 0.25),
    "regnet_y_1_6gf": (27, 48, 20.71, 2.65, 24, 0.25),
    "regnet_y_3_2gf": (21, 80, 42.63, 2.66, 24, 0.25),
    "regnet_y_8gf": (17, 192, 76.82, 2.19, 56, 0.25),
    "regnet_y_16gf": (18, 200, 106.23, 2.48, 112, 0.25),
    "regnet_y_32gf": (20, 232, 115.89, 2.53, 232, 0.25),
    "regnet_y_128gf": (27, 456, 160.83, 2.52, 264, 0.25),
    "regnet_x_400mf": (22, 24, 24.48, 2.54, 16, 0.0),
    "regnet_x_800mf": (16, 56, 35.73, 2.28, 16, 0.0),
    "regnet_x_1_6gf": (18, 80, 34.01, 2.25, 24, 0.0),
    "regnet_x_3_2gf": (25, 88, 26.31, 2.25, 48, 0.0),
    "regnet_x_8gf": (23, 80, 49.56, 2.88, 120, 0.0),
    "regnet_x_16gf": (22, 216, 55.59, 2.1, 128, 0.0),
    "regnet_x_32gf": (23, 320, 69.86, 2.0, 168, 0.0),
}


class RegNet(nn.Module):
    def __init__(self, arch: str, num_classes: int):
        self.name = None
        depth, w_0, w_a, w_m, gw, se_ratio = _CONFIGS[arch]
        widths, depths, gws = block_params(depth, w_0, w_a, w_m, gw)
        self.stem = _ConvBN(32, 3, 2, 1, "stem")
        self.blocks = []
        w_in = 32
        for s, (w, d, g) in enumerate(zip(widths, depths, gws), start=1):
            for j in range(d):
                self.blocks.append(ResBottleneckBlock(
                    w_in, w, 2 if j == 0 else 1, g, se_ratio,
                    f"trunk_output.block{s}.block{s}-{j}"))
                w_in = w
        self.fc = nn.Dense(num_classes, name="fc")

    def __call__(self, ctx, x):
        x = self.stem(ctx, x)
        for block in self.blocks:
            x = block(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.fc(ctx, x)


def regnet(arch: str, num_classes: int = 1000) -> nn.Model:
    return nn.Model(RegNet(arch, num_classes))
