"""ShuffleNetV2 (x0_5..x2_0) in NHWC with torchvision state-dict naming.

Part of the "any torchvision model by name" surface the reference drives
via pretrained checkpoints (reference factors.py:80-84). Every block is a
depthwise-separable unit with a channel shuffle; the depthwise 3x3s run
through the per-group block KFAC/EFB/INF factors (estimators/kfac.py
``_is_grouped``) — the reference's KFAC cannot run them at all
(curvatures.py:328-335 would shape-mismatch at sampling).

Layer names follow torchvision paths (``stage2.0.branch2.0``, ``conv5.0``,
``fc``) so pretrained checkpoints convert mechanically.
"""
import jax.numpy as jnp

from curvature_tpu import nn


def channel_shuffle(x, groups: int = 2):
    """torchvision's channel_shuffle on the NHWC channel axis: index
    c = g * cpg + i  ->  i * groups + g."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class _ConvBNReLU(nn.Module):
    def __init__(self, features, kernel_size, stride, groups, name,
                 i0: int, relu: bool = True):
        """Sub-layer indices ``i0``/``i0+1`` inside a torch Sequential."""
        self.conv = nn.Conv(features, kernel_size, strides=stride,
                            padding=(kernel_size - 1) // 2, groups=groups,
                            use_bias=False, name=f"{name}.{i0}")
        self.bn = nn.BatchNorm(name=f"{name}.{i0 + 1}")
        self.relu = relu

    def __call__(self, ctx, x):
        y = self.bn(ctx, self.conv(ctx, x))
        return nn.ReLU()(ctx, y) if self.relu else y


class InvertedResidual(nn.Module):
    """torchvision shufflenetv2.InvertedResidual: stride-1 blocks split the
    channels and transform half; stride-2 blocks run both branches on the
    full input. Concat then shuffle with groups=2."""

    def __init__(self, inp: int, oup: int, stride: int, name: str):
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            # branch1: depthwise (k3, stride) -> BN -> 1x1 -> BN -> ReLU
            self.b1_dw = _ConvBNReLU(inp, 3, stride, inp, f"{name}.branch1",
                                     0, relu=False)
            self.b1_pw = _ConvBNReLU(bf, 1, 1, 1, f"{name}.branch1", 2)
        # branch2.0's input is the full tensor for stride-2 blocks and the
        # second channel half otherwise (Conv infers input channels at call)
        self.b2_pw1 = _ConvBNReLU(bf, 1, 1, 1, f"{name}.branch2", 0)
        self.b2_dw = _ConvBNReLU(bf, 3, stride, bf, f"{name}.branch2", 3,
                                 relu=False)
        self.b2_pw2 = _ConvBNReLU(bf, 1, 1, 1, f"{name}.branch2", 5)

    def __call__(self, ctx, x):
        if self.stride == 1:
            half = x.shape[-1] // 2
            x1, x2 = x[..., :half], x[..., half:]
            y2 = self.b2_pw2(ctx, self.b2_dw(ctx, self.b2_pw1(ctx, x2)))
            out = jnp.concatenate([x1, y2], axis=-1)
        else:
            y1 = self.b1_pw(ctx, self.b1_dw(ctx, x))
            y2 = self.b2_pw2(ctx, self.b2_dw(ctx, self.b2_pw1(ctx, x)))
            out = jnp.concatenate([y1, y2], axis=-1)
        return channel_shuffle(out, 2)


#: arch -> (stage repeats, stage out-channels) — torchvision shufflenetv2
_CONFIGS = {
    "shufflenet_v2_x0_5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


class ShuffleNetV2(nn.Module):
    def __init__(self, repeats, channels, num_classes: int):
        self.name = None
        self.conv1 = _ConvBNReLU(channels[0], 3, 2, 1, "conv1", 0)
        self.pool = nn.MaxPool(3, 2, padding=1)
        self.blocks = []
        inp = channels[0]
        for stage, (n, oup) in enumerate(zip(repeats, channels[1:4]),
                                         start=2):
            for i in range(n):
                self.blocks.append(InvertedResidual(
                    inp, oup, 2 if i == 0 else 1, f"stage{stage}.{i}"))
                inp = oup
        self.conv5 = _ConvBNReLU(channels[4], 1, 1, 1, "conv5", 0)
        self.fc = nn.Dense(num_classes, name="fc")

    def __call__(self, ctx, x):
        x = self.pool(ctx, self.conv1(ctx, x))
        for block in self.blocks:
            x = block(ctx, x)
        x = self.conv5(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.fc(ctx, x)


def shufflenet_v2(arch: str, num_classes: int = 1000) -> nn.Model:
    repeats, channels = _CONFIGS[arch]
    return nn.Model(ShuffleNetV2(repeats, channels, num_classes))


def shufflenet_v2_x1_0(num_classes: int = 1000) -> nn.Model:
    return shufflenet_v2("shufflenet_v2_x1_0", num_classes)
