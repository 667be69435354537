"""ResNet family (18/34/50/101/152 + ResNeXt + Wide ResNet) in NHWC with
torch-compatible naming.

Mirrors the capability of the reference's modified torchvision ResNet
(curvature/resnet.py:24-200): BasicBlock / Bottleneck, optional CIFAR stem
(3x3 stride-1 conv instead of 7x7 stride-2; reference resnet.py:128-130),
plus the groups/width_per_group axis (reference resnet.py:67-76) that
enables resnext50_32x4d/resnext101 and wide_resnet50_2/wide_resnet101_2 —
the grouped 3x3 convs run through the per-group block KFAC/EFB factors
(estimators/kfac.py _is_grouped; the reference's KFAC cannot run them).
Layer names follow torchvision state-dict paths ("layer1.0.conv2", ...) so
pretrained torch checkpoints convert mechanically (models.torch_convert).
"""
from typing import Sequence

from curvature_tpu import nn


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, planes: int, stride: int, downsample: bool, name: str):
        self.name = name
        self.conv1 = nn.Conv(planes, 3, strides=stride, padding=1,
                             use_bias=False, name=f"{name}.conv1")
        self.bn1 = nn.BatchNorm(name=f"{name}.bn1")
        self.conv2 = nn.Conv(planes, 3, padding=1, use_bias=False,
                             name=f"{name}.conv2")
        self.bn2 = nn.BatchNorm(name=f"{name}.bn2")
        self.downsample = None
        if downsample:
            self.downsample = [
                nn.Conv(planes, 1, strides=stride, use_bias=False,
                        name=f"{name}.downsample.0"),
                nn.BatchNorm(name=f"{name}.downsample.1"),
            ]

    def __call__(self, ctx, x):
        identity = x
        out = self.bn1(ctx, self.conv1(ctx, x))
        out = nn.ReLU()(ctx, out)
        out = self.bn2(ctx, self.conv2(ctx, out))
        if self.downsample is not None:
            identity = self.downsample[1](ctx, self.downsample[0](ctx, x))
        return nn.ReLU()(ctx, out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, planes: int, stride: int, downsample: bool, name: str,
                 groups: int = 1, base_width: int = 64):
        self.name = name
        # torchvision width rule (reference resnet.py:72): ResNeXt widens
        # by groups, Wide ResNet by base_width
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv(width, 1, use_bias=False, name=f"{name}.conv1")
        self.bn1 = nn.BatchNorm(name=f"{name}.bn1")
        self.conv2 = nn.Conv(width, 3, strides=stride, padding=1,
                             groups=groups,
                             use_bias=False, name=f"{name}.conv2")
        self.bn2 = nn.BatchNorm(name=f"{name}.bn2")
        self.conv3 = nn.Conv(planes * 4, 1, use_bias=False, name=f"{name}.conv3")
        self.bn3 = nn.BatchNorm(name=f"{name}.bn3")
        self.downsample = None
        if downsample:
            self.downsample = [
                nn.Conv(planes * 4, 1, strides=stride, use_bias=False,
                        name=f"{name}.downsample.0"),
                nn.BatchNorm(name=f"{name}.downsample.1"),
            ]

    def __call__(self, ctx, x):
        identity = x
        out = nn.ReLU()(ctx, self.bn1(ctx, self.conv1(ctx, x)))
        out = nn.ReLU()(ctx, self.bn2(ctx, self.conv2(ctx, out)))
        out = self.bn3(ctx, self.conv3(ctx, out))
        if self.downsample is not None:
            identity = self.downsample[1](ctx, self.downsample[0](ctx, x))
        return nn.ReLU()(ctx, out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers: Sequence[int], num_classes: int,
                 stem: str, groups: int = 1, base_width: int = 64):
        self.name = None
        if groups != 1 or base_width != 64:
            if block is not Bottleneck:
                raise ValueError(
                    "groups/base_width require Bottleneck blocks "
                    "(reference resnet.py:32-33)")
        self._block_kw = ({"groups": groups, "base_width": base_width}
                          if block is Bottleneck else {})
        if stem == "cifar":
            # Reference's CIFAR/GTSRB modification: 3x3 stride-1 stem
            # (resnet.py:128-130), maxpool retained (resnet.py:134).
            self.conv1 = nn.Conv(64, 3, strides=1, padding=1, use_bias=False,
                                 name="conv1")
        else:
            self.conv1 = nn.Conv(64, 7, strides=2, padding=3, use_bias=False,
                                 name="conv1")
        self.bn1 = nn.BatchNorm(name="bn1")
        self.maxpool = nn.MaxPool(3, 2, padding=1)
        self.blocks = []
        inplanes = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                downsample = (i == 0 and
                              (stride != 1 or inplanes != planes * block.expansion))
                self.blocks.append(
                    block(planes, stride, downsample, f"layer{stage + 1}.{i}",
                          **self._block_kw))
                inplanes = planes * block.expansion
        self.fc = nn.Dense(num_classes, name="fc")

    def __call__(self, ctx, x):
        x = nn.ReLU()(ctx, self.bn1(ctx, self.conv1(ctx, x)))
        x = self.maxpool(ctx, x)
        for b in self.blocks:
            x = b(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        return self.fc(ctx, x)


#: arch -> (block, layers, groups, width_per_group); widths follow
#: torchvision's _resnet dispatch so pretrained checkpoints convert 1:1
_CONFIGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "resnext101_64x4d": (Bottleneck, (3, 4, 23, 3), 64, 4),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), 1, 128),
}


def resnet(arch: str, num_classes: int = 1000, stem: str = "imagenet") -> nn.Model:
    block, layers, groups, width = _CONFIGS[arch]
    return nn.Model(ResNet(block, layers, num_classes, stem,
                           groups=groups, base_width=width))


def resnet18(num_classes: int = 10, stem: str = "cifar") -> nn.Model:
    """Default mirrors the reference's CIFAR/GTSRB variant (resnet.py:4-10)."""
    return resnet("resnet18", num_classes, stem)


def resnet34(num_classes: int = 1000, stem: str = "imagenet") -> nn.Model:
    return resnet("resnet34", num_classes, stem)


def resnet50(num_classes: int = 1000, stem: str = "imagenet") -> nn.Model:
    return resnet("resnet50", num_classes, stem)


def resnet101(num_classes: int = 1000, stem: str = "imagenet") -> nn.Model:
    return resnet("resnet101", num_classes, stem)


def resnet152(num_classes: int = 1000, stem: str = "imagenet") -> nn.Model:
    return resnet("resnet152", num_classes, stem)
