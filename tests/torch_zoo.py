"""Minimal PyTorch replicas of torchvision zoo architectures, used as
conversion-parity ground truth (torchvision itself is not installed here).

Module paths replicate torchvision state-dict naming exactly
(``features.denseblock1.denselayer1.conv1`` ...), so these stand in for
the pretrained checkpoints the reference loads via
``getattr(torchvision.models, name)`` (reference scripts/factors.py:80-84).
Only the inference graph is replicated — no aux heads, no init schemes.
"""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- DenseNet
class _DenseLayer(nn.Module):
    def __init__(self, in_f, growth, bn_size):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_f)
        self.conv1 = nn.Conv2d(in_f, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        out = self.conv1(F.relu(self.norm1(x)))
        out = self.conv2(F.relu(self.norm2(out)))
        return torch.cat([x, out], 1)


class _Transition(nn.Module):
    def __init__(self, in_f, out_f):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_f)
        self.conv = nn.Conv2d(in_f, out_f, 1, bias=False)

    def forward(self, x):
        return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2, 2)


_DENSENET_CFG = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


class TorchDenseNet(nn.Module):
    def __init__(self, arch="densenet121", num_classes=10, bn_size=4):
        super().__init__()
        growth, blocks, init_f = _DENSENET_CFG[arch]
        features = OrderedDict()
        features["conv0"] = nn.Conv2d(3, init_f, 7, 2, 3, bias=False)
        features["norm0"] = nn.BatchNorm2d(init_f)
        feats = init_f
        for bi, n in enumerate(blocks):
            block = nn.Module()
            for li in range(n):
                block.add_module(f"denselayer{li + 1}",
                                 _DenseLayer(feats, growth, bn_size))
                feats += growth
            features[f"denseblock{bi + 1}"] = block
            if bi != len(blocks) - 1:
                features[f"transition{bi + 1}"] = _Transition(feats, feats // 2)
                feats //= 2
        features["norm5"] = nn.BatchNorm2d(feats)
        self.features = nn.ModuleDict(features)
        self.classifier = nn.Linear(feats, num_classes)

    def forward(self, x):
        f = self.features
        x = F.max_pool2d(F.relu(f["norm0"](f["conv0"](x))), 3, 2, 1)
        for name, mod in f.items():
            if name.startswith("denseblock"):
                for layer in mod.children():
                    x = layer(x)
            elif name.startswith("transition"):
                x = mod(x)
        x = F.relu(f["norm5"](x))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# -------------------------------------------------------------------- VGG
_VGG_CFG = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class TorchVGG(nn.Module):
    def __init__(self, arch="vgg11", num_classes=10, batch_norm=False):
        super().__init__()
        layers, in_c = [], 3
        for v in _VGG_CFG[arch]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=True))
                in_c = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(inplace=True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(inplace=True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x)).flatten(1)
        return self.classifier(x)


# -------------------------------------------------------------- GoogLeNet
class _BasicConv2d(nn.Module):
    def __init__(self, in_c, out_c, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_c, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class _Inception(nn.Module):
    def __init__(self, in_c, c1, c3r, c3, c5r, c5, pool_proj):
        super().__init__()
        self.branch1 = _BasicConv2d(in_c, c1, kernel_size=1)
        self.branch2 = nn.Sequential(
            _BasicConv2d(in_c, c3r, kernel_size=1),
            _BasicConv2d(c3r, c3, kernel_size=3, padding=1))
        self.branch3 = nn.Sequential(
            _BasicConv2d(in_c, c5r, kernel_size=1),
            _BasicConv2d(c5r, c5, kernel_size=3, padding=1))
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, 1, 1, ceil_mode=True),
            _BasicConv2d(in_c, pool_proj, kernel_size=1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x),
                          self.branch3(x), self.branch4(x)], 1)


class TorchGoogLeNet(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = _BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.conv2 = _BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = _BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.inception3a = _Inception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = _Inception(256, 128, 128, 192, 32, 96, 64)
        self.inception4a = _Inception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = _Inception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = _Inception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = _Inception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = _Inception(528, 256, 160, 320, 32, 128, 128)
        self.inception5a = _Inception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = _Inception(832, 384, 192, 384, 48, 128, 128)
        self.fc = nn.Linear(1024, num_classes)

    def forward(self, x):
        x = F.max_pool2d(self.conv1(x), 3, 2, ceil_mode=True)
        x = F.max_pool2d(self.conv3(self.conv2(x)), 3, 2, ceil_mode=True)
        x = F.max_pool2d(self.inception3b(self.inception3a(x)), 3, 2,
                         ceil_mode=True)
        x = self.inception4e(self.inception4d(self.inception4c(
            self.inception4b(self.inception4a(x)))))
        x = F.max_pool2d(x, 2, 2, ceil_mode=True)
        x = self.inception5b(self.inception5a(x))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)
