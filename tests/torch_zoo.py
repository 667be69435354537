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


class _IncA(nn.Module):
    def __init__(self, in_c, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(in_c, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(in_c, pool_features, kernel_size=1)

    def forward(self, x):
        p = F.avg_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(p)], 1)


class _IncB(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3 = _BasicConv2d(in_c, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class _IncC(nn.Module):
    def __init__(self, in_c, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = _BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class _IncD(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(in_c, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class _IncE(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(in_c, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(in_c, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = _BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        y2m = self.branch3x3_1(x)
        y3m = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        return torch.cat([
            self.branch1x1(x),
            torch.cat([self.branch3x3_2a(y2m), self.branch3x3_2b(y2m)], 1),
            torch.cat([self.branch3x3dbl_3a(y3m),
                       self.branch3x3dbl_3b(y3m)], 1),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class TorchInceptionV3(nn.Module):
    """torchvision inception_v3(aux_logits=False) replica with the exact
    state-dict naming (Conv2d_1a_3x3 ... Mixed_7c, fc)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280)
        self.Mixed_7c = _IncE(2048)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


class _TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads,
                                                    batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(dim, mlp_dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(mlp_dim, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        y = self.ln_1(x)
        a, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _TorchViTEncoder(nn.Module):
    def __init__(self, seq, dim, depth, heads, mlp_dim):
        super().__init__()
        import collections
        self.pos_embedding = nn.Parameter(
            torch.empty(1, seq, dim).normal_(std=0.02))
        self.layers = nn.Sequential(collections.OrderedDict(
            (f"encoder_layer_{i}", _TorchViTBlock(dim, heads, mlp_dim))
            for i in range(depth)))
        self.ln = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class TorchViT(nn.Module):
    """torchvision VisionTransformer replica with the exact state-dict
    naming (conv_proj, class_token, encoder.pos_embedding,
    encoder.layers.encoder_layer_i.self_attention.in_proj_weight, ...)."""

    def __init__(self, image_size=32, patch_size=8, dim=64, depth=2,
                 heads=2, mlp_dim=128, num_classes=10):
        super().__init__()
        import collections
        self.patch_size = patch_size
        self.conv_proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.class_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        seq = (image_size // patch_size) ** 2 + 1
        self.encoder = _TorchViTEncoder(seq, dim, depth, heads, mlp_dim)
        self.heads = nn.Sequential(collections.OrderedDict(
            head=nn.Linear(dim, num_classes)))

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x).flatten(2).permute(0, 2, 1)   # [B, N, D]
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        x = self.encoder(x)
        return self.heads(x[:, 0])


# -------------------------------------------------------------- MobileNetV2
class _TorchConvBNReLU(nn.Sequential):
    def __init__(self, inp, oup, kernel_size=3, stride=1, groups=1):
        super().__init__(
            nn.Conv2d(inp, oup, kernel_size, stride,
                      (kernel_size - 1) // 2, groups=groups, bias=False),
            nn.BatchNorm2d(oup),
            nn.ReLU6(inplace=True))


class _TorchInvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        hidden = int(round(inp * expand_ratio))
        layers = []
        if expand_ratio != 1:
            layers.append(_TorchConvBNReLU(inp, hidden, kernel_size=1))
        layers += [
            _TorchConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
            nn.Conv2d(hidden, oup, 1, bias=False),
            nn.BatchNorm2d(oup),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TorchMobileNetV2(nn.Module):
    """torchvision mobilenet_v2 replica (state-dict naming
    ``features.1.conv.0.0``, ``classifier.1`` ...)."""

    _SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self, num_classes=10):
        super().__init__()
        input_channel, last_channel = 32, 1280
        features = [_TorchConvBNReLU(3, input_channel, stride=2)]
        for t, c, n, s in self._SETTINGS:
            for i in range(n):
                features.append(_TorchInvertedResidual(
                    input_channel, c, s if i == 0 else 1, t))
                input_channel = c
        features.append(_TorchConvBNReLU(input_channel, last_channel,
                                         kernel_size=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(last_channel, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


# ------------------------------------------------------------- EfficientNet
class _TorchConvBNSiLU(nn.Sequential):
    def __init__(self, inp, oup, kernel_size=3, stride=1, groups=1,
                 act=True):
        layers = [
            nn.Conv2d(inp, oup, kernel_size, stride,
                      (kernel_size - 1) // 2, groups=groups, bias=False),
            nn.BatchNorm2d(oup)]
        if act:
            layers.append(nn.SiLU(inplace=True))
        super().__init__(*layers)


class _TorchSqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation (fc1/fc2 1x1 convs with bias)."""

    def __init__(self, input_ch, squeeze_ch, act=None, scale_act=None):
        super().__init__()
        self.fc1 = nn.Conv2d(input_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, input_ch, 1)
        self.act = act or nn.SiLU()
        self.scale_act = scale_act or nn.Sigmoid()

    def forward(self, x):
        s = x.mean([2, 3], keepdim=True)
        s = self.fc2(self.act(self.fc1(s)))
        return x * self.scale_act(s)


def _torch_make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _TorchMBConv(nn.Module):
    def __init__(self, inp, oup, kernel, stride, expand_ratio):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        expanded = _torch_make_divisible(inp * expand_ratio)
        layers = []
        if expanded != inp:
            layers.append(_TorchConvBNSiLU(inp, expanded, kernel_size=1))
        layers += [
            _TorchConvBNSiLU(expanded, expanded, kernel_size=kernel,
                             stride=stride, groups=expanded),
            _TorchSqueezeExcitation(expanded, max(1, inp // 4)),
            _TorchConvBNSiLU(expanded, oup, kernel_size=1, act=False),
        ]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class TorchEfficientNet(nn.Module):
    """torchvision efficientnet_bN replica (state-dict naming
    ``features.1.0.block.0.0``, ``features.8.0``, ``classifier.1``)."""

    _SETTINGS = ((1, 3, 1, 16, 1), (6, 3, 2, 24, 2), (6, 5, 2, 40, 2),
                 (6, 3, 2, 80, 3), (6, 5, 1, 112, 3), (6, 5, 2, 192, 4),
                 (6, 3, 1, 320, 1))

    def __init__(self, num_classes=10, width_mult=1.0, depth_mult=1.0):
        super().__init__()
        import math
        adjust = lambda c: _torch_make_divisible(c * width_mult)  # noqa
        inp = adjust(32)
        features = [_TorchConvBNSiLU(3, inp, stride=2)]
        for t, k, s, c, n in self._SETTINGS:
            oup = adjust(c)
            stage = []
            for j in range(int(math.ceil(n * depth_mult))):
                stage.append(_TorchMBConv(inp, oup, k, s if j == 0 else 1, t))
                inp = oup
            features.append(nn.Sequential(*stage))
        features.append(_TorchConvBNSiLU(inp, 4 * inp, kernel_size=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(4 * inp, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


# -------------------------------------------------------------- MobileNetV3
class _TorchV3ConvBN(nn.Sequential):
    def __init__(self, inp, oup, kernel_size=3, stride=1, groups=1,
                 act="hswish"):
        layers = [
            nn.Conv2d(inp, oup, kernel_size, stride,
                      (kernel_size - 1) // 2, groups=groups, bias=False),
            nn.BatchNorm2d(oup)]
        if act == "hswish":
            layers.append(nn.Hardswish(inplace=True))
        elif act == "relu":
            layers.append(nn.ReLU(inplace=True))
        super().__init__(*layers)


class _TorchV3InvertedResidual(nn.Module):
    def __init__(self, inp, kernel, expanded, oup, use_se, act, stride):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expanded != inp:
            layers.append(_TorchV3ConvBN(inp, expanded, kernel_size=1,
                                         act=act))
        layers.append(_TorchV3ConvBN(expanded, expanded, kernel_size=kernel,
                                     stride=stride, groups=expanded, act=act))
        if use_se:
            layers.append(_TorchSqueezeExcitation(
                expanded, _torch_make_divisible(expanded // 4),
                act=nn.ReLU(), scale_act=nn.Hardsigmoid()))
        layers.append(_TorchV3ConvBN(expanded, oup, kernel_size=1,
                                     act="none"))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class TorchMobileNetV3(nn.Module):
    """torchvision mobilenet_v3_{large,small} replica (state-dict naming
    ``features.1.block.0.0``, ``classifier.0``/``classifier.3``)."""

    def __init__(self, settings, last_channel, num_classes=10):
        super().__init__()
        features = [_TorchV3ConvBN(3, settings[0][0], stride=2)]
        for cnf in settings:
            features.append(_TorchV3InvertedResidual(*cnf))
        lastconv_in = settings[-1][3]
        features.append(_TorchV3ConvBN(lastconv_in, 6 * lastconv_in,
                                       kernel_size=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Linear(6 * lastconv_in, last_channel),
            nn.Hardswish(inplace=True),
            nn.Dropout(0.2),
            nn.Linear(last_channel, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


# ------------------------------------------------------------- ShuffleNetV2
def _torch_channel_shuffle(x, groups):
    b, c, h, w = x.size()
    x = x.view(b, groups, c // groups, h, w)
    x = torch.transpose(x, 1, 2).contiguous()
    return x.view(b, c, h, w)


class _TorchShuffleUnit(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, bf, 1, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(inplace=True))
        else:
            self.branch1 = nn.Sequential()
        self.branch2 = nn.Sequential(
            nn.Conv2d(inp if stride > 1 else bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
            nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True))

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _torch_channel_shuffle(out, 2)


class TorchShuffleNetV2(nn.Module):
    """torchvision shufflenet_v2_xN replica (state-dict naming
    ``stage2.0.branch2.0``, ``conv5.0``, ``fc``)."""

    def __init__(self, repeats=(4, 8, 4),
                 channels=(24, 116, 232, 464, 1024), num_classes=10):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, channels[0], 3, 2, 1, bias=False),
            nn.BatchNorm2d(channels[0]),
            nn.ReLU(inplace=True))
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inp = channels[0]
        for stage, (n, oup) in enumerate(zip(repeats, channels[1:4]), 2):
            units = [_TorchShuffleUnit(inp, oup, 2)]
            inp = oup
            units += [_TorchShuffleUnit(inp, oup, 1) for _ in range(n - 1)]
            setattr(self, f"stage{stage}", nn.Sequential(*units))
        self.conv5 = nn.Sequential(
            nn.Conv2d(inp, channels[4], 1, bias=False),
            nn.BatchNorm2d(channels[4]),
            nn.ReLU(inplace=True))
        self.fc = nn.Linear(channels[4], num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.stage4(self.stage3(self.stage2(x)))
        x = self.conv5(x)
        return self.fc(x.mean([2, 3]))


# --------------------------------------------------------------- SqueezeNet
class _TorchFire(nn.Module):
    def __init__(self, inp, squeeze, expand):
        super().__init__()
        self.squeeze = nn.Conv2d(inp, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], 1)


class TorchSqueezeNet(nn.Module):
    """torchvision squeezenet1_0/1_1 replica (state-dict naming
    ``features.3.squeeze``, ``classifier.1``)."""

    def __init__(self, version="1_1", num_classes=10):
        super().__init__()
        if version == "1_0":
            layers = [nn.Conv2d(3, 96, 7, 2), nn.ReLU(inplace=True),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(96, 16, 64), _TorchFire(128, 16, 64),
                      _TorchFire(128, 32, 128),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(256, 32, 128), _TorchFire(256, 48, 192),
                      _TorchFire(384, 48, 192), _TorchFire(384, 64, 256),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(512, 64, 256)]
        else:
            layers = [nn.Conv2d(3, 64, 3, 2), nn.ReLU(inplace=True),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(64, 16, 64), _TorchFire(128, 16, 64),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(128, 32, 128), _TorchFire(256, 32, 128),
                      nn.MaxPool2d(3, 2, ceil_mode=True),
                      _TorchFire(256, 48, 192), _TorchFire(384, 48, 192),
                      _TorchFire(384, 64, 256), _TorchFire(512, 64, 256)]
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Conv2d(512, num_classes, 1),
            nn.ReLU(inplace=True), nn.AdaptiveAvgPool2d((1, 1)))

    def forward(self, x):
        x = self.classifier(self.features(x))
        return torch.flatten(x, 1)


# ----------------------------------------------------------------- ConvNeXt
class _TorchLayerNorm2d(nn.LayerNorm):
    """torchvision.models.convnext.LayerNorm2d (normalizes NCHW channels)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias,
                         self.eps)
        return x.permute(0, 3, 1, 2)


class _TorchCNBlock(nn.Module):
    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            _TorchPermute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim, bias=True),
            nn.GELU(),
            nn.Linear(4 * dim, dim, bias=True),
            _TorchPermute([0, 3, 1, 2]))
        self.layer_scale = nn.Parameter(
            torch.ones(dim, 1, 1) * layer_scale)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class _TorchPermute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return torch.permute(x, self.dims)


class TorchConvNeXt(nn.Module):
    """torchvision convnext_* replica (state-dict naming
    ``features.1.0.block.0``, ``features.2.1``, ``classifier.2``)."""

    def __init__(self, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                 num_classes=10):
        super().__init__()
        features = [nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4, bias=True),
            _TorchLayerNorm2d(dims[0], eps=1e-6))]
        for s, (n, dim) in enumerate(zip(depths, dims)):
            features.append(nn.Sequential(
                *[_TorchCNBlock(dim) for _ in range(n)]))
            if s + 1 < len(dims):
                features.append(nn.Sequential(
                    _TorchLayerNorm2d(dim, eps=1e-6),
                    nn.Conv2d(dim, dims[s + 1], 2, 2, bias=True)))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            _TorchLayerNorm2d(dims[-1], eps=1e-6),
            nn.Flatten(1),
            nn.Linear(dims[-1], num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 1)
        return self.classifier(x)


# ------------------------------------------------------------------- RegNet
class _TorchRegNetSE(nn.Module):
    """torchvision.ops.SqueezeExcitation as RegNet uses it (ReLU act,
    sigmoid gate)."""

    def __init__(self, input_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(input_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, input_ch, 1)

    def forward(self, x):
        s = x.mean([2, 3], keepdim=True)
        s = self.fc2(F.relu(self.fc1(s)))
        return x * torch.sigmoid(s)


class _TorchRegNetCNA(nn.Sequential):
    def __init__(self, inp, oup, kernel_size, stride=1, groups=1,
                 act=True):
        layers = [nn.Conv2d(inp, oup, kernel_size, stride,
                            (kernel_size - 1) // 2, groups=groups,
                            bias=False),
                  nn.BatchNorm2d(oup)]
        if act:
            layers.append(nn.ReLU(inplace=True))
        super().__init__(*layers)


class _TorchResBottleneckBlock(nn.Module):
    def __init__(self, w_in, w_out, stride, group_width, se_ratio):
        super().__init__()
        self.proj = None
        if w_in != w_out or stride != 1:
            self.proj = _TorchRegNetCNA(w_in, w_out, 1, stride, act=False)
        f = OrderedDict()
        f["a"] = _TorchRegNetCNA(w_in, w_out, 1)
        f["b"] = _TorchRegNetCNA(w_out, w_out, 3, stride,
                                 groups=w_out // group_width)
        if se_ratio:
            f["se"] = _TorchRegNetSE(w_out, int(round(se_ratio * w_in)))
        f["c"] = _TorchRegNetCNA(w_out, w_out, 1, act=False)
        self.f = nn.Sequential(f)

    def forward(self, x):
        y = self.f(x)
        shortcut = x if self.proj is None else self.proj(x)
        return F.relu(shortcut + y)


class TorchRegNet(nn.Module):
    """torchvision regnet_{x,y}_* replica (state-dict naming
    ``trunk_output.block1.block1-0.f.a.0``, ``stem.0``, ``fc``)."""

    def __init__(self, widths, depths, group_widths, se_ratio,
                 num_classes=10):
        super().__init__()
        self.stem = _TorchRegNetCNA(3, 32, 3, 2)
        trunk = OrderedDict()
        w_in = 32
        for s, (w, d, g) in enumerate(zip(widths, depths, group_widths), 1):
            stage = OrderedDict()
            for j in range(d):
                stage[f"block{s}-{j}"] = _TorchResBottleneckBlock(
                    w_in, w, 2 if j == 0 else 1, g, se_ratio)
                w_in = w
            trunk[f"block{s}"] = nn.Sequential(stage)
        self.trunk_output = nn.Sequential(trunk)
        self.fc = nn.Linear(w_in, num_classes)

    def forward(self, x):
        x = self.trunk_output(self.stem(x))
        return self.fc(x.mean([2, 3]))


# ------------------------------------------------------------------ AlexNet
class TorchAlexNet(nn.Module):
    """torchvision alexnet replica (``features.0..10``,
    ``classifier.1/4/6``)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2))
        self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self.classifier = nn.Sequential(
            nn.Dropout(), nn.Linear(256 * 36, 4096), nn.ReLU(inplace=True),
            nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(inplace=True),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


# ------------------------------------------------------------------ MNASNet
class _TorchMnasInvertedResidual(nn.Module):
    def __init__(self, inp, oup, kernel, stride, expansion):
        super().__init__()
        self.apply_residual = inp == oup and stride == 1
        mid = inp * expansion
        self.layers = nn.Sequential(
            nn.Conv2d(inp, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, kernel, stride, kernel // 2, groups=mid,
                      bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, oup, 1, bias=False),
            nn.BatchNorm2d(oup))

    def forward(self, x):
        y = self.layers(x)
        return x + y if self.apply_residual else y


class TorchMNASNet(nn.Module):
    """torchvision mnasnetN_N replica (state-dict naming ``layers.0``,
    ``layers.8.0.layers.3``, ``classifier.1``)."""

    _STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
               (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))

    def __init__(self, alpha=1.0, num_classes=10):
        super().__init__()
        d = [_torch_make_divisible(c * alpha)
             for c in (32, 16, 24, 40, 80, 96, 192, 320)]
        layers = [
            nn.Conv2d(3, d[0], 3, 2, 1, bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(inplace=True),
            nn.Conv2d(d[0], d[0], 3, 1, 1, groups=d[0], bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(inplace=True),
            nn.Conv2d(d[0], d[1], 1, bias=False),
            nn.BatchNorm2d(d[1])]
        inp = d[1]
        for (k, s, t, n), oup in zip(self._STACKS, d[2:]):
            stack = []
            for j in range(n):
                stack.append(_TorchMnasInvertedResidual(
                    inp, oup, k, s if j == 0 else 1, t))
                inp = oup
            layers.append(nn.Sequential(*stack))
        layers += [
            nn.Conv2d(inp, 1280, 1, bias=False),
            nn.BatchNorm2d(1280),
            nn.ReLU(inplace=True)]
        self.layers = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.layers(x)
        return self.classifier(x.mean([2, 3]))


# ----------------------------------------------------------- EfficientNetV2
class _TorchFusedMBConv(nn.Module):
    def __init__(self, inp, oup, kernel, stride, expand_ratio, bn_eps=1e-3):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        expanded = _torch_make_divisible(inp * expand_ratio)
        bn = lambda c: nn.BatchNorm2d(c, eps=bn_eps)  # noqa: E731
        if expanded != inp:
            block = [
                nn.Sequential(nn.Conv2d(inp, expanded, kernel, stride,
                                        (kernel - 1) // 2, bias=False),
                              bn(expanded), nn.SiLU(inplace=True)),
                nn.Sequential(nn.Conv2d(expanded, oup, 1, bias=False),
                              bn(oup))]
        else:
            block = [nn.Sequential(nn.Conv2d(inp, oup, kernel, stride,
                                             (kernel - 1) // 2, bias=False),
                                   bn(oup), nn.SiLU(inplace=True))]
        self.block = nn.Sequential(*block)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class _TorchMBConvV2(nn.Module):
    def __init__(self, inp, oup, kernel, stride, expand_ratio, bn_eps=1e-3):
        super().__init__()
        self.use_res = stride == 1 and inp == oup
        expanded = _torch_make_divisible(inp * expand_ratio)
        bn = lambda c: nn.BatchNorm2d(c, eps=bn_eps)  # noqa: E731
        layers = []
        if expanded != inp:
            layers.append(nn.Sequential(
                nn.Conv2d(inp, expanded, 1, bias=False), bn(expanded),
                nn.SiLU(inplace=True)))
        layers += [
            nn.Sequential(nn.Conv2d(expanded, expanded, kernel, stride,
                                    (kernel - 1) // 2, groups=expanded,
                                    bias=False),
                          bn(expanded), nn.SiLU(inplace=True)),
            _TorchSqueezeExcitation(expanded, max(1, inp // 4)),
            nn.Sequential(nn.Conv2d(expanded, oup, 1, bias=False),
                          bn(oup))]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class TorchEfficientNetV2(nn.Module):
    """torchvision efficientnet_v2_s replica (eps=1e-3 BNs, FusedMBConv
    early stages)."""

    _TABLE = (("fused", 1, 3, 1, 24, 24, 2), ("fused", 4, 3, 2, 24, 48, 4),
              ("fused", 4, 3, 2, 48, 64, 4), ("mb", 4, 3, 2, 64, 128, 6),
              ("mb", 6, 3, 1, 128, 160, 9), ("mb", 6, 3, 2, 160, 256, 15))

    def __init__(self, num_classes=10):
        super().__init__()
        bn = lambda c: nn.BatchNorm2d(c, eps=1e-3)  # noqa: E731
        features = [nn.Sequential(
            nn.Conv2d(3, 24, 3, 2, 1, bias=False), bn(24),
            nn.SiLU(inplace=True))]
        for kind, t, k, s, ci, co, n in self._TABLE:
            stage = []
            for j in range(n):
                cls = _TorchFusedMBConv if kind == "fused" else _TorchMBConvV2
                stage.append(cls(ci if j == 0 else co, co, k,
                                 s if j == 0 else 1, t))
            features.append(nn.Sequential(*stage))
        features.append(nn.Sequential(
            nn.Conv2d(256, 1280, 1, bias=False), bn(1280),
            nn.SiLU(inplace=True)))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.mean([2, 3]))


# --------------------------------------------------------- Swin Transformer
def _torch_shifted_window_attention(x, qkv_layer, proj_layer, bias_table,
                                    rel_index, window, shift, heads):
    """torchvision.models.swin_transformer.shifted_window_attention (v1)."""
    B, H, W, C = x.shape
    ws = window
    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    s0 = 0 if ws >= pH else shift
    s1 = 0 if ws >= pW else shift
    if s0 + s1 > 0:
        x = torch.roll(x, shifts=(-s0, -s1), dims=(1, 2))
    num_windows = (pH // ws) * (pW // ws)
    x = x.view(B, pH // ws, ws, pW // ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B * num_windows, ws * ws, C)

    qkv = qkv_layer(x)
    n = ws * ws
    qkv = qkv.reshape(x.size(0), n, 3, heads, C // heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = q.matmul(k.transpose(-2, -1)) * ((C // heads) ** -0.5)
    bias = bias_table[rel_index].view(n, n, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if s0 + s1 > 0:
        mask = x.new_zeros((pH, pW))
        cnt = 0
        h_slices = ((0, -ws), (-ws, -s0 if s0 else None),
                    (-s0 if s0 else None, None))
        w_slices = ((0, -ws), (-ws, -s1 if s1 else None),
                    (-s1 if s1 else None, None))
        for h0, h1 in h_slices:
            for w0, w1 in w_slices:
                mask[h0:h1, w0:w1] = cnt
                cnt += 1
        mask = mask.view(pH // ws, ws, pW // ws, ws)
        mask = mask.permute(0, 2, 1, 3).reshape(num_windows, n)
        am = mask.unsqueeze(1) - mask.unsqueeze(2)
        am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
        attn = attn.view(x.size(0) // num_windows, num_windows, heads, n, n)
        attn = attn + am.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, n, n)
    attn = F.softmax(attn, dim=-1)
    x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), n, C)
    x = proj_layer(x)
    x = x.view(B, pH // ws, pW // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if s0 + s1 > 0:
        x = torch.roll(x, shifts=(s0, s1), dims=(1, 2))
    return x[:, :H, :W, :].contiguous()


class _TorchSwinAttention(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.heads, self.window, self.shift = heads, window, shift
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index",
                             rel.sum(-1).flatten())

    def forward(self, x):
        return _torch_shifted_window_attention(
            x, self.qkv, self.proj, self.relative_position_bias_table,
            self.relative_position_index, self.window, self.shift,
            self.heads)


class _TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = _TorchSwinAttention(dim, heads, window, shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(4 * dim, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        H, W = x.shape[1], x.shape[2]
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.reduction(self.norm(x))


class TorchSwin(nn.Module):
    """torchvision swin_{t,s,b} replica (state-dict naming
    ``features.1.0.attn.qkv``, ``features.2.reduction``, ``norm``,
    ``head``); features operate in [B, H, W, C] like torchvision."""

    def __init__(self, embed=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=7, num_classes=10):
        super().__init__()
        features = [nn.Sequential(
            nn.Conv2d(3, embed, 4, 4),
            _TorchPermute([0, 2, 3, 1]),
            nn.LayerNorm(embed, eps=1e-5))]
        dim = embed
        for s, (d, nh) in enumerate(zip(depths, heads)):
            features.append(nn.Sequential(
                *[_TorchSwinBlock(dim, nh, window,
                                  0 if j % 2 == 0 else window // 2)
                  for j in range(d)]))
            if s + 1 < len(depths):
                features.append(_TorchPatchMerging(dim))
                dim *= 2
        self.features = nn.Sequential(*features)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = self.norm(x)
        x = x.permute(0, 3, 1, 2)
        x = F.adaptive_avg_pool2d(x, 1)
        return self.head(torch.flatten(x, 1))


# ------------------------------------------------------------------ Swin V2
def _torch_shifted_window_attention_v2(x, qkv_layer, proj_layer, bias,
                                       window, shift, heads, logit_scale):
    """torchvision shifted_window_attention with v2 semantics (cosine
    attention, clamped logit scale, k-bias zeroed)."""
    B, H, W, C = x.shape
    ws = window
    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    s0 = 0 if ws >= pH else shift
    s1 = 0 if ws >= pW else shift
    if s0 + s1 > 0:
        x = torch.roll(x, shifts=(-s0, -s1), dims=(1, 2))
    num_windows = (pH // ws) * (pW // ws)
    x = x.view(B, pH // ws, ws, pW // ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B * num_windows, ws * ws, C)

    qkv_bias = qkv_layer.bias.clone()
    length = qkv_bias.numel() // 3
    qkv_bias[length:2 * length].zero_()
    qkv = F.linear(x, qkv_layer.weight, qkv_bias)
    n = ws * ws
    qkv = qkv.reshape(x.size(0), n, 3, heads, C // heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = F.normalize(q, dim=-1).matmul(
        F.normalize(k, dim=-1).transpose(-2, -1))
    attn = attn * torch.clamp(
        logit_scale, max=torch.log(torch.tensor(100.0))).exp()
    attn = attn + bias
    if s0 + s1 > 0:
        mask = x.new_zeros((pH, pW))
        cnt = 0
        for h0, h1 in ((0, -ws), (-ws, -s0 if s0 else None),
                       (-s0 if s0 else None, None)):
            for w0, w1 in ((0, -ws), (-ws, -s1 if s1 else None),
                           (-s1 if s1 else None, None)):
                mask[h0:h1, w0:w1] = cnt
                cnt += 1
        mask = mask.view(pH // ws, ws, pW // ws, ws)
        mask = mask.permute(0, 2, 1, 3).reshape(num_windows, n)
        am = mask.unsqueeze(1) - mask.unsqueeze(2)
        am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
        attn = attn.view(x.size(0) // num_windows, num_windows, heads, n, n)
        attn = attn + am.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, n, n)
    attn = F.softmax(attn, dim=-1)
    x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), n, C)
    x = proj_layer(x)
    x = x.view(B, pH // ws, pW // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if s0 + s1 > 0:
        x = torch.roll(x, shifts=(s0, s1), dims=(1, 2))
    return x[:, :H, :W, :].contiguous()


class _TorchSwinAttentionV2(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.heads, self.window, self.shift = heads, window, shift
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones((heads, 1, 1))))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, heads, bias=False))
        rh = torch.arange(-(window - 1), window, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(rh, rh, indexing="ij"))
        table = table.permute(1, 2, 0).contiguous().unsqueeze(0)
        table = table / (window - 1) * 8
        table = torch.sign(table) * torch.log2(torch.abs(table) + 1.0) / 3.0
        self.register_buffer("relative_coords_table", table)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index",
                             rel.sum(-1).flatten())

    def forward(self, x):
        n = self.window * self.window
        table = self.cpb_mlp(self.relative_coords_table).view(-1, self.heads)
        bias = table[self.relative_position_index].view(n, n, -1)
        bias = 16 * torch.sigmoid(bias.permute(2, 0, 1)).unsqueeze(0)
        return _torch_shifted_window_attention_v2(
            x, self.qkv, self.proj, bias, self.window, self.shift,
            self.heads, self.logit_scale)


class _TorchSwinBlockV2(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = _TorchSwinAttentionV2(dim, heads, window, shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(4 * dim, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.norm1(self.attn(x))
        return x + self.norm2(self.mlp(x))


class _TorchPatchMergingV2(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        H, W = x.shape[1], x.shape[2]
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.norm(self.reduction(x))


class TorchSwinV2(nn.Module):
    """torchvision swin_v2_{t,s,b} replica."""

    def __init__(self, embed=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=8, num_classes=10):
        super().__init__()
        features = [nn.Sequential(
            nn.Conv2d(3, embed, 4, 4),
            _TorchPermute([0, 2, 3, 1]),
            nn.LayerNorm(embed, eps=1e-5))]
        dim = embed
        for s, (d, nh) in enumerate(zip(depths, heads)):
            features.append(nn.Sequential(
                *[_TorchSwinBlockV2(dim, nh, window,
                                    0 if j % 2 == 0 else window // 2)
                  for j in range(d)]))
            if s + 1 < len(depths):
                features.append(_TorchPatchMergingV2(dim))
                dim *= 2
        self.features = nn.Sequential(*features)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = self.norm(x)
        x = x.permute(0, 3, 1, 2)
        x = F.adaptive_avg_pool2d(x, 1)
        return self.head(torch.flatten(x, 1))


# ---------------------------------------------------------------- MaxViT

def _maxvit_rel_index(p):
    coords = torch.stack(torch.meshgrid(
        [torch.arange(p), torch.arange(p)], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += p - 1
    rel[:, :, 1] += p - 1
    rel[:, :, 0] *= 2 * p - 1
    return rel.sum(-1)                                   # [p*p, p*p]


def _maxvit_partition(x, p):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // p, p, w // p, p)
    x = x.permute(0, 2, 4, 3, 5, 1)
    return x.reshape(b, (h // p) * (w // p), p * p, c)


def _maxvit_departition(x, p, gh, gw):
    b, _, _, c = x.shape
    x = x.reshape(b, gh, gw, p, p, c)
    x = x.permute(0, 5, 1, 3, 2, 4)
    return x.reshape(b, c, gh * p, gw * p)


class _TorchMaxVitAttention(nn.Module):
    """torchvision RelativePositionalMultiHeadAttention (note: keys scale
    by feat_dim**-0.5, NOT head_dim**-0.5)."""

    def __init__(self, dim, head_dim, seq_len):
        super().__init__()
        self.n_heads = dim // head_dim
        self.head_dim = head_dim
        self.size = int(seq_len ** 0.5)
        self.to_qkv = nn.Linear(dim, dim * 3)
        self.scale_factor = dim ** -0.5
        self.merge = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.empty(((2 * self.size - 1) ** 2, self.n_heads)))
        self.register_buffer("relative_position_index",
                             _maxvit_rel_index(self.size))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)

    def forward(self, x):
        b, g, n, d = x.shape
        h, hd = self.n_heads, self.head_dim
        q, k, v = torch.chunk(self.to_qkv(x), 3, dim=-1)
        q = q.reshape(b, g, n, h, hd).permute(0, 1, 3, 2, 4)
        k = k.reshape(b, g, n, h, hd).permute(0, 1, 3, 2, 4) \
            * self.scale_factor
        v = v.reshape(b, g, n, h, hd).permute(0, 1, 3, 2, 4)
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        attn = attn.softmax(-1)
        out = (attn @ v).permute(0, 1, 3, 2, 4).reshape(b, g, n, d)
        return self.merge(out)


class _TorchMaxVitPartitionAttention(nn.Module):
    def __init__(self, dim, head_dim, partition, grid_size, kind):
        super().__init__()
        self.kind = kind
        self.p = partition if kind == "window" else grid_size // partition
        self.grid_size = grid_size
        self.attn_layer = nn.Sequential(
            nn.LayerNorm(dim),
            _TorchMaxVitAttention(dim, head_dim, partition * partition))
        self.mlp_layer = nn.Sequential(
            nn.LayerNorm(dim), nn.Linear(dim, 4 * dim), nn.GELU(),
            nn.Linear(4 * dim, dim))

    def forward(self, x):
        gh = gw = self.grid_size // self.p
        x = _maxvit_partition(x, self.p)
        if self.kind == "grid":
            x = x.swapaxes(-2, -3)
        x = x + self.attn_layer(x)
        x = x + self.mlp_layer(x)
        if self.kind == "grid":
            x = x.swapaxes(-2, -3)
        return _maxvit_departition(x, self.p, gh, gw)


class _TorchMaxVitMBConv(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        mid, sqz = int(cout * 4), int(cout * 0.25)
        if stride != 1 or cin != cout:
            proj = [nn.Conv2d(cin, cout, 1, bias=True)]
            if stride == 2:
                proj = [nn.AvgPool2d(3, stride=2, padding=1)] + proj
            self.proj = nn.Sequential(*proj)
        else:
            self.proj = nn.Identity()
        self.layers = nn.Sequential(OrderedDict(
            pre_norm=nn.BatchNorm2d(cin, eps=1e-3),
            conv_a=nn.Sequential(nn.Conv2d(cin, mid, 1, bias=False),
                                 nn.BatchNorm2d(mid, eps=1e-3), nn.GELU()),
            conv_b=nn.Sequential(
                nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
                nn.BatchNorm2d(mid, eps=1e-3), nn.GELU()),
            squeeze_excitation=_TorchSqueezeExcitation(mid, sqz),
            conv_c=nn.Conv2d(mid, cout, 1, bias=True)))

    def forward(self, x):
        return self.proj(x) + self.layers(x)


class _TorchMaxVitLayer(nn.Module):
    def __init__(self, cin, cout, stride, head_dim, partition, grid_size):
        super().__init__()
        self.layers = nn.Sequential(OrderedDict(
            MBconv=_TorchMaxVitMBConv(cin, cout, stride),
            window_attention=_TorchMaxVitPartitionAttention(
                cout, head_dim, partition, grid_size, "window"),
            grid_attention=_TorchMaxVitPartitionAttention(
                cout, head_dim, partition, grid_size, "grid")))

    def forward(self, x):
        return self.layers(x)


class _TorchMaxVitBlock(nn.Module):
    def __init__(self, cin, cout, depth, head_dim, partition, grid_size):
        super().__init__()
        self.layers = nn.ModuleList(
            [_TorchMaxVitLayer(cin if j == 0 else cout, cout,
                               2 if j == 0 else 1, head_dim, partition,
                               grid_size) for j in range(depth)])

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class TorchMaxVit(nn.Module):
    """torchvision maxvit replica (stem -> MBConv+window/grid attention
    blocks -> LN/Linear/tanh/Linear classifier)."""

    def __init__(self, stem=64, channels=(64, 128, 256, 512),
                 layers=(2, 2, 5, 2), head_dim=32, partition=7,
                 input_size=224, num_classes=10):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Sequential(nn.Conv2d(3, stem, 3, 2, 1, bias=False),
                          nn.BatchNorm2d(stem, eps=1e-3), nn.GELU()),
            nn.Sequential(nn.Conv2d(stem, stem, 3, 1, 1, bias=True)))
        size = input_size // 2
        blocks = []
        cin = stem
        for cout, depth in zip(channels, layers):
            size //= 2
            blocks.append(_TorchMaxVitBlock(cin, cout, depth, head_dim,
                                            partition, size))
            cin = cout
        self.blocks = nn.ModuleList(blocks)
        self.classifier = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Flatten(),
            nn.LayerNorm(channels[-1]),
            nn.Linear(channels[-1], channels[-1]), nn.Tanh(),
            nn.Linear(channels[-1], num_classes, bias=False))

    def forward(self, x):
        x = self.stem(x)
        for block in self.blocks:
            x = block(x)
        return self.classifier(x)
