"""MNASNet (0.5/0.75/1.0/1.3) in NHWC with torchvision state-dict naming.

Another depthwise-separable torchvision family from the reference's "any
model by name" surface (reference factors.py:80-84); the depthwise convs
run through the per-group block KFAC/EFB/INF factors. torchvision names
the whole trunk as one flat ``layers`` Sequential (``layers.0``,
``layers.8.0.layers.3`` ...) with inverted-residual stacks at indices
8-13 and the classifier Linear at ``classifier.1``.
"""
from curvature_tpu import nn
from curvature_tpu.models.mobilenet import _make_divisible


class _InvertedResidual(nn.Module):
    """torchvision mnasnet._InvertedResidual: expand 1x1 -> depthwise kxk
    -> project 1x1, all inside a nested ``layers`` Sequential."""

    def __init__(self, inp: int, oup: int, kernel: int, stride: int,
                 expansion: int, name: str):
        self.use_res = inp == oup and stride == 1
        mid = inp * expansion
        n = f"{name}.layers"
        self.expand = nn.Conv(mid, 1, use_bias=False, name=f"{n}.0")
        self.bn1 = nn.BatchNorm(name=f"{n}.1")
        self.dw = nn.Conv(mid, kernel, strides=stride,
                          padding=kernel // 2, groups=mid,
                          use_bias=False, name=f"{n}.3")
        self.bn2 = nn.BatchNorm(name=f"{n}.4")
        self.project = nn.Conv(oup, 1, use_bias=False, name=f"{n}.6")
        self.bn3 = nn.BatchNorm(name=f"{n}.7")

    def __call__(self, ctx, x):
        relu = nn.ReLU()
        y = relu(ctx, self.bn1(ctx, self.expand(ctx, x)))
        y = relu(ctx, self.bn2(ctx, self.dw(ctx, y)))
        y = self.bn3(ctx, self.project(ctx, y))
        return x + y if self.use_res else y


#: (kernel, stride, expansion, repeats) per stack at layers.8..13; base
#: depths [32, 16, 24, 40, 80, 96, 192, 320] scale by alpha via
#: _round_to_multiple_of (== _make_divisible)
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
           (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))
_BASE_DEPTHS = (32, 16, 24, 40, 80, 96, 192, 320)


class MNASNet(nn.Module):
    def __init__(self, alpha: float, num_classes: int):
        self.name = None
        d = [_make_divisible(c * alpha) for c in _BASE_DEPTHS]
        self.stem = nn.Conv(d[0], 3, strides=2, padding=1,
                            use_bias=False, name="layers.0")
        self.stem_bn = nn.BatchNorm(name="layers.1")
        self.sep_dw = nn.Conv(d[0], 3, padding=1, groups=d[0],
                              use_bias=False, name="layers.3")
        self.sep_bn = nn.BatchNorm(name="layers.4")
        self.sep_pw = nn.Conv(d[1], 1, use_bias=False, name="layers.6")
        self.sep_pw_bn = nn.BatchNorm(name="layers.7")
        self.blocks = []
        inp = d[1]
        for li, ((k, s, t, n), oup) in enumerate(zip(_STACKS, d[2:]),
                                                 start=8):
            for j in range(n):
                self.blocks.append(_InvertedResidual(
                    inp, oup, k, s if j == 0 else 1, t, f"layers.{li}.{j}"))
                inp = oup
        self.head = nn.Conv(1280, 1, use_bias=False, name="layers.14")
        self.head_bn = nn.BatchNorm(name="layers.15")
        self.classifier = nn.Dense(num_classes, name="classifier.1")

    def __call__(self, ctx, x):
        relu = nn.ReLU()
        x = relu(ctx, self.stem_bn(ctx, self.stem(ctx, x)))
        x = relu(ctx, self.sep_bn(ctx, self.sep_dw(ctx, x)))
        x = self.sep_pw_bn(ctx, self.sep_pw(ctx, x))
        for block in self.blocks:
            x = block(ctx, x)
        x = relu(ctx, self.head_bn(ctx, self.head(ctx, x)))
        x = nn.GlobalAvgPool()(ctx, x)
        return self.classifier(ctx, x)


def mnasnet(alpha: float, num_classes: int = 1000) -> nn.Model:
    return nn.Model(MNASNet(alpha, num_classes))


def mnasnet1_0(num_classes: int = 1000) -> nn.Model:
    return mnasnet(1.0, num_classes)
