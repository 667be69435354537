"""AlexNet in NHWC with torchvision state-dict naming.

The simplest "any torchvision model by name" entry (reference
factors.py:80-84): five conv layers + three linears, all with bias, no
normalization — the channel-major Flatten between features and classifier
is the same NCHW-ordering contract the LeNet-5 conversion proves.

Layer names follow torchvision paths (``features.0``...``features.10``,
``classifier.1``/``4``/``6``).
"""
from curvature_tpu import nn


class AlexNet(nn.Module):
    def __init__(self, num_classes: int):
        self.name = None
        self.c0 = nn.Conv(64, 11, strides=4, padding=2, name="features.0")
        self.c3 = nn.Conv(192, 5, padding=2, name="features.3")
        self.c6 = nn.Conv(384, 3, padding=1, name="features.6")
        self.c8 = nn.Conv(256, 3, padding=1, name="features.8")
        self.c10 = nn.Conv(256, 3, padding=1, name="features.10")
        self.pool = nn.MaxPool(3, 2)
        self.fc1 = nn.Dense(4096, name="classifier.1")
        self.fc2 = nn.Dense(4096, name="classifier.4")
        self.fc3 = nn.Dense(num_classes, name="classifier.6")

    def __call__(self, ctx, x):
        relu = nn.ReLU()
        x = self.pool(ctx, relu(ctx, self.c0(ctx, x)))
        x = self.pool(ctx, relu(ctx, self.c3(ctx, x)))
        x = relu(ctx, self.c6(ctx, x))
        x = relu(ctx, self.c8(ctx, x))
        x = self.pool(ctx, relu(ctx, self.c10(ctx, x)))
        x = nn.AdaptiveAvgPool(6)(ctx, x)
        x = nn.Flatten()(ctx, x)                 # channel-major (NCHW order)
        x = relu(ctx, self.fc1(ctx, x))
        x = relu(ctx, self.fc2(ctx, x))
        return self.fc3(ctx, x)


def alexnet(num_classes: int = 1000) -> nn.Model:
    return nn.Model(AlexNet(num_classes))
