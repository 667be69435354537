"""LeNet-5 variant matching the reference's bundled MNIST model.

Reference: curvature/lenet5.py:10-31 — Conv(1->6, 5x5, pad 2), ReLU,
MaxPool 2x2, Conv(6->16, 5x5), ReLU, MaxPool 2x2, Flatten, Dense(400->120),
ReLU, Dense(120->84), ReLU, Dense(84->10). Input here is NHWC [B, 28, 28, 1].

The bundled torch checkpoint (curvature/lenet5_mnist.pth) converts directly
via models.torch_convert (Flatten is channel-major so fc1 lines up).
"""
from curvature_tpu import nn


#: torch Sequential state-dict prefixes -> our layer names
TORCH_KEY_MAP = {"0": "conv1", "3": "conv2", "7": "fc1", "9": "fc2", "11": "fc3"}


def lenet5(num_classes: int = 10) -> nn.Model:
    return nn.Model(nn.Sequential([
        nn.Conv(6, 5, padding=2, name="conv1"),
        nn.ReLU(),
        nn.MaxPool(2, 2),
        nn.Conv(16, 5, name="conv2"),
        nn.ReLU(),
        nn.MaxPool(2, 2),
        nn.Flatten(),
        nn.Dense(120, name="fc1"),
        nn.ReLU(),
        nn.Dense(84, name="fc2"),
        nn.ReLU(),
        nn.Dense(num_classes, name="fc3"),
    ]))
