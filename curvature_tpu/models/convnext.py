"""ConvNeXt (tiny/small/base/large) in NHWC with torchvision naming.

The modern LayerNorm convnet from the torchvision zoo the reference loads
by name (reference factors.py:80-84). Every block is a depthwise 7x7
(groups=C — per-group block KFAC/EFB/INF factors, one 49(+1)-column
Kronecker basis per channel) followed by an MLP whose Linears act on the
channels-last feature map — tracked layers capturing [N*H*W, C] token
activations exactly like a transformer MLP. ``layer_scale`` converts as a
raw ``{"value": ...}`` parameter group (torch shape [C, 1, 1]).

Layer names follow torchvision paths (``features.1.0.block.0``,
``features.2.1``, ``classifier.2``) so pretrained checkpoints convert
mechanically; LayerNorm2d becomes plain last-axis LayerNorm in NHWC.
"""
import jax.numpy as jnp

from curvature_tpu import nn
from curvature_tpu.models.transformer2 import LayerNorm


class CNBlock(nn.Module):
    """dw 7x7 -> LayerNorm -> Linear(4C) -> GELU -> Linear(C), scaled by
    layer_scale, residual (stochastic depth is an eval no-op). Sub-layer
    indices mirror torchvision's CNBlock Sequential (the Permutes occupy
    indices 1 and 6 but carry no parameters)."""

    def __init__(self, dim: int, name: str):
        self.name = name
        self.dim = dim
        self.dw = nn.Conv(dim, 7, padding=3, groups=dim,
                          name=f"{name}.block.0")
        self.norm = LayerNorm(eps=1e-6, name=f"{name}.block.2")
        self.fc1 = nn.Dense(4 * dim, name=f"{name}.block.3")
        self.fc2 = nn.Dense(dim, name=f"{name}.block.5")

    def __call__(self, ctx, x):
        y = self.dw(ctx, x)
        y = self.norm(ctx, y)
        y = self.fc2(ctx, nn.GELU()(ctx, self.fc1(ctx, y)))
        scale = ctx.param(f"{self.name}.layer_scale", "value",
                          (self.dim, 1, 1),
                          lambda k, s: jnp.full(s, 1e-6, jnp.float32))
        return x + y * scale.reshape(-1)


class _Downsample(nn.Module):
    """LayerNorm then 2x2 stride-2 conv (torchvision's downsampling
    Sequential: norm at ``{name}.0``, conv at ``{name}.1``)."""

    def __init__(self, dim: int, name: str):
        self.norm = LayerNorm(eps=1e-6, name=f"{name}.0")
        self.conv = nn.Conv(dim, 2, strides=2, name=f"{name}.1")

    def __call__(self, ctx, x):
        return self.conv(ctx, self.norm(ctx, x))


#: arch -> (per-stage block counts, per-stage dims) — torchvision convnext
_CONFIGS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXt(nn.Module):
    def __init__(self, depths, dims, num_classes: int):
        self.name = None
        # stem: 4x4 stride-4 patchify conv (bias) + LayerNorm
        self.stem_conv = nn.Conv(dims[0], 4, strides=4, name="features.0.0")
        self.stem_norm = LayerNorm(eps=1e-6, name="features.0.1")
        self.stages = []
        fi = 1
        for s, (n, dim) in enumerate(zip(depths, dims)):
            blocks = [CNBlock(dim, f"features.{fi}.{j}") for j in range(n)]
            down = None
            if s + 1 < len(dims):
                down = _Downsample(dims[s + 1], f"features.{fi + 1}")
            self.stages.append((blocks, down))
            fi += 2
        self.final_norm = LayerNorm(eps=1e-6, name="classifier.0")
        self.fc = nn.Dense(num_classes, name="classifier.2")

    def __call__(self, ctx, x):
        x = self.stem_norm(ctx, self.stem_conv(ctx, x))
        for blocks, down in self.stages:
            for block in blocks:
                x = block(ctx, x)
            if down is not None:
                x = down(ctx, x)
        x = nn.GlobalAvgPool()(ctx, x)
        x = self.final_norm(ctx, x)
        return self.fc(ctx, x)


def convnext(arch: str, num_classes: int = 1000) -> nn.Model:
    depths, dims = _CONFIGS[arch]
    return nn.Model(ConvNeXt(depths, dims, num_classes))


def convnext_tiny(num_classes: int = 1000) -> nn.Model:
    return convnext("convnext_tiny", num_classes)
