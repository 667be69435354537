"""Vision Transformer (torchvision ``vit_b_16``-style) in NHWC.

The reference supports attention layers only for Diagonal/BlockDiagonal and
raises NotImplementedError in KFAC/EFB/INF (reference curvatures.py:303-304,
351-352, 435-436); here every ViT projection — patch embedding conv, packed
qkv ``in_proj``, ``out_proj``, both MLP linears, classifier head — is a
tracked layer for all five estimators (optionally with KFAC's
``attention_qkv_split``).

Naming follows torchvision state-dict paths (``conv_proj``, ``class_token``,
``encoder.pos_embedding``, ``encoder.layers.encoder_layer_i.*``,
``heads.head``) so pretrained checkpoints convert mechanically via
``models.torch_convert`` (packed ``in_proj_weight``, LayerNorm 1-D weights
and raw tensors are handled there).
"""
import jax
import jax.numpy as jnp

from curvature_tpu import nn
from curvature_tpu.models.transformer2 import LayerNorm


class ViTBlock(nn.Module):
    """Pre-LN encoder block: x += attn(ln_1(x)); x += mlp(ln_2(x))."""

    def __init__(self, dim: int, heads: int, mlp_dim: int, name: str):
        self.name = name
        self.ln_1 = LayerNorm(eps=1e-6, name=f"{name}.ln_1")
        self.attn = nn.MultiheadAttention(dim, heads,
                                          name=f"{name}.self_attention")
        self.ln_2 = LayerNorm(eps=1e-6, name=f"{name}.ln_2")
        # torchvision MLPBlock is Sequential(Linear, GELU, Dropout, Linear,
        # Dropout) -> state-dict indices 0 and 3
        self.fc1 = nn.Dense(mlp_dim, name=f"{name}.mlp.0")
        self.fc2 = nn.Dense(dim, name=f"{name}.mlp.3")

    def __call__(self, ctx, x):
        x = x + self.attn(ctx, self.ln_1(ctx, x))
        h = nn.GELU()(ctx, self.fc1(ctx, self.ln_2(ctx, x)))
        return x + self.fc2(ctx, h)


class VisionTransformer(nn.Module):
    def __init__(self, image_size: int, patch_size: int, dim: int,
                 depth: int, heads: int, mlp_dim: int, num_classes: int,
                 scan_blocks: bool = False):
        self.name = None
        self.patch_size = patch_size
        self.dim = dim
        self.seq_len = (image_size // patch_size) ** 2 + 1
        self.conv_proj = nn.Conv(dim, patch_size, strides=patch_size,
                                 name="conv_proj")
        if scan_blocks:
            # depth-scanned stack: compile cost O(1) in depth (nn/scan.py);
            # per_depth_names lets checkpoint conversion gather torchvision's
            # per-layer tensors into the stacked [depth, ...] layout
            self.blocks = nn.ScanBlocks(
                lambda prefix: ViTBlock(dim, heads, mlp_dim, prefix),
                depth, "encoder.layers",
                per_depth_names=[f"encoder.layers.encoder_layer_{i}"
                                 for i in range(depth)])
        else:
            self.blocks = [
                ViTBlock(dim, heads, mlp_dim,
                         f"encoder.layers.encoder_layer_{i}")
                for i in range(depth)
            ]
        self.ln = LayerNorm(eps=1e-6, name="encoder.ln")
        self.head = nn.Dense(num_classes, name="heads.head")

    def __call__(self, ctx, x):
        b = x.shape[0]
        x = self.conv_proj(ctx, x)                     # [B, H/p, W/p, D]
        x = x.reshape(b, -1, self.dim)                 # [B, N, D]
        cls = ctx.param("class_token", "value", (1, 1, self.dim),
                        lambda k, s: jnp.zeros(s, jnp.float32))
        pos = ctx.param("encoder.pos_embedding", "value",
                        (1, self.seq_len, self.dim),
                        lambda k, s: 0.02 * jax.random.normal(k, s))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1)
        x = x + pos
        if isinstance(self.blocks, nn.ScanBlocks):
            x = self.blocks(ctx, x)
        else:
            for blk in self.blocks:
                x = blk(ctx, x)
        x = self.ln(ctx, x)
        return self.head(ctx, x[:, 0])                 # class token


def vit(image_size: int = 224, patch_size: int = 16, dim: int = 768,
        depth: int = 12, heads: int = 12, mlp_dim: int = 3072,
        num_classes: int = 1000, scan_blocks: bool = False) -> nn.Model:
    return nn.Model(VisionTransformer(image_size, patch_size, dim, depth,
                                      heads, mlp_dim, num_classes,
                                      scan_blocks=scan_blocks))


def vit_b_16(num_classes: int = 1000, image_size: int = 224,
             scan_blocks: bool = False) -> nn.Model:
    """torchvision ``vit_b_16``: 12 layers, 12 heads, dim 768, MLP 3072."""
    return vit(image_size, 16, 768, 12, 12, 3072, num_classes,
               scan_blocks=scan_blocks)


def vit_b_32(num_classes: int = 1000, image_size: int = 224,
             scan_blocks: bool = False) -> nn.Model:
    return vit(image_size, 32, 768, 12, 12, 3072, num_classes,
               scan_blocks=scan_blocks)


def vit_l_16(num_classes: int = 1000, image_size: int = 224,
             scan_blocks: bool = False) -> nn.Model:
    """torchvision ``vit_l_16``: 24 layers, 16 heads, dim 1024, MLP 4096.
    At this depth ``scan_blocks=True`` (stacked per-block factors,
    lax.scan over depth) is the recommended configuration — compile cost
    stays O(1) in depth (nn/scan.py)."""
    return vit(image_size, 16, 1024, 24, 16, 4096, num_classes,
               scan_blocks=scan_blocks)


def vit_l_32(num_classes: int = 1000, image_size: int = 224,
             scan_blocks: bool = False) -> nn.Model:
    return vit(image_size, 32, 1024, 24, 16, 4096, num_classes,
               scan_blocks=scan_blocks)


def vit_h_14(num_classes: int = 1000, image_size: int = 224,
             scan_blocks: bool = False) -> nn.Model:
    """torchvision ``vit_h_14``: 32 layers, 16 heads, dim 1280, MLP 5120."""
    return vit(image_size, 14, 1280, 32, 16, 5120, num_classes,
               scan_blocks=scan_blocks)
