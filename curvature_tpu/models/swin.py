"""Swin Transformer (T/S/B) in NHWC with torchvision state-dict naming.

The hierarchical windowed-attention transformer from the torchvision zoo
(reference factors.py:80-84 loads it by name; the reference's estimators
could not track ANY of its attention parameters — KFAC/EFB/INF raise
NotImplementedError even for standard nn.MultiheadAttention,
curvatures.py:303-304). Here the window attention's ``qkv`` and ``proj``
are plain tracked Dense layers ([B*windows*49, C] token activations), so
the full estimator chain covers every Swin parameter except the
relative-position bias table (a raw parameter, like ViT's pos_embedding).

All window bookkeeping (padding, cyclic shift, partition, attention mask)
is static shape math under jit — masks are numpy constants per (H, W)
trace, there is no data-dependent control flow. Layer names follow
torchvision paths (``features.1.0.attn.qkv``, ``features.2.reduction``,
``norm``, ``head``); the ``relative_position_index`` buffer converts as a
raw tensor and is consumed directly, so checkpoints convert 1:1.
"""
import numpy as np

import jax
import jax.numpy as jnp

from curvature_tpu import nn
from curvature_tpu.models.transformer2 import LayerNorm


def _relative_position_index(ws: int) -> np.ndarray:
    """torchvision swin_transformer define_relative_position_index."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))            # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).reshape(-1)                           # [N*N]


def _attention_mask(ph: int, pw: int, ws: int, s0: int, s1: int):
    """Region mask separating windows that straddle the cyclic shift
    (torchvision shifted_window_attention; exact slice replication
    including the negative-bound semantics)."""
    m = np.zeros((ph, pw), np.float32)
    cnt = 0.0
    for h0, h1 in ((0, -ws), (-ws, -s0 if s0 else None),
                   (-s0 if s0 else None, None)):
        for w0, w1 in ((0, -ws), (-ws, -s1 if s1 else None),
                       (-s1 if s1 else None, None)):
            m[h0:h1, w0:w1] = cnt
            cnt += 1.0
    m = m.reshape(ph // ws, ws, pw // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)         # [nw, N]
    am = m[:, None, :] - m[:, :, None]
    return np.where(am != 0, -100.0, 0.0).astype(np.float32)


def _relative_coords_table(ws: int) -> np.ndarray:
    """torchvision ShiftedWindowAttentionV2's log-spaced CPB input grid."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    t = np.stack(np.meshgrid(r, r, indexing="ij"))
    t = t.transpose(1, 2, 0)[None]                  # [1, 2w-1, 2w-1, 2]
    t = t / (ws - 1) * 8.0
    return np.sign(t) * np.log2(np.abs(t) + 1.0) / 3.0


class ShiftedWindowAttention(nn.Module):
    """torchvision ShiftedWindowAttention (+V2): pad -> cyclic shift ->
    window partition -> MHA with relative-position bias (+ shift mask)
    -> merge -> unshift -> unpad. qkv/proj are tracked Dense layers.

    ``v2`` switches to SwinV2 semantics: cosine attention scaled by a
    clamped learnable ``logit_scale``, continuous position bias from the
    ``cpb_mlp`` (two more tracked Dense layers) instead of a raw bias
    table, and the key bias zeroed at apply time."""

    def __init__(self, dim: int, heads: int, window: int, shift: int,
                 name: str, v2: bool = False):
        self.name = name
        self.dim = dim
        self.heads = heads
        self.window = window
        self.shift = shift
        self.v2 = v2
        self.qkv = nn.Dense(3 * dim, name=f"{name}.qkv")
        self.proj = nn.Dense(dim, name=f"{name}.proj")
        if v2:
            self.cpb_fc1 = nn.Dense(512, name=f"{name}.cpb_mlp.0")
            self.cpb_fc2 = nn.Dense(heads, use_bias=False,
                                    name=f"{name}.cpb_mlp.2")

    def _bias(self, ctx, n: int):
        """Relative-position bias [heads, N, N]."""
        ws, heads = self.window, self.heads
        index = ctx.param(
            f"{self.name}.relative_position_index", "value", (n * n,),
            lambda key, s: jnp.asarray(_relative_position_index(ws)))
        if self.v2:
            coords = ctx.param(
                f"{self.name}.relative_coords_table", "value",
                (1, 2 * ws - 1, 2 * ws - 1, 2),
                lambda key, s: jnp.asarray(_relative_coords_table(ws)))
            table = self.cpb_fc2(
                ctx, nn.ReLU()(ctx, self.cpb_fc1(ctx, coords)))
            table = table.reshape(-1, heads)
            bias = table[index.astype(jnp.int32)]
            bias = bias.reshape(n, n, heads).transpose(2, 0, 1)
            return 16.0 * jax.nn.sigmoid(bias)
        table = ctx.param(
            f"{self.name}.relative_position_bias_table", "value",
            ((2 * ws - 1) ** 2, heads),
            lambda key, s: 0.02 * jax.random.truncated_normal(
                key, -2.0, 2.0, s))
        bias = table[index.astype(jnp.int32)]
        return bias.reshape(n, n, heads).transpose(2, 0, 1)

    def __call__(self, ctx, x):
        b, h, w, c = x.shape
        ws, heads = self.window, self.heads
        hd = c // heads
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        ph, pw = h + pad_b, w + pad_r
        s0 = 0 if ws >= ph else self.shift
        s1 = 0 if ws >= pw else self.shift
        if s0 or s1:
            x = jnp.roll(x, (-s0, -s1), (1, 2))
        nh, nw = ph // ws, pw // ws
        n = ws * ws
        xw = x.reshape(b, nh, ws, nw, ws, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, n, c)

        qkv = self.qkv(ctx, xw)
        qkv = qkv.reshape(-1, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.v2:
            # the key bias is zeroed at apply time (torchvision V2
            # forward clones qkv_bias and zeroes the middle third); the
            # tracked Dense applied it, so subtract it from the k chunk
            k_bias = ctx.param(f"{self.name}.qkv", "bias", (3 * c,),
                               lambda key, s: jnp.zeros(s, jnp.float32))
            k = k - k_bias[c:2 * c].reshape(heads, 1, hd).astype(k.dtype)
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            kn = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
            attn = qn @ jnp.swapaxes(kn, -2, -1)
            logit_scale = ctx.param(
                f"{self.name}.logit_scale", "value", (heads, 1, 1),
                lambda key, s: jnp.full(s, np.log(10.0), jnp.float32))
            scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
            attn = attn * scale.astype(attn.dtype)
        else:
            attn = (q @ jnp.swapaxes(k, -2, -1)) * (hd ** -0.5)
        attn = attn + self._bias(ctx, n)[None].astype(attn.dtype)

        if s0 or s1:
            mask = jnp.asarray(_attention_mask(ph, pw, ws, s0, s1))
            attn = attn.reshape(b, nh * nw, heads, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)

        y = jnp.swapaxes(attn @ v, 1, 2).reshape(-1, n, c)
        y = self.proj(ctx, y)
        y = y.reshape(b, nh, nw, ws, ws, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
        if s0 or s1:
            y = jnp.roll(y, (s0, s1), (1, 2))
        return y[:, :h, :w]


class SwinBlock(nn.Module):
    """v1: pre-norm residual blocks; v2: res-post-norm (the norm is
    applied to the attn/MLP OUTPUT before the residual add,
    torchvision SwinTransformerBlockV2)."""

    def __init__(self, dim: int, heads: int, window: int, shift: int,
                 name: str, v2: bool = False):
        self.v2 = v2
        self.norm1 = LayerNorm(eps=1e-5, name=f"{name}.norm1")
        self.attn = ShiftedWindowAttention(dim, heads, window, shift,
                                           f"{name}.attn", v2=v2)
        self.norm2 = LayerNorm(eps=1e-5, name=f"{name}.norm2")
        self.fc1 = nn.Dense(4 * dim, name=f"{name}.mlp.0")
        self.fc2 = nn.Dense(dim, name=f"{name}.mlp.3")

    def __call__(self, ctx, x):
        if self.v2:
            x = x + self.norm1(ctx, self.attn(ctx, x))
            y = self.fc2(ctx, nn.GELU()(ctx, self.fc1(ctx, x)))
            return x + self.norm2(ctx, y)
        x = x + self.attn(ctx, self.norm1(ctx, x))
        y = nn.GELU()(ctx, self.fc1(ctx, self.norm2(ctx, x)))
        return x + self.fc2(ctx, y)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat (4C) -> LayerNorm -> Linear(2C, bias-free);
    torchvision PatchMerging including the odd-size padding. The v2
    variant reduces FIRST and norms the 2C output (PatchMergingV2)."""

    def __init__(self, dim: int, name: str, v2: bool = False):
        self.v2 = v2
        self.norm = LayerNorm(eps=1e-5, name=f"{name}.norm")
        self.reduction = nn.Dense(2 * dim, use_bias=False,
                                  name=f"{name}.reduction")

    def __call__(self, ctx, x):
        h, w = x.shape[1], x.shape[2]
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        if self.v2:
            return self.norm(ctx, self.reduction(ctx, x))
        return self.reduction(ctx, self.norm(ctx, x))


#: arch -> (embed dim, per-stage depths, per-stage heads, window, v2)
_CONFIGS = {
    "swin_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7, False),
    "swin_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7, False),
    "swin_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7, False),
    "swin_v2_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 8, True),
    "swin_v2_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 8, True),
    "swin_v2_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 8, True),
}


class SwinTransformer(nn.Module):
    def __init__(self, embed: int, depths, heads, window: int,
                 num_classes: int, v2: bool = False):
        self.name = None
        self.patch_conv = nn.Conv(embed, 4, strides=4, name="features.0.0")
        self.patch_norm = LayerNorm(eps=1e-5, name="features.0.2")
        self.stages = []
        dim = embed
        fi = 1
        for s, (d, nh) in enumerate(zip(depths, heads)):
            blocks = [SwinBlock(dim, nh, window,
                                0 if j % 2 == 0 else window // 2,
                                f"features.{fi}.{j}", v2=v2)
                      for j in range(d)]
            merge = None
            if s + 1 < len(depths):
                merge = PatchMerging(dim, f"features.{fi + 1}", v2=v2)
                dim *= 2
            self.stages.append((blocks, merge))
            fi += 2
        self.norm = LayerNorm(eps=1e-5, name="norm")
        self.head = nn.Dense(num_classes, name="head")

    def __call__(self, ctx, x):
        x = self.patch_norm(ctx, self.patch_conv(ctx, x))
        for blocks, merge in self.stages:
            for block in blocks:
                x = block(ctx, x)
            if merge is not None:
                x = merge(ctx, x)
        x = self.norm(ctx, x)
        x = jnp.mean(x, axis=(1, 2))
        return self.head(ctx, x)


def swin(arch: str, num_classes: int = 1000) -> nn.Model:
    embed, depths, heads, window, v2 = _CONFIGS[arch]
    return nn.Model(SwinTransformer(embed, depths, heads, window,
                                    num_classes, v2=v2))


def swin_t(num_classes: int = 1000) -> nn.Model:
    return swin("swin_t", num_classes)
