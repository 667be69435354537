"""A proper encoder transformer classifier (pre-LN, residual blocks,
learned positional embeddings) — demonstrates full-fidelity curvature over
attention and MLP projections at realistic depth. The reference's attention
support stops at Diagonal/BlockDiagonal (curvatures.py:125-129); here every
projection is a tracked layer for all five estimators.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from curvature_tpu import nn


class LayerNorm(nn.Module):
    def __init__(self, eps: float = 1e-5, name: Optional[str] = None):
        self.eps = eps
        self.name = name

    def __call__(self, ctx, x):
        feat = x.shape[-1]
        scale = ctx.param(self.name, "scale", (feat,),
                          lambda k, s: jnp.ones(s, jnp.float32))
        bias = ctx.param(self.name, "bias", (feat,),
                         lambda k, s: jnp.zeros(s, jnp.float32))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


class EncoderBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: int, name: str):
        self.name = name
        self.ln1 = LayerNorm(name=f"{name}.ln1")
        self.attn = nn.MultiheadAttention(dim, heads, name=f"{name}.attn")
        self.ln2 = LayerNorm(name=f"{name}.ln2")
        self.fc1 = nn.Dense(mlp_ratio * dim, name=f"{name}.mlp.fc1")
        self.fc2 = nn.Dense(dim, name=f"{name}.mlp.fc2")

    def __call__(self, ctx, x):
        x = x + self.attn(ctx, self.ln1(ctx, x))
        h = nn.ReLU()(ctx, self.fc1(ctx, self.ln2(ctx, x)))
        return x + self.fc2(ctx, h)


class Encoder(nn.Module):
    def __init__(self, vocab: int, dim: int, heads: int, depth: int,
                 max_len: int, num_classes: int, mlp_ratio: int = 4):
        self.name = None
        self.vocab = vocab
        self.dim = dim
        self.max_len = max_len
        self.blocks = [EncoderBlock(dim, heads, mlp_ratio, f"block{i}")
                       for i in range(depth)]
        self.ln_f = LayerNorm(name="ln_f")
        self.head = nn.Dense(num_classes, name="head")

    def __call__(self, ctx, tokens):
        # tokens: int32 [B, T]
        emb = ctx.param("embed", "table", (self.vocab, self.dim),
                        lambda k, s: 0.02 * jax.random.normal(k, s))
        pos = ctx.param("embed", "pos", (self.max_len, self.dim),
                        lambda k, s: 0.02 * jax.random.normal(k, s))
        t = tokens.shape[1]
        x = emb[tokens] + pos[None, :t, :]
        for b in self.blocks:
            x = b(ctx, x)
        x = self.ln_f(ctx, x)
        return self.head(ctx, jnp.mean(x, axis=1))


def transformer_encoder(vocab: int = 1000, dim: int = 128, heads: int = 4,
                        depth: int = 4, max_len: int = 128,
                        num_classes: int = 10) -> nn.Model:
    return nn.Model(Encoder(vocab, dim, heads, depth, max_len, num_classes))
