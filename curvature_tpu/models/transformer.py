"""Tiny encoder transformer used to exercise attention-projection curvature.

The reference supports MultiheadAttention only in Diagonal/BlockDiagonal
(curvatures.py:125-129, 159-174); here the attention projections are tracked
Dense layers, so every estimator works on them.
"""
from curvature_tpu import nn

import jax.numpy as jnp


class MeanPoolHead(nn.Module):
    def __call__(self, ctx, x):
        return jnp.mean(x, axis=1)


def tiny_transformer(vocab_free_dim: int = 16, num_heads: int = 2,
                     num_layers: int = 2, num_classes: int = 10) -> nn.Model:
    """Takes pre-embedded inputs [B, T, D]; classification over mean-pooled tokens."""
    layers = []
    for i in range(num_layers):
        layers.append(nn.MultiheadAttention(vocab_free_dim, num_heads,
                                            name=f"block{i}.attn"))
        layers.append(nn.Dense(4 * vocab_free_dim, name=f"block{i}.mlp_in"))
        layers.append(nn.ReLU())
        layers.append(nn.Dense(vocab_free_dim, name=f"block{i}.mlp_out"))
    layers.append(MeanPoolHead())
    layers.append(nn.Dense(num_classes, name="head"))
    return nn.Model(nn.Sequential(layers))
