"""GPT-2 causal language models (Hugging Face ``GPT2LMHeadModel`` layout).

The reference is vision-only and its attention support stops at
Diagonal/BlockDiagonal pseudo-layers (reference curvatures.py:125-129,
303-304); here a decoder-only LM is a first-class model family: every
projection — packed ``c_attn`` qkv, ``c_proj``, both MLP linears, the
``lm_head`` — is a tracked layer for all five estimators, the Fisher is the
per-token categorical Fisher (``loss='lm'``, estimators/capture.py), and the
block stack can run depth-scanned (``scan_blocks=True`` -> ``lax.scan``
over stacked [depth, ...] params/factors, nn/scan.py) so compile cost is
O(1) in depth — the TPU-native formulation for 48-layer gpt2_xl.

Naming follows the Hugging Face state dict (``wte``, ``wpe``,
``h.{i}.ln_1``, ``h.{i}.attn.c_attn``, ``h.{i}.attn.c_proj``,
``h.{i}.mlp.c_fc``, ``h.{i}.mlp.c_proj``, ``ln_f``, ``lm_head``) so
checkpoints convert mechanically via :func:`convert_gpt2_state_dict`.
HF's ``Conv1D`` stores weights as ``[in, out]`` — our ``Dense`` kernel
layout — so the conversion is copy-through (only the torch-Linear-layout
``lm_head.weight`` transposes). HF ties ``lm_head`` to ``wte``; conversion
unties them (copies ``wte^T`` into the tracked head) so last-layer Laplace
has a real weight matrix to put a posterior on.
"""
import math
from dataclasses import replace as _meta_replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from curvature_tpu import nn
from curvature_tpu.models.transformer2 import LayerNorm


def _gelu_new(x):
    """HF's ``gelu_new`` == the tanh approximation."""
    return jax.nn.gelu(x, approximate=True)


class CausalSelfAttention(nn.Module):
    """Masked multi-head self-attention with HF-packed ``c_attn``/``c_proj``.

    Both projections are ordinary tracked Dense layers, so every estimator
    covers them (optionally with per-qkv / per-head factor structure via
    KFAC's ``attention_qkv_split`` / ``attention_head_split``).
    """

    def __init__(self, dim: int, heads: int, name: str):
        if dim % heads:
            raise ValueError("dim must be divisible by heads")
        self.name = name
        self.heads = heads
        self.c_attn = nn.Dense(3 * dim, name=f"{name}.c_attn")
        self.c_proj = nn.Dense(dim, name=f"{name}.c_proj")

    def __call__(self, ctx, x):
        b, t, e = x.shape
        h = self.heads
        d = e // h
        qkv = self.c_attn(ctx, x)                        # [B, T, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)  # [B, H, T, d]
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        causal = jnp.tril(jnp.ones((t, t), bool))        # query >= key
        attn = jnp.where(causal, attn, jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, e)
        out = self.c_proj(ctx, o)
        if ctx.initializing:
            # stamp head count so estimators can expose per-head structure
            for nm in (self.c_attn.name, self.c_proj.name):
                if nm in ctx.metas:
                    ctx.metas[nm] = _meta_replace(ctx.metas[nm], heads=h)
        return out


class GPT2Block(nn.Module):
    """Pre-LN decoder block: x += attn(ln_1(x)); x += mlp(ln_2(x))."""

    def __init__(self, dim: int, heads: int, name: str):
        self.name = name
        self.ln_1 = LayerNorm(eps=1e-5, name=f"{name}.ln_1")
        self.attn = CausalSelfAttention(dim, heads, name=f"{name}.attn")
        self.ln_2 = LayerNorm(eps=1e-5, name=f"{name}.ln_2")
        self.c_fc = nn.Dense(4 * dim, name=f"{name}.mlp.c_fc")
        self.c_proj = nn.Dense(dim, name=f"{name}.mlp.c_proj")

    def __call__(self, ctx, x):
        x = x + self.attn(ctx, self.ln_1(ctx, x))
        h = _gelu_new(self.c_fc(ctx, self.ln_2(ctx, x)))
        return x + self.c_proj(ctx, h)


class GPT2MoEBlock(nn.Module):
    """Pre-LN decoder block with a Switch-style MoE FFN: the dense
    ``c_fc``/``c_proj`` MLP is replaced by ``nn.MoE`` (top-1-routed
    bias-free two-layer experts). Per-expert curvature factors come for
    free from the MoE layer's stacked capture; the reference has no MoE
    (or any transformer) support."""

    def __init__(self, dim: int, heads: int, experts: int, name: str):
        self.name = name
        self.ln_1 = LayerNorm(eps=1e-5, name=f"{name}.ln_1")
        self.attn = CausalSelfAttention(dim, heads, name=f"{name}.attn")
        self.ln_2 = LayerNorm(eps=1e-5, name=f"{name}.ln_2")
        self.moe = nn.MoE(dim, experts, hidden=4 * dim,
                          activation=_gelu_new, name=f"{name}.moe")

    def __call__(self, ctx, x):
        x = x + self.attn(ctx, self.ln_1(ctx, x))
        return x + self.moe(ctx, self.ln_2(ctx, x))


class GPT2(nn.Module):
    def __init__(self, vocab: int, dim: int, depth: int, heads: int,
                 max_len: int, scan_blocks: bool = False, make_block=None):
        self.name = None
        self.vocab = vocab
        self.dim = dim
        self.max_len = max_len
        make_block = make_block or (
            lambda name: GPT2Block(dim, heads, name))
        if scan_blocks:
            self.blocks = nn.ScanBlocks(
                make_block, depth, "h",
                per_depth_names=[f"h.{i}" for i in range(depth)])
        else:
            self.blocks = [make_block(f"h.{i}") for i in range(depth)]
        self.ln_f = LayerNorm(eps=1e-5, name="ln_f")
        self.lm_head = nn.Dense(vocab, use_bias=False, name="lm_head")

    def __call__(self, ctx, tokens):
        # tokens: int32 [B, T] -> logits [B, T, V]
        t = tokens.shape[1]
        wte = ctx.param("wte", "weight", (self.vocab, self.dim),
                        lambda k, s: 0.02 * jax.random.normal(k, s))
        wpe = ctx.param("wpe", "weight", (self.max_len, self.dim),
                        lambda k, s: 0.01 * jax.random.normal(k, s))
        x = wte[tokens] + wpe[None, :t, :]
        if isinstance(self.blocks, nn.ScanBlocks):
            x = self.blocks(ctx, x)
        else:
            for blk in self.blocks:
                x = blk(ctx, x)
        x = self.ln_f(ctx, x)
        return self.lm_head(ctx, x)


def gpt2_custom(vocab: int, dim: int, depth: int, heads: int,
                max_len: int = 1024, scan_blocks: bool = False) -> nn.Model:
    return nn.Model(GPT2(vocab, dim, depth, heads, max_len,
                         scan_blocks=scan_blocks))


def gpt2_moe_custom(vocab: int, dim: int, depth: int, heads: int,
                    experts: int = 8, max_len: int = 1024) -> nn.Model:
    """GPT-2 trunk whose every block uses the Switch-style MoE FFN
    (the same GPT2 module with a GPT2MoEBlock factory)."""
    return nn.Model(GPT2(
        vocab, dim, depth, heads, max_len,
        make_block=lambda name: GPT2MoEBlock(dim, heads, experts, name)))


def gpt2_moe_tiny(num_classes: int = 256, experts: int = 4,
                  max_len: int = 128) -> nn.Model:
    """2-layer Switch-style MoE test model (per-expert curvature factors)."""
    return gpt2_moe_custom(num_classes, 64, 2, 2, experts, max_len)


def gpt2_tiny(num_classes: int = 256, scan_blocks: bool = False,
              max_len: int = 128) -> nn.Model:
    """2-layer test/smoke model (byte-level vocab by default)."""
    return gpt2_custom(num_classes, 64, 2, 2, max_len, scan_blocks)


def gpt2(num_classes: int = 50257, scan_blocks: bool = False,
         max_len: int = 1024) -> nn.Model:
    """GPT-2 124M: 12 layers, 12 heads, dim 768 (``num_classes`` = vocab)."""
    return gpt2_custom(num_classes, 768, 12, 12, max_len, scan_blocks)


def gpt2_medium(num_classes: int = 50257, scan_blocks: bool = False,
                max_len: int = 1024) -> nn.Model:
    return gpt2_custom(num_classes, 1024, 24, 16, max_len, scan_blocks)


def gpt2_large(num_classes: int = 50257, scan_blocks: bool = False,
               max_len: int = 1024) -> nn.Model:
    return gpt2_custom(num_classes, 1280, 36, 20, max_len, scan_blocks)


def gpt2_xl(num_classes: int = 50257, scan_blocks: bool = False,
            max_len: int = 1024) -> nn.Model:
    """GPT-2 1.5B: 48 layers — use ``scan_blocks=True`` (O(1)-depth compile)."""
    return gpt2_custom(num_classes, 1600, 48, 25, max_len, scan_blocks)


def convert_gpt2_state_dict(state_dict: Dict,
                            dtype=np.float32) -> Dict:
    """HF ``GPT2LMHeadModel``/``GPT2Model`` state dict -> our variables.

    * the ``transformer.`` prefix is stripped;
    * ``Conv1D`` weights are already ``[in, out]`` — copied straight into the
      Dense ``kernel``;
    * LayerNorm ``weight``/``bias`` -> ``scale``/``bias``;
    * the causal-mask buffers (``h.{i}.attn.bias`` / ``.masked_bias``) are
      dropped (the mask is structural here);
    * ``lm_head.weight`` (torch-Linear ``[V, E]``) transposes; when absent
      (HF stores only the tied ``wte``) the head is untied from ``wte^T``.
    """
    def _np(v):
        try:
            v = v.detach().cpu().numpy()
        except AttributeError:
            v = np.asarray(v)
        return v.astype(dtype)

    params: Dict[str, Dict[str, np.ndarray]] = {}

    def put(layer, key, val):
        params.setdefault(layer, {})[key] = val

    head: Optional[np.ndarray] = None
    for name, tensor in state_dict.items():
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        parts = name.split(".")
        if parts[-2:] in (["attn", "bias"], ["attn", "masked_bias"]):
            continue                      # causal-mask buffers
        if name == "lm_head.weight":
            head = _np(tensor).T
            continue
        if name in ("wte.weight", "wpe.weight"):
            put(parts[0], "weight", _np(tensor))
            continue
        layer, pname = ".".join(parts[:-1]), parts[-1]
        arr = _np(tensor)
        if parts[-2] in ("ln_1", "ln_2", "ln_f"):
            put(layer, "scale" if pname == "weight" else "bias", arr)
        elif pname == "weight":           # Conv1D [in, out] == our kernel
            put(layer, "kernel", arr)
        elif pname == "bias":
            put(layer, "bias", arr)
        else:
            raise ValueError(f"unrecognized GPT-2 tensor {name!r}")
    if head is None:
        head = params["wte"]["weight"].T.copy()   # untie
    put("lm_head", "kernel", head)
    return {"params": params, "batch_stats": {}}
