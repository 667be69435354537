"""Layer library: tracked layers (Dense, Conv, attention projections) and
supporting ops (BatchNorm, pooling, activations).

Tracked layers record their input and expose a probe on their pre-activation
output (see nn/core.py). Everything is NHWC / HWIO — the TPU-native layout —
while the curvature matrix view stays in the reference's [out, fan_in+1]
convention via nn.core.param_matrix.
"""
import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from curvature_tpu.nn.core import Context, LayerMeta, Module


def _torch_linear_init(fan_in: int):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Linear/Conv default."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
    return init


def _kaiming_init(fan_in: int):
    std = math.sqrt(2.0 / max(fan_in, 1))

    def init(key, shape):
        return std * jax.random.normal(key, shape, jnp.float32)
    return init


def normalize_padding(padding, kernel_size: Tuple[int, int]):
    """int / (int, int) / 'SAME' / 'VALID' / explicit pairs -> lax padding."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if isinstance(padding, (tuple, list)):
        if all(isinstance(p, int) for p in padding):
            return tuple((p, p) for p in padding)
        return tuple(tuple(p) for p in padding)
    raise ValueError(f"bad padding: {padding!r}")


class Dense(Module):
    """Tracked fully-connected layer; supports any leading batch/token dims."""

    def __init__(self, features: int, use_bias: bool = True,
                 name: Optional[str] = None, kernel_init=None):
        self.features = features
        self.use_bias = use_bias
        self.name = name
        self.kernel_init = kernel_init

    def __call__(self, ctx: Context, x):
        in_f = x.shape[-1]
        ctx.register_meta(LayerMeta(self.name, "dense", self.features, in_f,
                                    self.use_bias))
        ctx.record_act(self.name, x)
        init = self.kernel_init or _torch_linear_init(in_f)
        kernel = ctx.param(self.name, "kernel", (in_f, self.features), init)
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = ctx.param(self.name, "bias", (self.features,),
                             _torch_linear_init(in_f))
            y = y + bias
        return ctx.probe(self.name, y)


class Conv(Module):
    """Tracked 2D convolution, NHWC input, HWIO kernel.

    ``groups > 1`` gives a grouped convolution (``groups == in_channels`` is
    depthwise): output channel block j sees only input channel block j, so
    ``fan_in`` — the curvature matrix's column count — is
    ``(C/groups)*kh*kw``, matching torch's ``[O, C/groups, kh, kw]`` weight.
    """

    def __init__(self, features: int, kernel_size: Union[int, Tuple[int, int]],
                 strides: Union[int, Tuple[int, int]] = 1,
                 padding: Any = "VALID", use_bias: bool = True,
                 groups: int = 1,
                 name: Optional[str] = None, kernel_init=None):
        self.features = features
        self.kernel_size = ((kernel_size, kernel_size)
                            if isinstance(kernel_size, int) else tuple(kernel_size))
        self.strides = ((strides, strides)
                        if isinstance(strides, int) else tuple(strides))
        self.padding = normalize_padding(padding, self.kernel_size)
        self.use_bias = use_bias
        self.groups = int(groups)
        if self.groups < 1 or features % self.groups:
            raise ValueError(
                f"groups={groups} must divide out features {features}")
        self.name = name
        self.kernel_init = kernel_init

    def __call__(self, ctx: Context, x):
        c = x.shape[-1]
        kh, kw = self.kernel_size
        if c % self.groups:
            raise ValueError(
                f"{self.name}: groups={self.groups} must divide input "
                f"channels {c}")
        fan_in = (c // self.groups) * kh * kw
        ctx.register_meta(LayerMeta(self.name, "conv", self.features, fan_in,
                                    self.use_bias, self.kernel_size,
                                    self.strides, self.padding,
                                    groups=self.groups))
        ctx.record_act(self.name, x)
        init = self.kernel_init or _torch_linear_init(fan_in)
        kernel = ctx.param(self.name, "kernel",
                           (kh, kw, c // self.groups, self.features), init)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = ctx.param(self.name, "bias", (self.features,),
                             _torch_linear_init(fan_in))
            y = y + bias
        return ctx.probe(self.name, y)


class BatchNorm(Module):
    """Torch-semantics batch normalization (NHWC, feature axis last).

    Train mode normalizes with batch statistics and updates running stats
    with momentum 0.1 (unbiased variance in the running update, biased in the
    normalization), eval mode uses running stats — matching the reference's
    factor-in-train / eval-in-eval split (SURVEY.md section 7, hard part 5).
    """

    def __init__(self, momentum: float = 0.1, eps: float = 1e-5,
                 name: Optional[str] = None):
        self.momentum = momentum
        self.eps = eps
        self.name = name

    def __call__(self, ctx: Context, x):
        feat = x.shape[-1]
        scale = ctx.param(self.name, "scale", (feat,),
                          lambda k, s: jnp.ones(s, jnp.float32))
        bias = ctx.param(self.name, "bias", (feat,),
                         lambda k, s: jnp.zeros(s, jnp.float32))
        mean = ctx.stat(self.name, "mean", (feat,), 0.0)
        var = ctx.stat(self.name, "var", (feat,), 1.0)
        xf = x.astype(jnp.float32)    # BN math in f32 even under bf16 compute
        if ctx.train:
            axes = tuple(range(x.ndim - 1))
            batch_mean = jnp.mean(xf, axis=axes)
            batch_var = jnp.var(xf, axis=axes)
            n = x.size // feat
            unbiased = batch_var * (n / max(n - 1, 1))
            ctx.update_stat(self.name, "mean",
                            (1 - self.momentum) * mean + self.momentum * batch_mean)
            ctx.update_stat(self.name, "var",
                            (1 - self.momentum) * var + self.momentum * unbiased)
            use_mean, use_var = batch_mean, batch_var
        else:
            use_mean, use_var = mean, var
        inv = jax.lax.rsqrt(use_var + self.eps)
        out = (xf - use_mean) * inv * scale.astype(jnp.float32) \
            + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class MaxPool(Module):
    def __init__(self, window: Union[int, Tuple[int, int]] = 2,
                 strides: Optional[Union[int, Tuple[int, int]]] = None,
                 padding: Any = "VALID", ceil_mode: bool = False,
                 name: Optional[str] = None):
        self.window = (window, window) if isinstance(window, int) else tuple(window)
        strides = strides if strides is not None else self.window
        self.strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
        self.padding = padding if isinstance(padding, str) else \
            ((0, 0),) + normalize_padding(padding, self.window) + ((0, 0),)
        if ceil_mode and isinstance(self.padding, str):
            raise ValueError("ceil_mode needs explicit (int) padding")
        self.ceil_mode = ceil_mode
        self.name = name

    def __call__(self, ctx: Context, x):
        padding = self.padding
        if self.ceil_mode:
            # torch MaxPool2d(ceil_mode=True): output size rounds up, with
            # the constraint that the last window starts inside the input
            # plus left padding; realized here as extra -inf padding on the
            # high side (shape math is static under jit)
            padding = list(padding)
            for d in (1, 2):
                size = x.shape[d]
                w, s = self.window[d - 1], self.strides[d - 1]
                lo, hi = padding[d]
                out = -(-(size + lo + hi - w) // s) + 1
                if (out - 1) * s >= size + lo:
                    out -= 1
                padding[d] = (lo, max(hi, (out - 1) * s + w - size - lo))
            padding = tuple(padding)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1,) + self.window + (1,), (1,) + self.strides + (1,), padding)


class AvgPool(Module):
    def __init__(self, window: Union[int, Tuple[int, int]] = 2,
                 strides: Optional[Union[int, Tuple[int, int]]] = None,
                 padding: Any = "VALID", name: Optional[str] = None):
        self.window = (window, window) if isinstance(window, int) else tuple(window)
        strides = strides if strides is not None else self.window
        self.strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
        # int padding -> explicit spatial pairs; dividing by the full window
        # size below matches torch's count_include_pad=True default
        if isinstance(padding, int):
            padding = ((0, 0), (padding, padding), (padding, padding), (0, 0))
        self.padding = padding
        self.name = name

    def __call__(self, ctx: Context, x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1,) + self.window + (1,), (1,) + self.strides + (1,), self.padding)
        return s / (self.window[0] * self.window[1])


class GlobalAvgPool(Module):
    def __call__(self, ctx: Context, x):
        return jnp.mean(x, axis=(1, 2))


class AdaptiveAvgPool(Module):
    """torch nn.AdaptiveAvgPool2d: output bin i averages input rows
    [floor(i*H/out), ceil((i+1)*H/out)). Bin boundaries are static under
    jit (shapes are traced), so this unrolls into out_h*out_w means —
    identity when the input already matches the target (AlexNet/VGG at
    224px)."""

    def __init__(self, output_size: Union[int, Tuple[int, int]]):
        self.out = ((output_size, output_size)
                    if isinstance(output_size, int) else tuple(output_size))

    def __call__(self, ctx: Context, x):
        h, w = x.shape[1], x.shape[2]
        oh, ow = self.out
        if (h, w) == (oh, ow):
            return x
        rows = []
        for i in range(oh):
            h0, h1 = (i * h) // oh, -(-(i + 1) * h // oh)
            cols = []
            for j in range(ow):
                w0, w1 = (j * w) // ow, -(-(j + 1) * w // ow)
                cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
            rows.append(jnp.stack(cols, axis=1))
        return jnp.stack(rows, axis=1)


class ReLU(Module):
    def __call__(self, ctx: Context, x):
        return jax.nn.relu(x)


class ReLU6(Module):
    """min(max(x, 0), 6) — MobileNet's clipped activation."""

    def __call__(self, ctx: Context, x):
        return jnp.clip(x, 0.0, 6.0)


class SiLU(Module):
    """x * sigmoid(x) — torch nn.SiLU (EfficientNet's activation)."""

    def __call__(self, ctx: Context, x):
        return x * jax.nn.sigmoid(x)


class Hardsigmoid(Module):
    """relu6(x + 3) / 6 — torch nn.Hardsigmoid (MobileNetV3 SE gates)."""

    def __call__(self, ctx: Context, x):
        return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class Hardswish(Module):
    """x * relu6(x + 3) / 6 — torch nn.Hardswish (MobileNetV3)."""

    def __call__(self, ctx: Context, x):
        return x * (jnp.clip(x + 3.0, 0.0, 6.0) / 6.0)


class GELU(Module):
    """Exact (erf) GELU — torch nn.GELU's default, needed for checkpoint
    logit parity (jax.nn.gelu defaults to the tanh approximation)."""

    def __call__(self, ctx: Context, x):
        return jax.nn.gelu(x, approximate=False)


class Identity(Module):
    def __call__(self, ctx: Context, x):
        return x


class Flatten(Module):
    """Flatten NHWC to [B, C*H*W] in channel-major (CHW) order.

    Channel-major matches torch's NCHW flatten so converted pretrained
    weights and curvature factors line up index-for-index with the reference
    (reference model: curvature/lenet5.py:5-7).
    """

    def __call__(self, ctx: Context, x):
        if x.ndim == 4:
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(x.shape[0], -1)


class Sequential(Module):
    def __init__(self, layers: Sequence[Module], name: Optional[str] = None):
        self.layers = list(layers)
        self.name = name
        prefix = f"{name}/" if name else ""
        for i, layer in enumerate(self.layers):
            if getattr(layer, "name", None) is None:
                layer.name = f"{prefix}{i}_{type(layer).__name__.lower()}"
            elif name and not layer.name.startswith(prefix):
                layer.name = prefix + layer.name

    def __call__(self, ctx: Context, x):
        for layer in self.layers:
            x = layer(ctx, x)
        return x


class Add(Module):
    """Residual add of a main branch and a shortcut branch."""

    def __init__(self, main: Module, shortcut: Module, name: Optional[str] = None):
        self.main = main
        self.shortcut = shortcut
        self.name = name

    def __call__(self, ctx: Context, x):
        return self.main(ctx, x) + self.shortcut(ctx, x)


class MultiheadAttention(Module):
    """Self-attention with torch-style packed in_proj and out_proj.

    The two projections are ordinary tracked Dense layers named
    ``<name>/in_proj`` and ``<name>/out_proj`` — the analogue of the
    reference's 'attn_in'/'attn_out' pseudo-layers (curvatures.py:125-129,
    159-174). Because they are plain tracked layers, *all* estimators support
    them here (the reference raises NotImplementedError for KFAC/EFB/INF,
    curvatures.py:303-304).
    """

    def __init__(self, embed_dim: int, num_heads: int,
                 name: Optional[str] = None):
        if embed_dim % num_heads:
            raise ValueError("embed_dim must divide num_heads")
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.name = name
        self.in_proj = Dense(3 * embed_dim, name=None)
        self.out_proj = Dense(embed_dim, name=None)

    def __call__(self, ctx: Context, x):
        if self.in_proj.name is None:
            self.in_proj.name = f"{self.name}/in_proj"
            self.out_proj.name = f"{self.name}/out_proj"
        b, t, e = x.shape
        h = self.num_heads
        d = e // h
        qkv = self.in_proj(ctx, x)                       # [B, T, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)  # [B, H, T, d]
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, e)
        out = self.out_proj(ctx, o)
        if ctx.initializing:
            # stamp the head count onto the projection metas so estimators
            # can expose per-head factor structure (KFAC attention_head_split)
            from dataclasses import replace as _replace
            for nm in (self.in_proj.name, self.out_proj.name):
                if nm in ctx.metas:
                    ctx.metas[nm] = _replace(ctx.metas[nm], heads=h)
        return out


class MoE(Module):
    """Mixture-of-experts feed-forward layer with top-k routing
    (``top_k=1`` = Switch Transformer, ``top_k=2`` = GShard).

    With ``hidden`` set, each expert is a bias-free two-layer MLP
    ``act(x @ k1_e) @ k2_e`` (the Switch Transformer FFN); without it, a
    single bias-free linear map per expert. The router is a small untracked
    linear head (params under ``<name>.router``); every token goes to its
    ``top_k`` highest-probability experts, each scaled by its router
    probability (which stays in the graph, so router gradients flow). The
    reference has no MoE support of any kind.

    Curvature integration — per-expert Kronecker/diagonal factors with ZERO
    estimator changes: the experts register as ``stacked=num_experts`` metas
    (``moe=True``), the recorded activation is the mask-routed per-expert
    token stream ``[E, ..., F]`` (zeros for tokens routed elsewhere; the
    mask is re-applied after the expert activation, so any activation —
    including ones with ``act(0) != 0`` such as sigmoid — is safe), and
    the probes sit on the per-expert outputs ``[E, ..., O]``. Every
    estimator's stacked factor math then yields exactly the per-expert
    masked statistics, e.g. ``A_e = sum_{n routed to e} a_n a_n^T / N``
    (the Fisher block of expert e's weights: unrouted tokens contribute
    zero gradient). Experts are bias-free BY DESIGN — a bias column would
    need a per-expert masked ones-vector, which zero activations already
    encode for the weights but not for a bias row.

    TPU mapping: dense dispatch (einsums over the expert axis with a binary
    mask) — static shapes, MXU-batched, no dynamic gather/scatter; an
    ``expert`` mesh axis shards the expert params AND the per-expert factor
    state (expert parallelism — see ``Estimator.use_mesh``).
    """

    def __init__(self, features: int, num_experts: int,
                 hidden: Optional[int] = None, activation=None,
                 top_k: int = 1, name: Optional[str] = None):
        if num_experts < 1:
            raise ValueError("MoE needs num_experts >= 1")
        if not 1 <= top_k <= num_experts:
            raise ValueError(f"top_k={top_k} must lie in [1, {num_experts}]")
        self.features = features
        self.num_experts = num_experts
        self.hidden = hidden
        self.activation = activation or (
            lambda v: jax.nn.gelu(v, approximate=True))
        self.top_k = top_k
        self.name = name

    def __call__(self, ctx: Context, x):
        f = x.shape[-1]
        e = self.num_experts
        wr = ctx.param(f"{self.name}.router", "kernel", (f, e),
                       _torch_linear_init(f))
        p = jax.nn.softmax(jnp.dot(x, wr.astype(x.dtype)), axis=-1)
        if self.top_k == 1:
            mask = jax.nn.one_hot(jnp.argmax(p, axis=-1), e, dtype=x.dtype)
        else:
            # top-k routing: a token feeds k experts; per-expert factor
            # masking stays exact (its Fisher block sums over the tokens
            # that actually reached it, whatever k)
            _, idx = jax.lax.top_k(p, self.top_k)          # [..., k]
            mask = jnp.sum(jax.nn.one_hot(idx, e, dtype=x.dtype), axis=-2)
        gates = p * mask                                  # [..., E]
        xm = jnp.einsum("...e,...f->e...f", mask, x)      # [E, ..., F]
        if self.hidden is None:
            ctx.register_meta(LayerMeta(self.name, "dense", self.features,
                                        f, False, stacked=e, moe=True))
            ctx.record_act(self.name, xm)
            k = ctx.param(self.name, "kernel", (e, f, self.features),
                          _torch_linear_init(f))
            ye = jnp.einsum("e...f,efo->e...o", xm, k.astype(x.dtype))
            ye = ctx.probe(self.name, ye)
        else:
            fc1, fc2 = f"{self.name}.fc1", f"{self.name}.fc2"
            ctx.register_meta(LayerMeta(fc1, "dense", self.hidden, f,
                                        False, stacked=e, moe=True))
            ctx.register_meta(LayerMeta(fc2, "dense", self.features,
                                        self.hidden, False, stacked=e,
                                        moe=True))
            ctx.record_act(fc1, xm)
            k1 = ctx.param(fc1, "kernel", (e, f, self.hidden),
                           _torch_linear_init(f))
            h = jnp.einsum("e...f,efh->e...h", xm, k1.astype(x.dtype))
            h = ctx.probe(fc1, h)
            # re-apply the routing mask after the activation: act(0) != 0
            # (sigmoid, softplus, ...) would otherwise leak a constant row
            # from every unrouted token into fc2's recorded activations —
            # and through them into every expert's A factor
            h = self.activation(h) * jnp.moveaxis(mask, -1, 0)[..., None]
            ctx.record_act(fc2, h)
            k2 = ctx.param(fc2, "kernel", (e, self.hidden, self.features),
                           _torch_linear_init(self.hidden))
            ye = jnp.einsum("e...h,eho->e...o", h, k2.astype(x.dtype))
            ye = ctx.probe(fc2, ye)
        return jnp.einsum("e...o,...e->...o", ye, gates)
