"""Kronecker-factored approximate curvature (KFAC).

Behavioral parity with the reference's ``KFAC`` (curvatures.py:264-392):

  update (per batch, per MC label sample s):
    A += (a_1^T a_1) / N          a_1: [N, fan_in+1] activations (+ones col),
                                  conv inputs expanded into patches; N is the
                                  token count (B, or B*H'*W' for conv)
    G += (g_s^T g_s) / N          g_s: [N, out] pre-activation output grads of
                                  the mean loss, scaled by batch size B
                                  (the hook's ``grad_output * B``,
                                  curvatures.py:309-310)
  (A accumulates once per MC sample like the reference's per-update add.)

  invert: split damping — chol(inv(sqrt(mult)*F + sqrt(add)*I)) per factor
          (curvatures.py:368-379).
  sample: matrix-normal A_chol @ Z @ G_chol^T, transposed to [out, fan_in+1].

TPU notes: both factor products are single large matmuls (MXU); the conv
patch expansion lowers to an XLA convolution. No per-layer Python in the hot
path beyond the unrolled trace.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import (
    Estimator, act_tokens, grad_tokens, grouped_act_tokens)
from curvature_tpu.estimators.capture import Captured
from curvature_tpu.ops.linalg import chol_logdet, damped_inverse_cholesky


def _split_damped_logdet(factor: jax.Array, add, multiply) -> jax.Array:
    """logdet of the split-damped factor sqrt(s)*F + sqrt(n)*I (the exact
    matrix whose chol-inverse the sampler uses); batched over leading dims."""
    s = jnp.sqrt(jnp.asarray(multiply, factor.dtype))
    n = jnp.sqrt(jnp.asarray(add, factor.dtype))
    eye = jnp.eye(factor.shape[-1], dtype=factor.dtype)
    return chol_logdet(s * factor + n * eye)


def _gram_aligned(a: jax.Array, dtype) -> jax.Array:
    """``a^T a`` with the column count zero-padded to a multiple of 128.

    The +1 bias column leaves every A-factor GEMM 128-misaligned
    (F = C*kh*kw + 1), which costs 30-70% extra MXU time on the [F, F]
    output (benchmarks/bias_row_ab.py: 1.3-1.7x f32, up to 2.0x bf16 on
    ResNet-50's layer3/layer4 and 1x1 shapes). Zero-padded columns
    contribute exactly-zero rows/columns, sliced off after the product —
    bit-identical to the direct einsum. Only applied above one MXU tile
    (f > 128): below that XLA's internal padding is already the same.
    """
    f = a.shape[-1]
    pad = -f % 128
    if f <= 128 or pad == 0:
        return jnp.einsum("ni,nj->ij", a, a, preferred_element_type=dtype)
    a = jnp.pad(a, ((0, 0), (0, pad)))
    g = jnp.einsum("ni,nj->ij", a, a, preferred_element_type=dtype)
    return g[:f, :f]


def _gram_aligned_batched(a: jax.Array, dtype) -> jax.Array:
    """Batched :func:`_gram_aligned`: ``a[l]^T a[l]`` over a stacked
    leading layer axis, same 128-lane zero-padding trick."""
    f = a.shape[-1]
    pad = -f % 128
    if f <= 128 or pad == 0:
        return jnp.einsum("lni,lnj->lij", a, a, preferred_element_type=dtype)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
    g = jnp.einsum("lni,lnj->lij", a, a, preferred_element_type=dtype)
    return g[:, :f, :f]


def _conv_token_count(meta, act) -> int:
    """B * H_out * W_out for a conv layer's explicit padding."""
    b, h, w, _ = act.shape
    kh, kw = meta.kernel_size
    sh, sw = meta.strides
    (pt, pb), (pl, pr) = meta.padding
    h_out = (h + pt + pb - kh) // sh + 1
    w_out = (w + pl + pr - kw) // sw + 1
    return b * h_out * w_out


class KFAC(Estimator):

    need_param_grads = False

    def __init__(self, *args, use_pallas: str = "auto",
                 token_subsample: float = 1.0,
                 subsample_offset=(0, 0),
                 attention_qkv_split: bool = False,
                 attention_head_split: bool = False,
                 fused_g: bool = False,
                 g_block_size: int = 1024,
                 stack_grams: bool = False,
                 corr_gram: bool = True,
                 corr_gram_grouped: bool = False,
                 corr_gram_min_channels: int = 128,
                 corr_gram_min_extent: int = 14, **kwargs):
        """token_subsample < 1 estimates the conv factors from a strided
        subset of spatial positions (an unbiased Monte-Carlo estimate of
        the same positional expectation) — the factor Grams dominate the
        update cost for 3x3 convs (F^2*N vs the conv's 2*C*Cout*9*N FLOPs),
        so 0.25 cuts over half the step. Default 1.0 matches the reference
        exactly. ``subsample_offset`` shifts the strided grid; the k^2
        offset grids partition the positions, so the count-weighted average
        of factors over all offsets equals the full factor exactly (the
        unbiasedness contract, tested).

        ``attention_qkv_split=True`` factors the packed in_proj's G per
        q/k/v chunk (block-diagonal across the three projections, the
        standard transformer-KFAC refinement) instead of one [3E, 3E]
        factor; the A factor is shared (identical inputs). KFAC-only:
        EFB/INF consume square G factors.

        ``attention_head_split=True`` goes one level finer (supersedes
        qkv_split on in_proj): the in_proj G is block-diagonal per q/k/v
        chunk AND per head ([3, H, E/H, E/H] blocks — the head axis is
        independent in the attention math, so cross-head G covariance is
        the first thing to drop), and the out_proj A is block-diagonal per
        head ([H, E/H, E/H] input blocks + a scalar bias block — out_proj's
        *input* is the concat of per-head outputs). The reference raises
        NotImplementedError for any attention factor (curvatures.py:303-304).
        KFAC-only, like qkv_split.

        ``g_block_size``: dense layers whose ``out_features`` exceeds
        ``max_factor_dim`` (default 16384) get a BLOCK-DIAGONAL G factor —
        ``ceil(out / g_block_size)`` independent ``[bs, bs]`` blocks over
        output-feature chunks, all sharing the layer's A factor (the same
        blocks-share-A structure as ``attention_qkv_split``). This is what
        makes last-layer Laplace on a real 50,257-vocab ``gpt2`` lm_head
        tractable: the dense G would be 10 GB; 50 blocked [1024, 1024]
        factors are 0.2 GB and the blocked Grams cost O(N * out * bs)
        instead of O(N * out^2). Cross-block G covariance (curvature
        between far-apart vocabulary logits' rows) is dropped — the same
        kind of structured sparsification KFAC itself applies across
        layers. Exact parity with the dense G's diagonal blocks is tested
        at reduced vocab. Set ``g_block_size=0`` to restore the hard error
        for oversized layers. KFAC-only (EFB/INF consume square G factors).
        """
        # set BEFORE super().__init__ — the base constructor calls
        # init_state(), which dispatches on the flags
        self.attention_qkv_split = bool(attention_qkv_split)
        self.attention_head_split = bool(attention_head_split)
        self.max_factor_dim = int(kwargs.pop("max_factor_dim", 16384))
        self.g_block_size = int(g_block_size)
        super().__init__(*args, **kwargs)
        # loud guard before any allocation: a vocab-sized LM head would
        # silently build a [50257, 50257] G factor (10 GB) and OOM deep in
        # the first update — dense layers fall back to the blocked-G
        # layout; anything else names the layer and the escape hatches
        for name, meta in self.metas.items():
            if self._is_gblock(name, meta):
                if meta.fan_in + 1 > self.max_factor_dim:
                    raise ValueError(
                        f"{name}: A-factor dimension {meta.fan_in + 1} "
                        f"exceeds max_factor_dim={self.max_factor_dim}; "
                        "blocked-G only bounds the G side. Exclude the "
                        "layer with layer_filter or use Diagonal for it.")
                continue
            worst = max(meta.out_features, meta.fan_in + 1)
            if worst > self.max_factor_dim:
                raise ValueError(
                    f"{name}: KFAC factor dimension {worst} exceeds "
                    f"max_factor_dim={self.max_factor_dim} "
                    f"({worst}^2 f32 = {worst * worst * 4 / 2 ** 30:.1f} GB "
                    "per factor). Exclude the layer with layer_filter "
                    "(CLI --layers, e.g. 'h.*' to skip a vocab-sized "
                    "lm_head), use Diagonal for it, raise max_factor_dim, "
                    "or (dense layers) enable g_block_size.")
        if use_pallas == "auto":
            import jax as _jax
            self.use_pallas = _jax.devices()[0].platform != "cpu"
        else:
            self.use_pallas = bool(use_pallas)
        if not (0.0 < token_subsample <= 1.0):
            raise ValueError("token_subsample must be in (0, 1]")
        self.token_subsample = float(token_subsample)
        self.subsample_offset = (int(subsample_offset[0]),
                                 int(subsample_offset[1]))
        # fused_g=True: plain layers' G Grams accumulate inside the
        # backward pass (nn.core.gram_tap) instead of materializing every
        # probe gradient as a vjp output — identical math (parity-tested),
        # different XLA schedule; benchmarks/fused_gbwd_ab.py carries the
        # measured verdict per model/dtype.
        self.fused_g = bool(fused_g)
        # stack_grams=True: same-shape token matrices across LAYERS stack
        # into one batched Gram einsum (ResNet-50 has e.g. six identical
        # [3136, 257] 1x1-conv A-Grams) — identical math, fewer/larger
        # MXU programs; benchmarks/stacked_gram_ab.py carries the verdict
        self.stack_grams = bool(stack_grams)
        # corr_gram=True: stride-1 conv A factors via windowed channel
        # correlations (ops/corr_gram.py — 13/81 of the 3x3 Gram FLOPs,
        # exact); gated to the shapes where the on-chip step A/B wins
        # (thresholds below — benchmarks/corr_gram_ab.py + NOTES)
        self.corr_gram = bool(corr_gram)
        # grouped variant: within-group correlations ([g, Fg+1, Fg+1]) —
        # exact and parity-tested, default off pending an on-chip step A/B
        self.corr_gram_grouped = bool(corr_gram_grouped)
        self.corr_gram_min_channels = int(corr_gram_min_channels)
        self.corr_gram_min_extent = int(corr_gram_min_extent)
        # an offset outside [0, k) silently biases the factor estimate (it
        # no longer indexes one of the k^2 partition grids) and an offset
        # past the token grid yields ZERO tokens -> 0/0 NaN factors
        k = self._spatial_stride()
        if not all(0 <= o < k for o in self.subsample_offset):
            raise ValueError(
                f"subsample_offset {self.subsample_offset} must lie in "
                f"[0, {k}) per dim for token_subsample={self.token_subsample} "
                f"(spatial stride {k})")

    def _is_qkv_split(self, name: str, meta) -> bool:
        return (self.attention_qkv_split and name.endswith("/in_proj")
                and meta.out_features % 3 == 0
                and not self._is_head_split_in(name, meta))

    def _is_head_split_in(self, name: str, meta) -> bool:
        return (self.attention_head_split and name.endswith("/in_proj")
                and meta.heads > 0 and meta.out_features % 3 == 0
                and (meta.out_features // 3) % meta.heads == 0)

    def _is_head_split_out(self, name: str, meta) -> bool:
        return (self.attention_head_split and name.endswith("/out_proj")
                and meta.heads > 0 and meta.fan_in % meta.heads == 0)

    def _is_gblock(self, name: str, meta) -> bool:
        """Block-diagonal G for oversized dense layers (vocab-scale LM
        heads): out_features > max_factor_dim, blocks of g_block_size over
        the output-feature dim, shared A. Stacked (ScanBlocks) layers keep
        the hard error — a vocab head never sits inside a depth scan."""
        return (self.g_block_size > 0 and meta.kind == "dense"
                and not meta.stacked
                and meta.out_features > self.max_factor_dim)

    def _gblock_dims(self, meta):
        """(num_blocks, block_size, padded_out) for a blocked-G layer."""
        bs = min(self.g_block_size, meta.out_features)
        nb = -(-meta.out_features // bs)
        return nb, bs, nb * bs

    @staticmethod
    def _is_grouped(meta) -> bool:
        """Grouped/depthwise conv: block-diagonal per-group factors
        ([groups, fan_in+1, fan_in+1] A, [groups, out/groups, out/groups] G
        — each group is an independent convolution, so cross-group
        covariance is exactly zero in the layer's weight space). The
        reference's KFAC cannot run grouped convs at all (its unfold-based
        A has C*kh*kw columns but the weight matrix only C/g*kh*kw,
        curvatures.py:328-335 — sampling would shape-mismatch)."""
        return meta.kind == "conv" and meta.groups > 1

    def _spatial_stride(self) -> int:
        """Per-spatial-dim stride k such that ~token_subsample = 1/k^2."""
        if self.token_subsample >= 1.0:
            return 1
        import math
        return max(int(round(1.0 / math.sqrt(self.token_subsample))), 1)

    def _tp_ok(self, name, meta):
        """Column parallelism shards the G factor's [out, out] block; split
        attention layers (per-head / per-qkv block structure) keep their
        chunked layouts replicated."""
        return (super()._tp_ok(name, meta)
                and not self._is_qkv_split(name, meta)
                and not self._is_head_split_in(name, meta)
                and not self._is_head_split_out(name, meta)
                and not self._is_gblock(name, meta))

    def _state_leaf_spec(self, name, keys, shape, ax):
        spec = super()._state_leaf_spec(name, keys, shape, ax)
        if (ax["tensor"] and name in ax["tp"] and keys and keys[-1] == "g"
                and len(shape) >= 2 and spec[-2] is None
                and shape[-2] % ax["tensor_size"] == 0):
            # G = sum_n g_n g_n^T over the sharded output features: each
            # device owns a row block of its column-parallel layers' G
            spec[-2] = ax["tensor"]
        return spec

    @property
    def gram_probe_names(self):
        """Fused-G capture set: plain layers whose G factor is exactly the
        token Gram of the probe gradient — excluded are stacked (per-depth
        Grams), grouped (per-group blocks), qkv/head-split (chunked
        blocks), and spatially-subsampled convs (strided token grids),
        which all need the raw gradient tensor."""
        if not getattr(self, "fused_g", False):
            return frozenset()
        k = self._spatial_stride()
        out = set()
        for name, m in self.metas.items():
            if m.stacked or self._is_grouped(m) \
                    or self._is_head_split_in(name, m) \
                    or self._is_qkv_split(name, m) \
                    or self._is_head_split_out(name, m) \
                    or self._is_gblock(name, m):
                continue
            if m.kind == "conv" and k > 1:
                continue
            out.add(name)
        return frozenset(out)

    def init_state(self):
        state = {}
        for name, m in self.metas.items():
            lead = (m.stacked,) if m.stacked else ()
            if self._is_grouped(m):
                if m.stacked:
                    raise ValueError(
                        f"{name}: grouped convs inside ScanBlocks are not "
                        "supported")
                og = m.out_features // m.groups
                state[name] = {
                    "a": jnp.zeros((m.groups, m.mat_cols, m.mat_cols),
                                   self.dtype),
                    "g": jnp.zeros((m.groups, og, og), self.dtype),
                }
                continue
            if self._is_gblock(name, m):
                nb, bs, _ = self._gblock_dims(m)
                state[name] = {
                    "a": jnp.zeros((m.mat_cols, m.mat_cols), self.dtype),
                    "g": jnp.zeros((nb, bs, bs), self.dtype),
                }
                continue
            if self._is_head_split_in(name, m):
                d = m.out_features // 3 // m.heads
                g = jnp.zeros(lead + (3, m.heads, d, d), self.dtype)
            elif self._is_qkv_split(name, m):
                e = m.out_features // 3
                g = jnp.zeros(lead + (3, e, e), self.dtype)
            else:
                g = jnp.zeros(lead + (m.out_features, m.out_features),
                              self.dtype)
            if self._is_head_split_out(name, m):
                d = m.fan_in // m.heads
                state[name] = {"a": jnp.zeros(lead + (m.heads, d, d),
                                              self.dtype), "g": g}
                if m.has_bias:
                    state[name]["a_bias"] = jnp.zeros(lead, self.dtype)
                continue
            state[name] = {
                "a": jnp.zeros(lead + (m.mat_cols, m.mat_cols), self.dtype),
                "g": g,
            }
        return state

    def _a_factor(self, meta, act):
        """Per-batch A factor (already divided by its token count).

        Gram inputs stay in the capture's compute dtype (bf16 runs on the
        MXU natively) with f32 accumulation via preferred_element_type;
        fused Pallas patch-Gram where profitable (ops/pallas/patch_gram.py),
        XLA patches otherwise. Stacked (ScanBlocks) layers vmap the XLA
        path over the depth axis -> [depth, cols, cols]."""
        from curvature_tpu.ops.pallas import (
            patch_gram_tiled, patch_gram_v2, select_patch_gram)
        if meta.stacked:
            from dataclasses import replace
            flat = replace(meta, stacked=0)
            return jax.vmap(lambda a: self._a_factor_xla(flat, a))(act)
        if self._is_grouped(meta):
            if self.corr_gram_grouped and self._corr_gram_ok(meta, act):
                # within-group windowed correlations — besides the FLOP
                # ratio, never materializes the 9x-expanded grouped patch
                # tokens the einsum path streams (that op measured
                # token-stream-bound, NOTES round-3). Default OFF until
                # the on-chip step A/B lands a verdict.
                return self._corr_a_factor(meta, act)
            # per-group Grams via the naive batched einsum: the on-chip
            # A/B (benchmarks/grouped_pack_ab.py, NOTES.md round-3) found
            # both the MXU-tile-packed and the full-dense-then-extract
            # formulations equal-or-slower on every FLOP-carrying shape —
            # the op is bound by streaming the [N, g, c] tokens, not by
            # MXU tile passes, so naive wins (efficientnet_b0 end-to-end:
            # 421 img/s naive vs 334 packed). The fused pallas kernels
            # assume a single [F, F] accumulator, so grouped layers stay
            # on this XLA path.
            t = grouped_act_tokens(meta, act, append_ones=meta.has_bias,
                                   extra_stride=self._spatial_stride(),
                                   offset=self.subsample_offset)  # [N, g, cols]
            return jnp.einsum("ngi,ngj->gij", t, t,
                              preferred_element_type=self.dtype) / t.shape[0]
        if self._corr_gram_ok(meta, act):
            return self._corr_a_factor(meta, act)
        if (self.use_pallas and meta.kind == "conv"
                and self.token_subsample >= 1.0
                and not isinstance(meta.padding, str)):
            which = select_patch_gram(
                act.shape[-1], meta.kernel_size, meta.strides,
                act.shape[1], act.shape[2], act.shape[0],
                act.dtype.itemsize)
            if which is not None:
                fn = patch_gram_v2 if which == "v2" else patch_gram_tiled
                gram = fn(act, meta.kernel_size, meta.padding, meta.strides)
                if not meta.has_bias:
                    gram = gram[:meta.fan_in, :meta.fan_in]
                return gram.astype(self.dtype) / _conv_token_count(meta, act)
        return self._a_factor_xla(meta, act)

    def _corr_a_factor(self, meta, act):
        """A factor via ops/corr_gram ([F+1, F+1] dense, [g, Fg+1, Fg+1]
        grouped), normalized by the token count like every other path."""
        from dataclasses import replace
        from curvature_tpu.ops.corr_gram import corr_patch_gram
        from curvature_tpu.ops.patches import resolve_padding
        gram = corr_patch_gram(act, meta.kernel_size, meta.padding,
                               has_bias=meta.has_bias, groups=meta.groups)
        # resolve 'SAME'/'VALID' (adapter-sourced convs) for the count
        pad = resolve_padding(meta.padding, act.shape[1], act.shape[2],
                              meta.kernel_size, meta.strides)
        return gram.astype(self.dtype) / _conv_token_count(
            replace(meta, padding=pad), act)

    def _corr_gram_ok(self, meta, act) -> bool:
        # string paddings are fine here (corr_patch_gram resolves them;
        # unlike the pallas path which needs explicit pads); max(k) <= 5
        # caps the boundary-correction unroll — the 7x7 class measured
        # 0.5x standalone AND its O(k^4) assembly blocks + corner terms
        # risk a compile blowup (benchmarks/corr_gram_ab.py + NOTES)
        from curvature_tpu.ops.corr_gram import corr_gram_supported
        return (self.corr_gram and meta.kind == "conv"
                and not meta.stacked
                and corr_gram_supported(meta.kernel_size, meta.strides,
                                        meta.groups)
                and max(meta.kernel_size) <= 5
                and self.token_subsample >= 1.0
                and act.shape[-1] >= self.corr_gram_min_channels
                and min(act.shape[1], act.shape[2])
                >= self.corr_gram_min_extent)

    def _a_factor_xla(self, meta, act):
        """XLA patch-extraction fallback (also the subsampled path — the
        skipped positions are never generated)."""
        a = act_tokens(meta, act, append_ones=meta.has_bias,
                       extra_stride=self._spatial_stride(),
                       offset=self.subsample_offset)             # [N, cols]
        return _gram_aligned(a, self.dtype) / a.shape[0]

    def _g_tokens(self, meta, g):
        """Shape a probe gradient into token form: [S, (depth,) N, out]
        (strided spatial grid when token_subsample < 1). Returns
        (tokens, n_tok)."""
        k = self._spatial_stride()
        if meta.kind == "conv" and k > 1:
            o0, o1 = self.subsample_offset
            if meta.stacked:
                g = g[:, :, :, o0::k, o1::k, :]
            else:
                g = g[:, :, o0::k, o1::k, :]  # strided grid (small O)
        if meta.stacked:
            # [S, depth, ..., out] -> [S, depth, N, out]; per-depth
            # Grams in ONE einsum (the depth axis batches the GEMM)
            g = g.reshape(g.shape[0], g.shape[1], -1, meta.out_features)
            return g, g.shape[2]
        g = jax.vmap(lambda t: grad_tokens(meta, t))(g)      # [S, N, out]
        return g, g.shape[1]

    def _a_stackable(self, name, meta, act) -> bool:
        """Plain dense-path A factor (the _a_factor_xla route) — eligible
        for cross-layer same-shape stacking."""
        if meta.stacked or self._is_grouped(meta) \
                or self._is_head_split_out(name, meta):
            return False
        if self._corr_gram_ok(meta, act):
            return False                          # correlation path
        if (self.use_pallas and meta.kind == "conv"
                and self.token_subsample >= 1.0
                and not isinstance(meta.padding, str)):
            from curvature_tpu.ops.pallas import select_patch_gram
            if select_patch_gram(
                    act.shape[-1], meta.kernel_size, meta.strides,
                    act.shape[1], act.shape[2], act.shape[0],
                    act.dtype.itemsize) is not None:
                return False                      # fused pallas path
        return True

    def _g_stackable(self, name, meta) -> bool:
        return not (meta.stacked or self._is_grouped(meta)
                    or self._is_head_split_in(name, meta)
                    or self._is_qkv_split(name, meta)
                    or self._is_head_split_out(name, meta)
                    or self._is_gblock(name, meta))

    def _stacked_grams(self, cap: Captured, grams):
        """Cross-layer Gram batching: bucket the plain-path token matrices
        by shape and run ONE batched einsum per bucket (ResNet-50: six
        identical [3136, 257] A-Grams become one [6, 3136, 257] product).
        Identical math — parity-tested against the per-layer path."""
        k = self._spatial_stride()
        a_buckets, g_buckets = {}, {}
        for name, meta in self.metas.items():
            if name in grams:
                continue
            act = cap.acts[name]
            if self._a_stackable(name, meta, act):
                t = act_tokens(meta, act, append_ones=meta.has_bias,
                               extra_stride=k, offset=self.subsample_offset)
                a_buckets.setdefault(t.shape, []).append((name, t))
            if self._g_stackable(name, meta):
                g, _ = self._g_tokens(meta, cap.probe_grads[name])
                g_buckets.setdefault(g.shape, []).append((name, g))
        pre_a, pre_g = {}, {}
        for shape, items in a_buckets.items():
            if len(items) < 2:
                continue
            t = jnp.stack([x for _, x in items])
            gram = _gram_aligned_batched(t, self.dtype) / shape[0]
            for i, (name, _) in enumerate(items):
                pre_a[name] = gram[i]
        for shape, items in g_buckets.items():
            if len(items) < 2:
                continue
            g = jnp.stack([x for _, x in items])             # [L, S, N, O]
            bs2_n = jnp.asarray(cap.batch_size, self.dtype) ** 2 / shape[1]
            gram = jnp.einsum("lsni,lsnj->lij", g, g,
                              preferred_element_type=self.dtype) * bs2_n
            for i, (name, _) in enumerate(items):
                pre_g[name] = gram[i]
        return pre_a, pre_g

    def update_state(self, state, cap: Captured):
        new = {}
        grams = cap.probe_grams or {}
        any_probe = next(iter(cap.probe_grads.values()), None)
        num_mc = (any_probe.shape[0] if any_probe is not None
                  else next(iter(grams.values())).shape[0])
        pre_a, pre_g = (self._stacked_grams(cap, grams)
                        if self.stack_grams else ({}, {}))
        for name, meta in self.metas.items():
            if name in grams:
                # fused path: the backward already reduced this layer's
                # probe gradient to per-sample token Grams [S, out, out]
                # (nn.core.gram_tap); identical scaling as the einsum path
                n_tok = cap.probe_gram_ntok[name]
                bs2_n = jnp.asarray(cap.batch_size, self.dtype) ** 2 / n_tok
                g_factor = jnp.sum(grams[name], axis=0) * bs2_n
                a_factor = self._a_factor(meta, cap.acts[name])
                new[name] = {
                    "a": state[name]["a"]
                    + num_mc * a_factor.astype(self.dtype),
                    "g": state[name]["g"] + g_factor.astype(self.dtype),
                }
                continue
            if name in pre_g:
                new[name] = {
                    "a": state[name]["a"] + num_mc * (
                        pre_a[name] if name in pre_a
                        else self._a_factor(meta, cap.acts[name])
                    ).astype(self.dtype),
                    "g": state[name]["g"] + pre_g[name].astype(self.dtype),
                }
                continue
            # the reference's hook scales grads by batch size BEFORE the Gram
            # (curvatures.py:309-310); (B*g)^T (B*g) = B^2 * g^T g, so scale
            # the [out, out] result instead — the [S, B, H, W, out] scaled
            # temp never hits HBM
            g, n_tok = self._g_tokens(meta, cap.probe_grads[name])
            bs2_n = jnp.asarray(cap.batch_size, self.dtype) ** 2 / n_tok
            # the einsum ellipsis absorbs the optional stacked depth axis
            if self._is_head_split_in(name, meta):
                d = meta.out_features // 3 // meta.heads
                gq = g.reshape(g.shape[:-1] + (3, meta.heads, d))
                g_factor = jnp.einsum("s...nkhi,s...nkhj->...khij", gq, gq,
                                      preferred_element_type=self.dtype) \
                    * bs2_n
            elif self._is_qkv_split(name, meta):
                e = meta.out_features // 3
                gq = g.reshape(g.shape[:-1] + (3, e))
                g_factor = jnp.einsum("s...nki,s...nkj->...kij", gq, gq,
                                      preferred_element_type=self.dtype) \
                    * bs2_n
            elif self._is_gblock(name, meta):
                # vocab-scale head: per-block token Grams. S and N merge;
                # the zero-padded tail columns produce exactly-zero factor
                # rows/cols (sliced semantics handled at sample/logdet)
                nb, bs, padded = self._gblock_dims(meta)
                gq = g.reshape(-1, meta.out_features)
                gq = jnp.pad(gq, ((0, 0),
                                  (0, padded - meta.out_features)))
                gq = gq.reshape(gq.shape[0], nb, bs)
                g_factor = jnp.einsum("nkb,nkc->kbc", gq, gq,
                                      preferred_element_type=self.dtype) \
                    * bs2_n
            elif self._is_grouped(meta):
                # output channels are group-major (o = j*O/g + i), so one
                # reshape splits the group axis; naive batched einsum per
                # the same on-chip A/B as the A path (packing measured
                # equal-or-slower; see _a_factor)
                og = meta.out_features // meta.groups
                gq = g.reshape(-1, meta.groups, og)   # S,n merged into N
                g_factor = jnp.einsum("ngi,ngj->gij", gq, gq,
                                      preferred_element_type=self.dtype) \
                    * bs2_n
            else:
                g_factor = jnp.einsum("s...ni,s...nj->...ij", g, g,
                                      preferred_element_type=self.dtype) \
                    * bs2_n

            if self._is_head_split_out(name, meta):
                # per-head input blocks: out_proj's input is the concat of
                # head outputs, so A splits along fan_in; the ones (bias)
                # column becomes a scalar block with Gram value exactly 1
                act = cap.acts[name]
                dh = meta.fan_in // meta.heads
                lead = (meta.stacked,) if meta.stacked else ()
                t = act.reshape(lead + (-1, meta.heads, dh))
                n_a = t.shape[-3]
                a_factor = jnp.einsum("...nhi,...nhj->...hij", t, t,
                                      preferred_element_type=self.dtype) / n_a
                new[name] = {
                    "a": state[name]["a"]
                    + num_mc * a_factor.astype(self.dtype),
                    "g": state[name]["g"] + g_factor.astype(self.dtype),
                }
                if "a_bias" in state[name]:
                    new[name]["a_bias"] = state[name]["a_bias"] \
                        + jnp.asarray(num_mc, self.dtype)
                continue

            a_factor = (pre_a[name] if name in pre_a
                        else self._a_factor(meta, cap.acts[name]))
            new[name] = {
                "a": state[name]["a"] + num_mc * a_factor.astype(self.dtype),
                "g": state[name]["g"] + g_factor.astype(self.dtype),
            }
        return new

    def invert_state(self, state, add, multiply):
        # damped_inverse_cholesky is batched over leading dims, which covers
        # qkv-split [3, E, E], stacked [depth, ...], and stacked+split
        # [depth, 3, E, E] factors uniformly
        inv = {}
        for i, name in enumerate(self.metas):
            inv[name] = {
                "a_chol": damped_inverse_cholesky(state[name]["a"],
                                                  add[i], multiply[i]),
                "g_chol": damped_inverse_cholesky(state[name]["g"],
                                                  add[i], multiply[i]),
            }
            if "a_bias" in state[name]:
                # scalar bias block of the head-split out_proj A: the same
                # split damping, chol(inv(.)) of a 1x1 matrix
                reg = jnp.sqrt(multiply[i]) * state[name]["a_bias"] \
                    + jnp.sqrt(add[i])
                inv[name]["a_bias_chol"] = 1.0 / jnp.sqrt(reg)
        return inv

    def logdet_state(self, state, add, multiply):
        """logdet of the Kronecker posterior precision: per (leading-dim)
        block, logdet(A_d (x) G_d) = out * logdet(A_d) + cols * logdet(G_d);
        block axes (stacked depth, groups, qkv chunks, heads) sum. A's
        leading dims are always a PREFIX of G's (shared A across split-G
        blocks), so the A logdets broadcast with trailing expansion."""
        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            fac = state[name]
            if "a_bias" in fac:
                # head-split out_proj: H per-head [d, d] A blocks + one
                # scalar bias A block, all sharing G. Each weight block is
                # A_h (x) G (out * logdet(A_h) + d * logdet(G)); the bias
                # block is a_bias (x) G. The H*d + 1 = cols copies of
                # logdet(G) match the plain-factor count exactly.
                la = _split_damped_logdet(fac["a"], add[i], multiply[i])
                lg = _split_damped_logdet(fac["g"], add[i], multiply[i])
                d = fac["a"].shape[-1]
                out = fac["g"].shape[-1]
                heads = fac["a"].shape[-3]
                lb = jnp.log(
                    jnp.sqrt(jnp.asarray(multiply[i], self.dtype))
                    * fac["a_bias"]
                    + jnp.sqrt(jnp.asarray(add[i], self.dtype)))
                tot += out * jnp.sum(la) + out * jnp.sum(lb) \
                    + (heads * d + 1) * jnp.sum(lg)
                continue
            la = _split_damped_logdet(fac["a"], add[i], multiply[i])
            lg = _split_damped_logdet(fac["g"], add[i], multiply[i])
            if self._is_gblock(name, meta):
                # nb blocks share A; the padded G tail is exactly zero, so
                # each padded dim contributes log(sqrt(add)) to its block's
                # logdet — subtract it analytically so the reported logdet
                # is over the REAL out_features dims only (marglik's add
                # derivative stays unbiased)
                nb, bs, padded = self._gblock_dims(meta)
                pad = padded - meta.out_features
                cols = fac["a"].shape[-1]
                lg_real = jnp.sum(lg) - pad * 0.5 * jnp.log(
                    jnp.asarray(add[i], self.dtype))
                tot += meta.out_features * la + cols * lg_real
                continue
            la = la.reshape(la.shape + (1,) * (lg.ndim - la.ndim))
            cols = fac["a"].shape[-1]
            out = fac["g"].shape[-1]
            tot += jnp.sum(out * la + cols * lg)
        return tot

    def quad_state(self, state, add, multiply, deltas):
        """delta^T (A_d (x) G_d) delta = sum(delta * (G_d delta A_d)) per
        layer; plain/stacked/grouped block layouts (the coverage the
        optimizer's preconditioner shares). Split attention factors are
        posterior-sampling-only."""
        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            fac = state[name]
            d = deltas[name].astype(self.dtype)
            grouped = self._is_grouped(meta)
            if self._is_gblock(name, meta):
                # blocked G, shared A: zero-padded delta rows contribute
                # exactly zero through the zero-padded G blocks
                nb, bs, padded = self._gblock_dims(meta)
                s = jnp.sqrt(jnp.asarray(multiply[i], self.dtype))
                n = jnp.sqrt(jnp.asarray(add[i], self.dtype))
                from curvature_tpu.ops.linalg import sym
                a_d = sym(s * fac["a"]
                          + n * jnp.eye(fac["a"].shape[-1], dtype=self.dtype))
                g_d = sym(s * fac["g"]
                          + n * jnp.eye(bs, dtype=self.dtype))
                dq = jnp.pad(d, ((0, padded - meta.out_features), (0, 0)))
                dq = dq.reshape(nb, bs, -1)
                tot += jnp.einsum("kuc,kuv,kvd,cd->", dq, g_d, dq, a_d)
                continue
            base = 2 + (1 if meta.stacked else 0) + (1 if grouped else 0)
            if "a_bias" in fac or jnp.ndim(fac["a"]) != base \
                    or jnp.ndim(fac["g"]) != base:
                raise NotImplementedError(
                    f"{name}: quadratic form for split attention factors "
                    "is not implemented — use plain factors")
            s = jnp.sqrt(jnp.asarray(multiply[i], self.dtype))
            n = jnp.sqrt(jnp.asarray(add[i], self.dtype))
            eye_a = jnp.eye(fac["a"].shape[-1], dtype=self.dtype)
            eye_g = jnp.eye(fac["g"].shape[-1], dtype=self.dtype)
            from curvature_tpu.ops.linalg import sym
            a_d = sym(s * fac["a"] + n * eye_a)
            g_d = sym(s * fac["g"] + n * eye_g)
            if grouped:
                og = meta.out_features // meta.groups
                blocks = d.reshape(meta.groups, og, -1)     # [g, og, cols]
                tot += jnp.einsum("kuc,kuv,kvd,kcd->", blocks, g_d, blocks,
                                  a_d)
            else:
                tot += jnp.einsum("...uc,...uv,...vd,...cd->", d, g_d, d,
                                  a_d)
        return tot

    def solve_state(self, inv_state, deltas):
        """Kronecker inverse application ``P^{-1} mat = G_d^{-1} mat A_d^{-1}``
        per (grouped / stacked) block — a_chol/g_chol are Choleskys of the
        inverted damped factors, so two einsums each side apply the inverse
        exactly. Split attention factors (qkv/head) are a posterior-only
        layout, same boundary as the optimizer preconditioner (optim.py)."""
        out = {}
        for name, meta in self.metas.items():
            a_chol = inv_state[name]["a_chol"]
            g_chol = inv_state[name]["g_chol"]
            d = deltas[name].astype(self.dtype)
            if self._is_gblock(name, meta):
                nb, bs, padded = self._gblock_dims(meta)
                dq = jnp.pad(d, ((0, padded - meta.out_features), (0, 0)))
                dq = dq.reshape(nb, bs, -1)
                pg = jnp.einsum("kue,kve,kvc->kuc", g_chol, g_chol, dq)
                sol = jnp.einsum("kuc,cd,fd->kuf", pg, a_chol, a_chol)
                out[name] = sol.reshape(padded, -1)[:meta.out_features]
                continue
            base = 2 + (1 if meta.stacked else 0) \
                + (1 if self._is_grouped(meta) else 0)
            if "a_bias_chol" in inv_state[name] or jnp.ndim(a_chol) != base \
                    or jnp.ndim(g_chol) != base:
                raise ValueError(
                    f"{name}: split attention factors (qkv/head) are "
                    "posterior-only; build the KFAC without "
                    "attention_qkv_split/head_split for inverse products")
            if self._is_grouped(meta):
                og = meta.out_features // meta.groups
                blocks = d.reshape(meta.groups, og, -1)
                pg = jnp.einsum("gue,gve,gvc,gcd,gfd->guf",
                                g_chol, g_chol, blocks, a_chol, a_chol)
                out[name] = pg.reshape(meta.out_features, -1)
            else:
                pg = jnp.einsum("...ue,...ve,...vc->...uc",
                                g_chol, g_chol, d)
                out[name] = jnp.einsum("...uc,...cd,...fd->...uf",
                                       pg, a_chol, a_chol)
        return out

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        out = {}
        for name, meta in self.metas.items():
            rng, key = jax.random.split(rng)
            a_chol = inv_state[name]["a_chol"]
            g_chol = inv_state[name]["g_chol"]
            lead = (meta.stacked,) if meta.stacked else ()
            if self._is_grouped(meta):
                # block matrix-normals per group; rows group-major, matching
                # the [out, fan_in+1] grouped param_matrix view
                og = meta.out_features // meta.groups
                cols = a_chol.shape[-1]
                z = jax.random.normal(key, (meta.groups, cols, og),
                                      self.dtype)
                blocks = jnp.einsum("gab,gbe,gfe->gfa", a_chol, z, g_chol)
                out[name] = blocks.reshape(meta.out_features, cols)
                continue
            if self._is_head_split_in(name, meta):
                # [(L,)3,H,d,d] G blocks, shared A: block matrix-normals,
                # rows ordered (qkv-chunk, head, dim) = the packed layout
                h, d = meta.heads, meta.out_features // 3 // meta.heads
                cols = a_chol.shape[-1]
                z = jax.random.normal(key, lead + (3, h, cols, d),
                                      self.dtype)
                blocks = jnp.einsum("...ab,...khbe,...khfe->...khaf",
                                    a_chol, z, g_chol)
                out[name] = jnp.swapaxes(blocks, -1, -2) \
                    .reshape(lead + (meta.out_features, cols))
                continue
            if self._is_head_split_out(name, meta):
                # per-head A blocks + scalar bias block, shared G
                h = meta.heads
                d = meta.fan_in // h
                e_out = meta.out_features
                key, kb = jax.random.split(key)
                z = jax.random.normal(key, lead + (h, d, e_out), self.dtype)
                w = jnp.einsum("...hab,...hbg,...og->...oha",
                               a_chol, z, g_chol)
                w = w.reshape(lead + (e_out, meta.fan_in))
                if "a_bias_chol" in inv_state[name]:
                    zb = jax.random.normal(kb, lead + (e_out,), self.dtype)
                    b = jnp.einsum("...og,...g->...o", g_chol, zb) \
                        * inv_state[name]["a_bias_chol"][..., None]
                    w = jnp.concatenate([w, b[..., None]], axis=-1)
                out[name] = w
                continue
            if self._is_gblock(name, meta):
                # nb blocks share A: block matrix-normals, rows sliced back
                # to the real out_features (padded rows are noise that the
                # posterior never exposes)
                nb, bs, padded = self._gblock_dims(meta)
                cols = a_chol.shape[-1]
                z = jax.random.normal(key, (nb, cols, bs), self.dtype)
                blocks = jnp.einsum("ab,kbe,kfe->kaf", a_chol, z, g_chol)
                out[name] = blocks.transpose(0, 2, 1) \
                    .reshape(padded, cols)[:meta.out_features]
                continue
            split = self._is_qkv_split(name, meta)
            cols = a_chol.shape[-1]
            if meta.stacked:
                d = meta.stacked
                if split:
                    e = g_chol.shape[-1]
                    z = jax.random.normal(key, (d, 3, cols, e), self.dtype)
                    blocks = jnp.einsum("lab,lkbe,lkfe->lkaf",
                                        a_chol, z, g_chol)
                    out[name] = blocks.transpose(0, 1, 3, 2) \
                        .reshape(d, 3 * e, cols)               # [L, 3E, cols]
                else:
                    z = jax.random.normal(key, (d, cols, g_chol.shape[-1]),
                                          self.dtype)
                    out[name] = jnp.einsum("lab,lbg,log->loa",
                                           a_chol, z, g_chol)  # [L, out, cols]
            elif split:                # qkv-split: block matrix-normals
                e = g_chol.shape[-1]
                z = jax.random.normal(key, (3, cols, e), self.dtype)
                blocks = jnp.einsum("ab,kbe,kfe->kaf", a_chol, z, g_chol)
                out[name] = blocks.transpose(0, 2, 1) \
                    .reshape(3 * e, cols)                      # [3E, cols]
            else:
                z = jax.random.normal(key, (cols, g_chol.shape[0]),
                                      self.dtype)
                out[name] = (a_chol @ z @ g_chol.T).T          # [out, cols]
        return out
