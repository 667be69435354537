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
    Estimator, act_tokens, grad_tokens)
from curvature_tpu.estimators.capture import Captured
from curvature_tpu.ops.linalg import damped_inverse_cholesky


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
                 attention_qkv_split: bool = False, **kwargs):
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
        """
        # set BEFORE super().__init__ — the base constructor calls
        # init_state(), which dispatches on the flag
        self.attention_qkv_split = bool(attention_qkv_split)
        super().__init__(*args, **kwargs)
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
                and meta.out_features % 3 == 0)

    def _spatial_stride(self) -> int:
        """Per-spatial-dim stride k such that ~token_subsample = 1/k^2."""
        if self.token_subsample >= 1.0:
            return 1
        import math
        return max(int(round(1.0 / math.sqrt(self.token_subsample))), 1)

    def init_state(self):
        state = {}
        for name, m in self.metas.items():
            if self._is_qkv_split(name, m):
                e = m.out_features // 3
                g = jnp.zeros((3, e, e), self.dtype)
            else:
                g = jnp.zeros((m.out_features, m.out_features), self.dtype)
            state[name] = {
                "a": jnp.zeros((m.mat_cols, m.mat_cols), self.dtype),
                "g": g,
            }
        return state

    def _a_factor(self, meta, act):
        """Per-batch A factor (already divided by its token count).

        Gram inputs stay in the capture's compute dtype (bf16 runs on the
        MXU natively) with f32 accumulation via preferred_element_type;
        fused Pallas patch-Gram where profitable (ops/pallas/patch_gram.py),
        XLA patches otherwise."""
        from curvature_tpu.ops.pallas import (patch_gram_v2,
                                              patch_gram_v2_supported)
        if (self.use_pallas and meta.kind == "conv"
                and self.token_subsample >= 1.0
                and not isinstance(meta.padding, str)
                and patch_gram_v2_supported(
                    act.shape[-1], meta.kernel_size, meta.strides,
                    act.shape[1], act.shape[2], act.dtype.itemsize)):
            gram = patch_gram_v2(act, meta.kernel_size, meta.padding,
                                 meta.strides)
            if not meta.has_bias:
                gram = gram[:meta.fan_in, :meta.fan_in]
            return gram.astype(self.dtype) / _conv_token_count(meta, act)
        # subsampling rides the patch-extraction stride — the skipped
        # positions are never generated
        a = act_tokens(meta, act, append_ones=meta.has_bias,
                       extra_stride=self._spatial_stride(),
                       offset=self.subsample_offset)             # [N, cols]
        return jnp.einsum("ni,nj->ij", a, a,
                          preferred_element_type=self.dtype) / a.shape[0]

    def update_state(self, state, cap: Captured):
        new = {}
        num_mc = next(iter(cap.probe_grads.values())).shape[0]
        k = self._spatial_stride()
        for name, meta in self.metas.items():
            # the reference's hook scales grads by batch size BEFORE the Gram
            # (curvatures.py:309-310); (B*g)^T (B*g) = B^2 * g^T g, so scale
            # the [out, out] result instead — the [S, B, H, W, out] scaled
            # temp never hits HBM
            g = cap.probe_grads[name]
            if meta.kind == "conv" and k > 1:
                o0, o1 = self.subsample_offset
                g = g[:, :, o0::k, o1::k, :]  # strided spatial grid (small O)
            g = jax.vmap(lambda t: grad_tokens(meta, t))(g)     # [S, N, out]
            bs2_n = jnp.asarray(cap.batch_size, self.dtype) ** 2 / g.shape[1]
            if self._is_qkv_split(name, meta):
                e = meta.out_features // 3
                gq = g.reshape(g.shape[0], g.shape[1], 3, e)
                g_factor = jnp.einsum("snki,snkj->kij", gq, gq,
                                      preferred_element_type=self.dtype) \
                    * bs2_n
            else:
                g_factor = jnp.einsum("sni,snj->ij", g, g,
                                      preferred_element_type=self.dtype) \
                    * bs2_n

            a_factor = self._a_factor(meta, cap.acts[name])
            new[name] = {
                "a": state[name]["a"] + num_mc * a_factor.astype(self.dtype),
                "g": state[name]["g"] + g_factor.astype(self.dtype),
            }
        return new

    def invert_state(self, state, add, multiply):
        inv = {}
        for i, name in enumerate(self.metas):
            g = state[name]["g"]
            if g.ndim == 3:       # qkv-split: damp/invert each block
                g_chol = jax.vmap(
                    lambda f, a=add[i], m=multiply[i]:
                    damped_inverse_cholesky(f, a, m))(g)
            else:
                g_chol = damped_inverse_cholesky(g, add[i], multiply[i])
            inv[name] = {
                "a_chol": damped_inverse_cholesky(state[name]["a"],
                                                  add[i], multiply[i]),
                "g_chol": g_chol,
            }
        return inv

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        out = {}
        for name, meta in self.metas.items():
            rng, key = jax.random.split(rng)
            a_chol = inv_state[name]["a_chol"]
            g_chol = inv_state[name]["g_chol"]
            if g_chol.ndim == 3:   # qkv-split: block matrix-normals, rows
                e = g_chol.shape[-1]
                z = jax.random.normal(key, (3, a_chol.shape[0], e),
                                      self.dtype)
                blocks = jnp.einsum("ab,kbe,kfe->kaf", a_chol, z, g_chol)
                out[name] = blocks.transpose(0, 2, 1) \
                    .reshape(3 * e, a_chol.shape[0])           # [3E, cols]
            else:
                z = jax.random.normal(key,
                                      (a_chol.shape[0], g_chol.shape[0]),
                                      self.dtype)
                out[name] = (a_chol @ z @ g_chol.T).T          # [out, cols]
        return out
