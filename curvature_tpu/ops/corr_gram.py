"""Patch-Gram via windowed channel correlations (stride-1 convolutions).

The KFAC A factor of a conv layer is the Gram of its unfolded patches
(reference curvatures.py:328-335): for a k x k kernel, F = C*k^2 columns
and the product costs 2*N*F^2 = 2*N*C^2*k^4 FLOPs. But stride-1 patch
columns are SHIFTED COPIES of the same image: the Gram entry for taps
d = (dy, dx) and d' = (dy', dx') is a windowed correlation

    A[(c,d), (c',d')] = sum_{u in W_d} xp[b, u, c] * xp[b, u + delta, c']

with xp the zero-padded input, delta = d' - d taking only (2k-1)^2 values,
and W_d a fixed H_out x W_out window. So the k^4 tap pairs collapse onto
(2k-1)^2 full-field correlations (each one [C, C] with a token-deep
contraction — the best-conditioned MXU shape a Gram can have) plus exact
single-row/column/corner boundary corrections, and delta/-delta pairs are
transposes of each other:

    FLOPs: 2*N*C^2 * (2k^2 - 2k + 1)  vs  2*N*C^2*k^4
           (13/81 = 0.16x for 3x3, 25/2401 = 0.01x for 7x7)

This is exact — not an approximation: the boundary corrections subtract
precisely the rows/columns of the padded field that fall outside each
tap's window (most of which are the zero-padding ring and vanish). Parity
with the unfold Gram is pinned at 1e-5 in tests/test_corr_gram.py.

Grouped/depthwise convolutions (``groups > 1``): correlations are
restricted to within-group channel pairs ([G, cg, cg] per delta), giving
the per-group block factors [G, F(+1), F(+1)] in the same layout as
base.grouped_act_tokens — and, beyond the FLOP ratio, the formulation
never materializes the 9x-expanded [N, G, cg*k^2] patch-token matrix the
grouped einsum path streams (that op measured token-stream-bound,
NOTES.md round-3).

Pure XLA (einsums over shifted slices — no Pallas, no Mosaic risk); used
by estimators.KFAC._a_factor for stride-1 convs where the on-chip step
A/B shows it winning (benchmarks/corr_e2e_ab.py, corr_gram_ab.py).
"""
import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from curvature_tpu.ops.patches import resolve_padding

__all__ = ["corr_patch_gram", "corr_gram_supported"]


def corr_gram_supported(kernel_size, strides, groups: int = 1) -> bool:
    kh, kw = kernel_size
    return tuple(strides) == (1, 1) and (kh, kw) != (1, 1)


@functools.partial(jax.jit, static_argnames=("kernel_size", "padding",
                                             "has_bias", "groups"))
def corr_patch_gram(x: jax.Array,
                    kernel_size: Tuple[int, int],
                    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
                    has_bias: bool = True,
                    groups: int = 1) -> jax.Array:
    """Unnormalized patch Gram for a stride-1 conv.

    Same contract as ops.pallas.patch_gram: canonical channel-major
    (c, dy, dx) feature order, optional ones column last, f32 output
    (operands keep their dtype on the MXU; f32 accumulation).
    ``groups == 1`` returns [F(+1), F(+1)]; ``groups > 1`` returns the
    per-group blocks [G, Fg(+1), Fg(+1)], Fg = (C/G)*kh*kw, matching
    base.grouped_act_tokens' per-group feature order.
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    cg = c // groups
    (pt, pb), (pl, pr) = resolve_padding(padding, h, w, kernel_size)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hp, wp = h + pt + pb, w + pl + pr
    ho, wo = hp - kh + 1, wp - kw + 1
    n_tok = b * ho * wo
    # group axis split once; slicing below keeps the trailing [G, cg] axes
    xp = xp.reshape(b, hp, wp, groups, cg)

    def corr(a1, a2):
        return jnp.einsum("...gc,...gd->gcd", a1, a2,
                          preferred_element_type=jnp.float32)

    def transpose_blk(blk):                       # [G, cg, cg] -> per-group T
        return jnp.swapaxes(blk, -1, -2)

    # full-field correlations: compute the lexicographically-positive half,
    # mirror the rest as transposes (corr(x, shift(x, -d)) == corr^T)
    full = {}
    for dy in range(-(kh - 1), kh):
        for dx in range(-(kw - 1), kw):
            if (dy, dx) < (0, 0):     # lexicographic: mirrored below
                continue
            ly, hy = max(0, -dy), min(hp, hp - dy)
            lx, hx = max(0, -dx), min(wp, wp - dx)
            full[(dy, dx)] = corr(xp[:, ly:hy, lx:hx],
                                  xp[:, ly + dy:hy + dy, lx + dx:hx + dx])
    for (dy, dx) in list(full):
        if (dy, dx) != (0, 0):
            full[(-dy, -dx)] = transpose_blk(full[(dy, dx)])

    # boundary corrections: single rows/columns/corners of the padded
    # field that fall outside a tap's window — O(edge) each
    row_corr, col_corr, corner = {}, {}, {}
    # set-union dedupe: when the output extent is smaller than k-1 the two
    # ranges overlap (e.g. 9x9 VALID conv on 14 rows: ho=6 < kh-1=8), and a
    # duplicated index would subtract the same correction twice
    row_cand = sorted(set(range(0, kh - 1)) | set(range(ho, hp)))
    col_cand = sorted(set(range(0, kw - 1)) | set(range(wo, wp)))
    for dy in range(-(kh - 1), kh):
        for dx in range(-(kw - 1), kw):
            ly, hy = max(0, -dy), min(hp, hp - dy)
            lx, hx = max(0, -dx), min(wp, wp - dx)
            for y in row_cand:
                if ly <= y < hy:
                    row_corr[(y, dy, dx)] = corr(
                        xp[:, y, lx:hx], xp[:, y + dy, lx + dx:hx + dx])
            for xq in col_cand:
                if lx <= xq < hx:
                    col_corr[(xq, dy, dx)] = corr(
                        xp[:, ly:hy, xq], xp[:, ly + dy:hy + dy, xq + dx])
            for y in row_cand:
                for xq in col_cand:
                    if ly <= y < hy and lx <= xq < hx:
                        corner[(y, xq, dy, dx)] = corr(
                            xp[:, y, xq], xp[:, y + dy, xq + dx])

    # assemble the k^2 x k^2 grid of [G, cg, cg] blocks
    taps = [(dy, dx) for dy in range(kh) for dx in range(kw)]
    blocks = []
    for (dy, dx) in taps:
        row_blocks = []
        for (dy2, dx2) in taps:
            dly, dlx = dy2 - dy, dx2 - dx
            ly, hy = max(0, -dly), min(hp, hp - dly)
            lx, hx = max(0, -dlx), min(wp, wp - dlx)
            blk = full[(dly, dlx)]
            for y in row_cand:
                if ly <= y < hy and not (dy <= y < dy + ho):
                    blk = blk - row_corr[(y, dly, dlx)]
            for xq in col_cand:
                if lx <= xq < hx and not (dx <= xq < dx + wo):
                    blk = blk - col_corr[(xq, dly, dlx)]
            for y in row_cand:
                for xq in col_cand:
                    if ly <= y < hy and lx <= xq < hx \
                            and not (dy <= y < dy + ho) \
                            and not (dx <= xq < dx + wo):
                        blk = blk + corner[(y, xq, dly, dlx)]
            row_blocks.append(blk)
        blocks.append(jnp.stack(row_blocks))
    bk = jnp.stack(blocks)                        # [K, K', G, cg, cg']
    k2 = kh * kw
    # per-group feature order (c, tap): [G, cg, K, cg', K']
    gram = bk.transpose(2, 3, 0, 4, 1).reshape(groups, cg * k2, cg * k2)
    if has_bias:
        # ones column: per-tap window channel sums, per group
        sums = jnp.stack([
            jnp.einsum("bhwgc->gc", xp[:, dy:dy + ho, dx:dx + wo],
                       preferred_element_type=jnp.float32)
            for (dy, dx) in taps])                # [K, G, cg]
        vec = sums.transpose(1, 2, 0).reshape(groups, -1)   # (c, t) order
        top = jnp.concatenate([gram, vec[:, :, None]], axis=2)
        n = jnp.full((groups, 1), n_tok, jnp.float32)
        bottom = jnp.concatenate([vec, n], axis=1)
        gram = jnp.concatenate([top, bottom[:, None, :]], axis=1)
    return gram[0] if groups == 1 else gram
