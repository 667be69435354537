"""Symmetric token-Gram kernel: X^T X computing only the lower triangle.

The factor-update Gram phase is bound by MXU output-tile accumulation at
factor-update token counts (benchmarks/NOTES.md round-3 attribution), and
XLA's einsum computes all nt^2 output tiles of a symmetric product. This
kernel walks only the nt(nt+1)/2 lower-triangular tile pairs — a ~2x
reduction in both tile passes AND operand re-reads for large F — and the
caller mirrors the strict-lower part afterwards (cheap VPU elementwise).

Grid: (P, nk) with P = nt(nt+1)/2 tile pairs and nk the contraction
chunks; the (i, j) tile coordinates of each linear index p ride in as
scalar-prefetch arrays so the input/output DMAs of skipped (upper) tiles
never happen (a @pl.when over a rectangular grid would still stream
them). The k axis is innermost, so each output tile stays resident while
its contraction accumulates (the standard matmul revisit pattern).

Exactness: zero-padding N and F contributes exactly-zero partial sums, so
``sym_gram(x) == x.T @ x`` bit-for-bit in structure (f32 accumulation via
preferred_element_type, same as the einsum path); parity is tested in
interpret mode and on-chip in tests/test_pallas_kernels.py.
"""
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sym_gram", "sym_gram_supported"]


def _plan(n: int, f: int, itemsize: int) -> Tuple[int, int]:
    """(tile_f, tile_n): one MXU-friendly block pair fitting ~8 MB VMEM
    with double buffering (2 input blocks x2 + the resident out tile)."""
    tile_f = 512 if f >= 512 else 256 if f >= 256 else 128
    budget = 8 * 2 ** 20
    # 4 buffered input blocks (2 operands, double-buffered) + out tile f32
    tile_n = (budget - tile_f * tile_f * 4) // (4 * tile_f * itemsize)
    tile_n = max(512, min(2048, tile_n // 512 * 512))
    return tile_f, tile_n


def sym_gram_supported(n: int, f: int) -> bool:
    """Worth dispatching: more than one F tile (else there is no upper
    triangle to skip) and a contraction long enough to matter."""
    tile_f, _ = _plan(n, f, 4)
    return f > tile_f


def _kernel(i_ref, j_ref, xi_ref, xj_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        xi_ref[...], xj_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel_rect(xi_ref, xj_ref, out_ref):
    """Rectangular-grid variant: every (i, j) tile is scheduled (and its
    operands streamed), but the MXU passes — the binding resource — only
    run on the lower triangle."""
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(i >= j, k == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(i >= j)
    def _():
        out_ref[...] += jax.lax.dot_general(
            xi_ref[...], xj_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def sym_gram(x: jax.Array, interpret: bool = False,
             variant: str = "tri") -> jax.Array:
    """``x.T @ x`` ([N, F] -> [F, F] f32) via lower-triangular tiles.

    The operand dtype is preserved for the MXU (bf16 stays bf16);
    accumulation is f32. Falls back to a plain einsum when the shape has
    nothing to skip (``sym_gram_supported``). ``variant='tri'`` walks only
    the triangular tile pairs (scalar-prefetched coordinates — skips DMA
    and compute); ``'rect'`` schedules the full rectangle but predicates
    the MXU passes, the pattern this deployment's Mosaic helper is known
    to compile (patch_gram_tiled uses the same grid shape).
    """
    n, f = x.shape
    if not sym_gram_supported(n, f):
        return jnp.einsum("ni,nj->ij", x, x,
                          preferred_element_type=jnp.float32)
    tile_f, tile_n = _plan(n, f, x.dtype.itemsize)
    f_pad = -f % tile_f
    n_pad = -n % tile_n
    if f_pad or n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, f_pad)))
    nt = (f + f_pad) // tile_f
    nk = (n + n_pad) // tile_n
    if variant == "rect":
        low = pl.pallas_call(
            _kernel_rect,
            grid=(nt, nt, nk),
            in_specs=[
                pl.BlockSpec((tile_n, tile_f), lambda i, j, k: (k, i)),
                pl.BlockSpec((tile_n, tile_f), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((tile_f, tile_f),
                                   lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((f + f_pad, f + f_pad),
                                           jnp.float32),
            interpret=interpret,
        )(x, x)
        low = low[:f, :f]
        tri = jnp.tril(low)
        return tri + jnp.tril(low, -1).T
    pairs = [(i, j) for i in range(nt) for j in range(i + 1)]
    i_idx = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    j_idx = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    grid = (len(pairs), nk)
    # index maps receive the grid indices THEN the scalar-prefetch refs;
    # block-index units (pallas convention)
    low = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, tile_f),
                             lambda p, k, i_r, j_r: (k, i_r[p])),
                pl.BlockSpec((tile_n, tile_f),
                             lambda p, k, i_r, j_r: (k, j_r[p])),
            ],
            out_specs=pl.BlockSpec((tile_f, tile_f),
                                   lambda p, k, i_r, j_r: (i_r[p], j_r[p])),
        ),
        out_shape=jax.ShapeDtypeStruct((f + f_pad, f + f_pad), jnp.float32),
        interpret=interpret,
    )(i_idx, j_idx, x, x)
    # untouched upper tiles hold garbage: keep the lower triangle and
    # mirror the strict-lower part (diagonal tiles are internally full
    # and symmetric, so tril + tril(-1)^T reconstructs them exactly)
    low = low[:f, :f]
    tri = jnp.tril(low)
    return tri + jnp.tril(low, -1).T
