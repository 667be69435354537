"""Fused convolution-patch Gram kernel (Pallas, TPU).

The KFAC A-factor for a conv layer is ``P^T P / N`` where ``P`` is the
unfolded patch matrix ``[N, C*kh*kw(+1)]`` (reference: F.unfold then matmul,
curvatures.py:329-336). The XLA path materializes ``P`` in HBM — for early
ResNet layers that is hundreds of MB of write+read traffic per step. This
kernel streams activation row-strips HBM -> VMEM once, builds the patch tile
on-chip, and accumulates the Gram across the sequential grid, so ``P`` never
exists in HBM.

Scope: stride-1 convs with ``F = C*kh*kw + 1`` small enough that the
[F, F] accumulator fits VMEM (~<=1200). Callers fall back to the XLA patch
path otherwise (larger layers have small spatial extent, where patch
materialization is cheap anyway).

Internal feature order is (dy*kw+dx, c) for contiguous on-chip writes; the
returned matrix is permuted to the canonical (c, dy, dx) order, ones column
last.

Two formulations:
  * :func:`patch_gram` — row-strip grid with manual ANY->VMEM halo DMA.
    Numerically validated in interpret mode but this deployment's remote
    Mosaic compile helper crashes on the manual-DMA pattern; kept for
    toolchains that accept it.
  * :func:`patch_gram_v2` — one whole padded image per grid step through
    the standard pallas pipeline (no manual DMA). Compiles and runs on the
    target TPU; measured 1.4x over the XLA patch path for C=128 3x3 layers
    (slower below C~96, see :func:`patch_gram_v2_supported`'s gate).
    This is the variant KFAC's conv A-factor uses (estimators/kfac.py).
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curvature_tpu.ops.patches import resolve_padding

MAX_F = 1200


def patch_gram_supported(c: int, kernel_size: Tuple[int, int],
                         strides: Tuple[int, int]) -> bool:
    kh, kw = kernel_size
    return strides == (1, 1) and c * kh * kw + 1 <= MAX_F and kh * kw > 1


def patch_gram_v2_supported(c: int, kernel_size: Tuple[int, int],
                            strides: Tuple[int, int], h: int, w: int,
                            itemsize: int = 4) -> bool:
    """Gate for the whole-image kernel: stride 1 or 2, measured-profitable
    channel count (>=96 — below that the XLA patch path wins on this
    hardware), and image + patch buffer + accumulator within the VMEM
    budget."""
    kh, kw = kernel_size
    f1 = c * kh * kw + 1
    if strides not in ((1, 1), (2, 2)) or kh * kw <= 1 or f1 > MAX_F \
            or c < 96:
        return False
    s = strides[0]
    # upper bound incl. SAME padding and the decimation over-pad (stride-1
    # rows/cols rounding)
    hp, wp = h + kh - 1 + (s - 1), w + kw - 1 + (s - 1)
    h_out, w_out = -(-h // s), -(-w // s)  # SAME upper bound
    vmem = hp * wp * c * itemsize + h_out * w_out * f1 * itemsize \
        + f1 * f1 * 4
    return vmem <= 12 * 1024 * 1024


def _kernel(x_hbm, out_ref, strip, p_buf, sem, *, kh, kw, c, tr, wp, w_out,
            h_out, f1):
    b = pl.program_id(0)
    r = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * tr, tr + kh - 1)], strip, sem)
    dma.start()
    dma.wait()

    n_rows = tr * w_out
    # build the patch tile: feature block k = dy*kw + dx holds the shifted
    # window, ones column last
    for dy in range(kh):
        for dx in range(kw):
            k = dy * kw + dx
            view = strip[dy:dy + tr, dx:dx + w_out, :]
            p_buf[:, k * c:(k + 1) * c] = view.reshape(n_rows, c)
    p_buf[:, kh * kw * c:] = jnp.ones((n_rows, f1 - kh * kw * c),
                                      p_buf.dtype)

    # mask rows beyond the valid output height (last row tile)
    valid = (h_out - r * tr)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    mask = (row_ids < valid * w_out).astype(p_buf.dtype)
    p = p_buf[:, :] * mask

    acc = jax.lax.dot_general(
        p, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, r == 0))
    def _():
        out_ref[:, :] = acc

    @pl.when(jnp.logical_not(jnp.logical_and(b == 0, r == 0)))
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


@functools.partial(jax.jit, static_argnames=("kernel_size", "padding",
                                             "interpret"))
def patch_gram(x: jax.Array, kernel_size: Tuple[int, int],
               padding=((0, 0), (0, 0)), interpret: bool = False) -> jax.Array:
    """Sum of patch outer products with an appended ones column.

    Args:
      x: [B, H, W, C] activations.
      kernel_size: (kh, kw); stride is 1.
      padding: explicit ((ph_lo, ph_hi), (pw_lo, pw_hi)) or 'SAME'/'VALID'.

    Returns:
      [F+1, F+1] float32 where F = C*kh*kw, feature order (c, dy, dx),
      ones column last — the *unnormalized* Gram (divide by N outside).
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    ph, pw = resolve_padding(padding, h, w, kernel_size)
    h_out = h + ph[0] + ph[1] - kh + 1
    w_out = w + pw[0] + pw[1] - kw + 1
    f = c * kh * kw
    f1 = f + 1

    tr = min(h_out, max(1, 512 // w_out))      # ~512 patch rows per tile
    n_tiles = -(-h_out // tr)
    # pad so every strip DMA is full-size; masked rows contribute zeros
    pad_h = (ph[0], ph[1] + (n_tiles * tr - h_out))
    xp = jnp.pad(x, ((0, 0), pad_h, pw, (0, 0)))
    wp = xp.shape[2]

    kernel = functools.partial(_kernel, kh=kh, kw=kw, c=c, tr=tr, wp=wp,
                               w_out=w_out, h_out=h_out, f1=f1)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((f1, f1), lambda b_, r_: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f1, f1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tr + kh - 1, wp, c), x.dtype),
            pltpu.VMEM((tr * w_out, f1), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)

    # permute (k, c) feature order -> canonical (c, dy, dx); ones col stays
    k_idx = jnp.arange(f) % (kh * kw)
    c_idx = jnp.arange(f) // (kh * kw)
    perm = jnp.concatenate([k_idx * c + c_idx, jnp.array([f])])
    return out[perm][:, perm]


# ---------------------------------------------------------------------------
# v2: whole-image grid blocks (no manual DMA / halo) — the Mosaic-friendly
# formulation. One grid step = one padded image staged by the standard
# pallas pipeline; patches are built in VMEM scratch and the Gram
# accumulates across the sequential grid.
# ---------------------------------------------------------------------------

def _kernel_v2(x_ref, out_ref, p_buf, *, kh, kw, c, h_out, w_out, f1):
    n_rows = h_out * w_out
    img = x_ref[0]                                  # [Hp, Wp, C]
    for dy in range(kh):
        for dx in range(kw):
            k = dy * kw + dx
            view = img[dy:dy + h_out, dx:dx + w_out, :]
            p_buf[:, k * c:(k + 1) * c] = view.reshape(n_rows, c)
    p_buf[:, kh * kw * c:] = jnp.ones((n_rows, f1 - kh * kw * c), p_buf.dtype)
    p = p_buf[:, :]
    acc = jax.lax.dot_general(
        p, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:, :] = acc

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


def _kernel_v2_strided(x_ref, out_ref, p_buf, *, kh, kw, c, h_out, w_out,
                       f1, sh, sw):
    """Strided windows over a host-side parity stack [sh, sw, H/sh, W/sw, C]:
    window offset (dy, dx) becomes a PLAIN contiguous slice of parity image
    (dy % sh, dx % sw) at start (dy // sh, dx // sw) — no strided slices or
    mid-tile reshapes, which this toolchain's Mosaic rejects (a decimation-
    reshape variant crashed the remote compile worker)."""
    n_rows = h_out * w_out
    img = x_ref[0]                                  # [sh, sw, H2, W2, C]
    for dy in range(kh):
        for dx in range(kw):
            k = dy * kw + dx
            view = img[dy % sh, dx % sw,
                       dy // sh:dy // sh + h_out,
                       dx // sw:dx // sw + w_out, :]
            p_buf[:, k * c:(k + 1) * c] = view.reshape(n_rows, c)
    p_buf[:, kh * kw * c:] = jnp.ones((n_rows, f1 - kh * kw * c), p_buf.dtype)
    p = p_buf[:, :]
    acc = jax.lax.dot_general(
        p, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:, :] = acc

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


@functools.partial(jax.jit, static_argnames=("kernel_size", "padding",
                                             "strides", "interpret"))
def patch_gram_v2(x: jax.Array, kernel_size: Tuple[int, int],
                  padding=((0, 0), (0, 0)), strides: Tuple[int, int] = (1, 1),
                  interpret: bool = False) -> jax.Array:
    """Same contract as :func:`patch_gram`, one image per grid step.
    Supports strided windows (ResNet downsampling convs) via a parity
    stack."""
    b, h, w, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    ph, pw = resolve_padding(padding, h, w, kernel_size, strides)
    h_out = (h + ph[0] + ph[1] - kh) // sh + 1
    w_out = (w + pw[0] + pw[1] - kw) // sw + 1
    f = c * kh * kw
    f1 = f + 1

    if (sh, sw) == (1, 1):
        xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
        hp, wp = xp.shape[1], xp.shape[2]
        kernel = functools.partial(_kernel_v2, kh=kh, kw=kw, c=c,
                                   h_out=h_out, w_out=w_out, f1=f1)
        in_spec = pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        # parity stack: xp[b, i*sh+p0, j*sw+p1, c] -> [b, p0, p1, i, j, c];
        # pad so every window offset's slice stays in bounds (extra rows
        # land on positions no window reads)
        h2 = (kh - 1) // sh + h_out
        w2 = (kw - 1) // sw + w_out
        extra_h = h2 * sh - (h + ph[0] + ph[1])
        extra_w = w2 * sw - (w + pw[0] + pw[1])
        xp = jnp.pad(x, ((0, 0), (ph[0], ph[1] + max(extra_h, 0)),
                         (pw[0], pw[1] + max(extra_w, 0)), (0, 0)))
        xp = xp[:, :h2 * sh, :w2 * sw, :]
        xp = xp.reshape(b, h2, sh, w2, sw, c).transpose(0, 2, 4, 1, 3, 5)
        kernel = functools.partial(_kernel_v2_strided, kh=kh, kw=kw, c=c,
                                   h_out=h_out, w_out=w_out, f1=f1,
                                   sh=sh, sw=sw)
        in_spec = pl.BlockSpec((1, sh, sw, h2, w2, c),
                               lambda i: (i, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((f1, f1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f1, f1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h_out * w_out, f1), x.dtype)],
        interpret=interpret,
    )(xp)

    k_idx = jnp.arange(f) % (kh * kw)
    c_idx = jnp.arange(f) // (kh * kw)
    perm = jnp.concatenate([k_idx * c + c_idx, jnp.array([f])])
    return out[perm][:, perm]


# ---------------------------------------------------------------------------
# tiled: window-offset-blocked Gram — lifts the [F, F] VMEM cap (MAX_F) so
# large-F layers (ResNet-50 layer3/4: F = 2305/4609) run through a kernel.
#
# Key identity: with features ordered (k, c) for window offset k = dy*kw+dx,
# the Gram block (ki, kj) is  slice(ki)^T slice(kj)  where slice(k) is the
# [N, C] window view of the padded image — so a feature tile of kb offsets
# needs only an [N, kb*C] buffer and a [kb*C, kb*C] accumulator in VMEM,
# never the full patch matrix or the full Gram. Offsets are static (the
# grid index selects among pl.when branches of static slices — the
# Mosaic-safe pattern; dynamic-start slices and mid-tile reshapes crash
# this toolchain's remote compile). The ones row/column is assembled
# outside the kernel (exact column sums in XLA, negligible cost).
# ---------------------------------------------------------------------------


def _tiled_copy(dst, img, k, col0, *, kh, kw, c, h_out, w_out, bb, sh, sw):
    """Copy window-offset k's [bb*h_out*w_out, C] slice stack into dst's
    column block starting at col0 (static offsets only; strided layers go
    through the parity-stack layout of _kernel_v2_strided)."""
    hw = h_out * w_out
    dy, dx = k // kw, k % kw
    for bi in range(bb):
        if (sh, sw) == (1, 1):
            view = img[bi, dy:dy + h_out, dx:dx + w_out, :]
        else:
            view = img[bi, dy % sh, dx % sw,
                       dy // sh:dy // sh + h_out,
                       dx // sw:dx // sw + w_out, :]
        dst[bi * hw:(bi + 1) * hw, col0:col0 + c] = view.reshape(hw, c)


def _kernel_tiled(x_ref, out_ref, pi_buf, pj_buf, *, kh, kw, c, h_out,
                  w_out, kb, nt, bb, sh, sw):
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)

    copy = functools.partial(_tiled_copy, kh=kh, kw=kw, c=c, h_out=h_out,
                             w_out=w_out, bb=bb, sh=sh, sw=sw)
    img = x_ref[...]
    for ti in range(nt):
        @pl.when(i == ti)
        def _(ti=ti):
            for t in range(kb):
                copy(pi_buf, img, ti * kb + t, t * c)

        @pl.when(j == ti)
        def _(ti=ti):
            for t in range(kb):
                copy(pj_buf, img, ti * kb + t, t * c)

    acc = jax.lax.dot_general(
        pi_buf[...], pj_buf[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(b == 0)
    def _():
        out_ref[:, :] = acc

    @pl.when(b != 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


def _tiled_layout(c: int, kernel_size: Tuple[int, int], s: int,
                  h_out: int, w_out: int, batch: int, itemsize: int):
    """(kb, nb, bb) for the tiled kernel, or None when it can't fit.

    kb: window offsets per feature tile — the largest divisor of kh*kw
    with kb*C <= 512 AND kb*C a 128-multiple (Mosaic: output tile dims
    must be (8, 128)-multiples or equal the full array), falling back to
    one full-F tile for small C. nb: row bands per image — the Gram is
    additive over token sets, so overlapping row bands stacked on the
    batch axis bound the per-step VMEM for large spatial extents
    (ResNet-50 layer1/2 class). bb: band-images per grid step — as many
    as fit the budget (fattens the GEMM's contraction dim).
    """
    kh, kw = kernel_size
    k = kh * kw
    kb = max((d for d in range(1, k + 1)
              if k % d == 0 and d * c <= 512 and (d * c) % 128 == 0),
             default=None)
    if kb is None and (k * c) ** 2 * 4 <= 4 * 1024 * 1024:
        kb = k                                   # one full-F tile
    if kb is None:
        return None
    acc = (kb * c) ** 2 * 4
    # Mosaic keeps the whole [F, F] f32 output resident in VMEM when it
    # fits (observed: a 1152^2 output was stack-allocated in full and a
    # bf16 bb=4 plan overflowed the 16 MB scoped limit by 52 KB); above
    # that it streams (tf, tf) blocks double-buffered. Budget 13 MB leaves
    # ~3 MB for semaphores/pipeline overhead under the 16 MB limit.
    f = c * k
    out_cost = f * f * 4 if f * f * 4 <= 6 * 1024 * 1024 else 2 * acc
    budget = 13 * 1024 * 1024
    wp = w_out * s + kw - 1 + (s - 1)            # padded-width upper bound

    def cost(hb):
        # input block and patch buffers are pipeline-double-buffered
        img = (hb * s + kh - 1 + (s - 1)) * wp * c * itemsize
        pbuf = hb * w_out * kb * c * itemsize
        return 2 * img + 2 * pbuf

    nb = next((d for d in range(1, h_out + 1)
               if h_out % d == 0 and cost(h_out // d) + out_cost <= budget),
              None)
    if nb is None:
        return None
    per = cost(h_out // nb)
    bb = max((d for d in range(1, batch * nb + 1)
              if (batch * nb) % d == 0 and d * per + out_cost <= budget),
             default=1)
    return kb, nb, bb


def tiled_plan(c: int, kernel_size: Tuple[int, int],
               strides: Tuple[int, int], h: int, w: int, batch: int,
               itemsize: int = 4):
    """Feasibility + layout for :func:`patch_gram_tiled` from the raw conv
    shape (SAME-padding upper bound — the kernel recomputes exactly)."""
    kh, kw = kernel_size
    if kh * kw <= 1 or strides not in ((1, 1), (2, 2)) or c < 32:
        return None
    s = strides[0]
    h_out, w_out = -(-h // s), -(-w // s)
    return _tiled_layout(c, kernel_size, s, h_out, w_out, batch, itemsize)


def patch_gram_tiled_supported(c: int, kernel_size: Tuple[int, int],
                               strides: Tuple[int, int], h: int, w: int,
                               batch: int, itemsize: int = 4) -> bool:
    return tiled_plan(c, kernel_size, strides, h, w, batch, itemsize) \
        is not None


def select_patch_gram(c: int, kernel_size: Tuple[int, int],
                      strides: Tuple[int, int], h: int, w: int,
                      batch: int, itemsize: int = 4):
    """Measured kernel policy: ``'v2'`` | ``'tiled'`` | ``None`` (XLA).

    From the on-chip A/B over every distinct ResNet-50 3x3 conv shape
    (benchmarks/tiled_ab.py, f32, one v5e):

      * stride-2 with C>=96: the whole-image parity-stack kernel wins
        (1.8x over the XLA patch path at C=128);
      * stride-1 shapes whose tiled plan uses multi-offset feature tiles
        (kb > 1, i.e. C <= ~128): the tiled kernel wins (2.1x at C=64 —
        where v2 is gated off — and 1.2x at C=128, where v2 LOSES at 0.9x);
      * single-offset plans (kb == 1, C >= 256, F >= 2305): the XLA patch
        path wins (tiled at 0.6-1.0x) — large-F layers have small spatial
        extent, so patch materialization is cheap and the nt^2 grid's
        repeated image reads are not.

    bf16 (itemsize 2) flips the landscape: XLA's bf16 patch path speeds up
    enough that tiled is neutral on the kb>1 shapes (1.05x / 0.95x), and
    the one kb==1 shape where tiled wins (14x14x256, 1.54x) sits next to a
    shape (7x7x512) whose bf16 Mosaic compile CRASHES this deployment's
    remote compile helper — so bf16 keeps only the stride-2 v2 route
    (1.58x) and leaves the rest to XLA.
    """
    if strides == (2, 2) and patch_gram_v2_supported(
            c, kernel_size, strides, h, w, itemsize):
        return "v2"
    if itemsize < 4:
        return None
    plan = tiled_plan(c, kernel_size, strides, h, w, batch, itemsize)
    if plan is not None and plan[0] > 1:
        return "tiled"
    if patch_gram_v2_supported(c, kernel_size, strides, h, w, itemsize):
        return "v2"
    return None


@functools.partial(jax.jit, static_argnames=("kernel_size", "padding",
                                             "strides", "interpret"))
def patch_gram_tiled(x: jax.Array, kernel_size: Tuple[int, int],
                     padding=((0, 0), (0, 0)),
                     strides: Tuple[int, int] = (1, 1),
                     interpret: bool = False) -> jax.Array:
    """Same contract as :func:`patch_gram` — [F+1, F+1] unnormalized Gram,
    canonical (c, dy, dx) feature order, ones column last — with the Gram
    blocked over window-offset tiles so F is bounded by HBM, not VMEM."""
    b, h, w, c = x.shape
    kh, kw = kernel_size
    sh, sw = strides
    ph, pw = resolve_padding(padding, h, w, kernel_size, strides)
    h_out = (h + ph[0] + ph[1] - kh) // sh + 1
    w_out = (w + pw[0] + pw[1] - kw) // sw + 1
    plan = _tiled_layout(c, kernel_size, sh, h_out, w_out, b,
                         x.dtype.itemsize)
    if plan is None or kh * kw <= 1 \
            or strides not in ((1, 1), (2, 2)) or c < 32:
        raise ValueError("tiled patch-Gram plan infeasible for this shape")
    kb, nb, bb = plan
    n_total_true = b * h_out * w_out

    if nb > 1:
        # row-band the padded image onto the batch axis: the Gram is a sum
        # over tokens, so nb overlapping bands of h_out/nb output rows each
        # reproduce the full Gram exactly while bounding per-step VMEM
        hb = h_out // nb
        xp_full = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
        size = (hb - 1) * sh + kh
        bands = [xp_full[:, bi * hb * sh: bi * hb * sh + size]
                 for bi in range(nb)]
        x = jnp.concatenate(bands, axis=0)       # [nb*b, size, wp, c]
        b, h = nb * b, size
        ph = pw = (0, 0)                         # padding already applied
        h_out = hb

    k = kh * kw
    nt = k // kb
    f = c * k
    f1 = f + 1

    if (sh, sw) == (1, 1):
        xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
        hp, wp = xp.shape[1], xp.shape[2]
        in_spec = pl.BlockSpec((bb, hp, wp, c),
                               lambda i, j, bs: (bs, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        # exact per-offset feature sums for the ones row (XLA, cheap)
        sums = [jnp.sum(xp[:, dy:dy + h_out, dx:dx + w_out, :],
                        axis=(0, 1, 2))
                for dy in range(kh) for dx in range(kw)]
    else:
        h2 = (kh - 1) // sh + h_out
        w2 = (kw - 1) // sw + w_out
        extra_h = h2 * sh - (h + ph[0] + ph[1])
        extra_w = w2 * sw - (w + pw[0] + pw[1])
        xp = jnp.pad(x, ((0, 0), (ph[0], ph[1] + max(extra_h, 0)),
                         (pw[0], pw[1] + max(extra_w, 0)), (0, 0)))
        xp = xp[:, :h2 * sh, :w2 * sw, :]
        xp = xp.reshape(b, h2, sh, w2, sw, c).transpose(0, 2, 4, 1, 3, 5)
        in_spec = pl.BlockSpec((bb, sh, sw, h2, w2, c),
                               lambda i, j, bs: (bs, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sums = [jnp.sum(xp[:, dy % sh, dx % sw,
                           dy // sh:dy // sh + h_out,
                           dx // sw:dx // sw + w_out, :], axis=(0, 1, 2))
                for dy in range(kh) for dx in range(kw)]

    kernel = functools.partial(_kernel_tiled, kh=kh, kw=kw, c=c,
                               h_out=h_out, w_out=w_out, kb=kb, nt=nt,
                               bb=bb, sh=sh, sw=sw)
    tf = kb * c
    core = pl.pallas_call(
        kernel,
        grid=(nt, nt, b // bb),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((tf, tf), lambda i, j, bs: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb * h_out * w_out, tf), x.dtype),
            pltpu.VMEM((bb * h_out * w_out, tf), x.dtype),
        ],
        interpret=interpret,
    )(xp)

    ones_vec = jnp.concatenate(sums).astype(jnp.float32)          # [F]
    n_total = jnp.asarray(n_total_true, jnp.float32)
    top = jnp.concatenate([core, ones_vec[:, None]], axis=1)
    bot = jnp.concatenate([ones_vec, n_total[None]])[None, :]
    out = jnp.concatenate([top, bot], axis=0)                     # [F1, F1]

    k_idx = jnp.arange(f) % k
    c_idx = jnp.arange(f) // k
    perm = jnp.concatenate([k_idx * c + c_idx, jnp.array([f])])
    return out[perm][:, perm]
