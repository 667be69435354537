"""Sparse Information Form (INF): low-rank + diagonal-correction posterior.

Capability parity with the reference's ``INF`` (curvatures.py:463-672), the
ICML-2020 paper's estimator. Inputs: Diagonal state, KFAC factors, EFB
lambdas. Differences from the reference are *derivational*, not behavioral:

  * ``_dim_reduction`` (curvatures.py:602-647) used 1-based index loops; here
    the flat-index -> (A-eigvec, G-eigvec) mapping is vectorized numpy
    (layout: flat k = i*out + j for lambda matrix transposed-flattened).
  * ``_diagonal_accumulator`` (curvatures.py:649-672) looped rows computing
    per-row Kronecker products; the diagonal of (U_A (x) U_G) diag(lam)
    (U_A (x) U_G)^T is exactly ``(U_A^2) Lam (U_G^2)^T`` — one einsum.
  * ``pre_sampler`` (curvatures.py:538-572) materialized the [p, R] Kronecker
    matrix (with a CPU fallback on GPU OOM); ``V^T diag(c^2) V`` factorizes
    over the Kronecker structure into two einsums of cost O(L^2 n m + L^2 m
    M^2) and O(R^2) memory — no p-sized intermediate.
  * the sampler's unvec/revec follows the self-consistent layout
    vec[k = i*m + j] <-> matrix [n, m] (the reference reshapes to [m, n],
    which scrambles indices whenever n != m; our tests validate the sample
    covariance against the dense damped inverse).
"""
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import Estimator
from curvature_tpu.estimators.efb import kfac_eigenvectors
from curvature_tpu.ops.linalg import sym


def dim_reduction(lam_vec: np.ndarray, n: int, m: int, rank: int,
                  max_product: int = 0):
    """Top-|lambda| index selection with index-set product completion.

    Args:
      lam_vec: [n*m] eigenbasis second moments, layout k = i*m + j
        (i: A-side eigenvector index, j: G-side).
      rank: number of top entries to keep before completion.
      max_product: if > 0, cap len(left)*len(right): the completed product
        set can explode to rank^2 on large layers (the reference then
        builds a [p, R] matrix and an RxR factorization at that size,
        curvatures.py:556-570); the cap trims each index set to its
        highest-|lambda|-mass members. 0 keeps exact reference behavior.

    Returns (left_idx [L], right_idx [M], grid_idx [L*M]) as numpy arrays.
    """
    p = lam_vec.shape[0]
    if rank >= p and (max_product <= 0 or p <= max_product):
        left = np.arange(n)
        right = np.arange(m)
    else:
        order = np.argsort(-np.abs(lam_vec), kind="stable")[:min(rank, p)]
        left = np.unique(order // m)
        right = np.unique(order % m)
        if max_product > 0 and len(left) * len(right) > max_product:
            lam_mat = np.abs(lam_vec.reshape(n, m))
            left_mass = lam_mat[:, right].sum(axis=1)
            right_mass = lam_mat[left].sum(axis=0)
            # shrink the larger set first until the product fits
            left = left[np.argsort(-left_mass[left], kind="stable")]
            right = right[np.argsort(-right_mass[right], kind="stable")]
            while len(left) * len(right) > max_product:
                if len(left) >= len(right):
                    left = left[:-1]
                else:
                    right = right[:-1]
            left = np.sort(left)
            right = np.sort(right)
    grid = (left[:, None] * m + right[None, :]).reshape(-1)
    return left, right, grid


def sif_diagonal(ua: jax.Array, ug: jax.Array, lam: jax.Array) -> jax.Array:
    """diag((U_A (x) U_G) diag(lam) (U_A (x) U_G)^T), layout k = i*m + j."""
    n, l = ua.shape
    m, r = ug.shape
    lam_mat = lam.reshape(l, r)
    d = (ua * ua) @ lam_mat @ (ug * ug).T                      # [n, m]
    return d.reshape(-1)


# Module-level jit: reused across layers and update() calls — a fresh
# ``jax.jit(fn)`` wrapper per layer retraces every time (the round-1 INF
# build spent most of its 131 s there and in host-side argsorts).
_sif_diagonal = jax.jit(sif_diagonal)
# stacked (ScanBlocks) variant: one batched program over the depth axis
_sif_diagonal_stacked = jax.jit(jax.vmap(sif_diagonal))


def _bucket(k: int, limit: int, step: int = 8) -> int:
    """Round ``k`` up to a multiple of ``step`` (capped at ``limit``) so
    low-rank shapes are data-independent: layers sharing (n, m) then share
    one compiled sif-diagonal/pre-sampler regardless of their exact index
    counts. Padded slots carry zero lambda, which every downstream consumer
    treats exactly (zero contribution to the diagonal, the Gram, and the
    sampler)."""
    return min(-(-k // step) * step, limit)


def _pad_indices(idx: np.ndarray, size: int, limit: int) -> np.ndarray:
    """Pad a sorted unique index set to ``size`` with unused indices."""
    if len(idx) == size:
        return idx
    free = np.setdiff1d(np.arange(limit), idx, assume_unique=True)
    return np.concatenate([idx, free[:size - len(idx)]])


def _safe_reg_lambda(multiply, lam):
    """sqrt(multiply * lam) with a zero (not NaN) multiply-gradient at
    lam == 0: bucketed index sets (INF.update bucket > 1) pad with
    exactly-zero lambdas, and the raw sqrt's derivative at 0 is inf, so
    inf * 0 = NaN poisons marglik gradient tuning through inf_logdet."""
    pos = lam > 0
    return jnp.where(pos, jnp.sqrt(multiply * jnp.where(pos, lam, 1.0)), 0.0)


def _vtv_gram(ua: jax.Array, ug: jax.Array, reg_lambda: jax.Array,
              inv_corr: jax.Array) -> jax.Array:
    """vtv = S (V^T diag(inv_corr^2) V) S for V = U_A (x) U_G low-rank
    columns and S = diag(reg_lambda) — factorized over the Kronecker
    structure so no p-sized intermediate is built."""
    n, l = ua.shape
    m, r = ug.shape
    big_r = l * r
    c2 = (inv_corr * inv_corr).reshape(n, m)
    w = jnp.einsum("il,ik,ij->lkj", ua, ua, c2,
                   preferred_element_type=ua.dtype)            # [L, L, m]
    t = jnp.einsum("lkj,jr,js->lrks", w, ug, ug,
                   preferred_element_type=ua.dtype)            # [L, M, L, M]
    vtv = reg_lambda[:, None] * t.reshape(big_r, big_r) * reg_lambda[None, :]
    return sym(vtv)


def inf_logdet(ua: jax.Array, ug: jax.Array, reg_lambda: jax.Array,
               inv_corr: jax.Array) -> jax.Array:
    """logdet of D + V S^2 V^T given D^(-1/2) = inv_corr, via the matrix
    determinant lemma: sum log D + logdet(I + S V^T D^-1 V S). The low-rank
    columns V are orthonormal (distinct Kronecker products of eigenvector
    pairs), so the R x R Gram is exactly the pre-sampler's vtv."""
    evals = jnp.linalg.eigvalsh(_vtv_gram(ua, ug, reg_lambda, inv_corr))
    logdet_d = -2.0 * jnp.sum(jnp.log(inv_corr))
    return logdet_d + jnp.sum(jnp.log1p(jnp.maximum(evals, 0.0)))


def pre_sampler(ua: jax.Array, ug: jax.Array, reg_lambda: jax.Array,
                inv_corr: jax.Array) -> jax.Array:
    """The Woodbury cache P_c (reference pre_sampler, curvatures.py:538-572).

    With V = U_A (x) U_G (low-rank columns), c = inv_corr, S = diag(reg_lambda),
    the sampler  M = (I - D^-1 V P_c V^T) D^-1/2  has covariance
    inv(D + V S^2 V^T) iff  Y := S^-1 P_c S^-1  solves

        2 Y - Y vtv Y = (I + vtv)^{-1},     vtv = S (V^T diag(c^2) V) S.

    The solution is the analytic matrix function
    Y = (I + vtv + (I + vtv)^{1/2})^{-1}, computed here with one eigh of the
    R x R Gram matrix. (The reference's two-Cholesky construction,
    curvatures.py:554-570, solves this only where vtv commutes with its
    Cholesky factor — exact for scalars, approximate otherwise; our
    covariance test demands exactness. It also stays finite for singular
    vtv, removing the reference's singular-matrix failure mode.)

    The Gram matrix factorizes over the Kronecker structure — no p-sized
    intermediate is ever built (the reference materializes the [p, R]
    Kronecker matrix with a CPU fallback on OOM, curvatures.py:556-563).
    """
    vtv = _vtv_gram(ua, ug, reg_lambda, inv_corr)
    evals, q = jnp.linalg.eigh(vtv)
    evals = jnp.maximum(evals, 0.0)                            # PSD guard
    y_diag = 1.0 / (1.0 + evals + jnp.sqrt(1.0 + evals))
    l_c = (q * y_diag) @ q.T
    return reg_lambda[:, None] * l_c * reg_lambda[None, :]


def inf_solve(ua, ug, inv_corr, pre, mat):
    """Exact ``P^{-1} @ mat`` with the cached Woodbury pieces: the sampler
    ``M = (I - D^{-1} V P_c V^T) D^{-1/2}`` satisfies ``M M^T = P^{-1}``
    (that is the pre_sampler's defining equation above), so the inverse is
    two passes of the same operator — ``M (M^T v)`` — with no new algebra.
    ``mat`` is the [out, cols] matrix view; internal layout matches
    inf_sample's [cols, out] flattening."""
    n, l = ua.shape
    m, r = ug.shape

    def vpv(x):
        """V P_c V^T applied to a flat [n*m] vector."""
        xq = ua.T @ x.reshape(n, m) @ ug                       # [L, R]
        qx = pre @ xq.reshape(-1)                              # [R]
        return (ua @ qx.reshape(l, r) @ ug.T).reshape(-1)      # [n*m]

    x = mat.T.reshape(-1)
    u = inv_corr * (x - vpv(inv_corr * inv_corr * x))          # M^T x
    y0 = inv_corr * u
    y = y0 - inv_corr * inv_corr * vpv(y0)                     # M u
    return y.reshape(n, m).T                                   # [out, cols]


def inf_sample(ua, ug, inv_corr, pre, key, dtype):
    """One posterior offset, layout-consistent Woodbury application
    (reference sampler, curvatures.py:574-600). Returns [out, cols]."""
    n, l = ua.shape
    m, r = ug.shape
    x = jax.random.normal(key, (n * m,), dtype)
    y_l = inv_corr * x
    xq = ua.T @ y_l.reshape(n, m) @ ug                         # [L, M]
    qx = pre @ xq.reshape(-1)                                  # [R]
    xps = ua @ qx.reshape(l, r) @ ug.T                         # [n, m]
    y_r = (inv_corr * inv_corr) * xps.reshape(-1)
    return (y_l - y_r).reshape(n, m).T                         # [out, cols]


class INF(Estimator):
    """Build from Diagonal + KFAC + EFB outputs; ``update(rank)`` constructs
    the low-rank state, then invert/sample as usual."""

    def __init__(self, model, variables, diags: Dict, kfac_state: Dict,
                 lambdas: Dict, layer_types=None, dtype=jnp.float32,
                 eigvecs: Optional[Dict] = None, layer_filter=None,
                 loss: str = "cross_entropy"):
        if not (set(diags) == set(kfac_state) == set(lambdas)):
            raise ValueError("diags/factors/lambdas must cover the same layers")
        # LAZY: the full eigendecomposition is only needed by update(); the
        # evaluate pipeline loads a saved low-rank state and never calls it,
        # yet previously paid the full eigh (compile + run — the dominant
        # share of the 630 s INF evaluate stage, benchmarks/NOTES.md r3).
        self._eigvecs = eigvecs
        self.lambdas = lambdas
        self.diags = diags
        super().__init__(model, variables, layer_types, dtype, loss=loss,
                         layer_filter=layer_filter)
        self.metas = {n: m for n, m in self.metas.items() if n in diags}
        # validation + the lazy eigh only ever touch the tracked subset
        # (layer_filter may narrow metas below full-network factor files)
        self._kfac_state = {n: kfac_state[n] for n in self.metas}
        for name, fac in self._kfac_state.items():
            meta = model.metas.get(name)
            stacked = getattr(meta, "stacked", 0)
            grouped = getattr(meta, "groups", 1) > 1
            # grouped convs carry per-group block factors [g, ., .]; each
            # group is an independent Kronecker basis, so the whole
            # low-rank chain (selection, sif diagonal, Woodbury) batches
            # over the group axis exactly like the ScanBlocks depth axis
            want = 3 if (stacked or grouped) else 2
            if jnp.ndim(fac["g"]) != want or jnp.ndim(fac["a"]) != want \
                    or "a_bias" in fac:
                # mirror EFB's guard (efb.py __init__): a [3, E, E] split
                # factor would run a batched eigh and produce mis-shaped
                # eigvecs downstream instead of failing loudly (stacked
                # ScanBlocks factors legitimately carry a [depth] axis)
                raise ValueError(
                    f"{name}: split KFAC factors (attention_qkv_split / "
                    "attention_head_split) are KFAC-only; EFB/INF need "
                    "square per-layer factors")
        # eigvecs may be shared from an existing EFB estimator — the largest
        # layers' eigendecompositions dominate the INF build (ResNet-18's
        # 4609^2 layer-4 factors), so recomputing them is pure waste.
        if eigvecs is not None:
            missing = set(self._kfac_state) - set(eigvecs)
            if missing:
                raise ValueError(
                    f"shared eigvecs missing layers: {sorted(missing)}")
            for name, fac in self._kfac_state.items():
                for key in ("a", "g"):
                    want = jnp.shape(fac[key])
                    got = jnp.shape(eigvecs[name][key])
                    if got != want:
                        raise ValueError(
                            f"{name}: eigvecs[{key!r}] shape {got} does not "
                            f"match the KFAC factor {want} — were "
                            "they computed from a different state?")

    @property
    def eigvecs(self) -> Dict:
        if self._eigvecs is None:
            self._eigvecs = jax.jit(kfac_eigenvectors)(self._kfac_state)
        return self._eigvecs

    @staticmethod
    def _is_grouped(meta) -> bool:
        """Grouped/depthwise conv: per-group block factors (see KFAC)."""
        return meta.kind == "conv" and getattr(meta, "groups", 1) > 1

    def init_state(self):
        return {}

    def update(self, rank: int = 100, max_product: int = 0,
               bucket: int = 8):
        """Low-rank reduction + diagonal correction per layer
        (reference curvatures.py:487-507). ``max_product`` bounds the
        completed index-product size on large layers (0 = exact reference
        behavior; see dim_reduction). ``bucket`` rounds the index-set sizes
        up to a multiple (padded slots carry exactly-zero lambda, so the
        posterior is unchanged) — this makes low-rank shapes
        data-independent so same-shaped layers reuse one compiled
        sif-diagonal and pre-sampler instead of compiling per layer
        (default 8; pass ``bucket=1`` for the reference's exact
        data-dependent index-set shapes, curvatures.py:602-672).

        Index selection runs on the host (np.argpartition over the lambda
        vector): on this deployment even a lax.top_k program costs ~30 s of
        remote compile time, dwarfing the O(n*m) host scan, and the
        pipeline's lambdas arrive from disk as host arrays anyway.
        """
        state = {}
        for name, meta in self.metas.items():
            ua_full = self.eigvecs[name]["a"]              # [(L,) cols, cols]
            ug_full = self.eigvecs[name]["g"]              # [(L,) out, out]
            n = ua_full.shape[-1]
            m = ug_full.shape[-1]

            if meta.stacked or self._is_grouped(meta):
                # per-slab index selection (slab = ScanBlocks depth or conv
                # group), padded to one shared bucketed (lb, rb) so the
                # slab axis stacks into single arrays and sif-diagonal /
                # pre-sampler / sampler run as ONE batched program
                # (padded slots carry zero lambda)
                if self._is_grouped(meta):
                    d = meta.groups
                    og = meta.out_features // d
                    lam_all = np.asarray(self.lambdas[name])  # [g, og, cols]
                    # Diagonal state is the [out, cols] matrix view with
                    # group-major rows: group j owns rows j*og..(j+1)*og
                    diag_all = np.asarray(self.diags[name]).reshape(
                        d, og, meta.mat_cols)
                else:
                    d = meta.stacked
                    lam_all = np.asarray(self.lambdas[name])  # [L, out, cols]
                    diag_all = np.asarray(self.diags[name])
                lam_vecs = [lam_all[i].T.reshape(-1) for i in range(d)]
                sel = [self._select(v, n, m, rank, max_product)
                       for v in lam_vecs]
                lb = _bucket(max(len(s[0]) for s in sel), n, bucket)
                rb = _bucket(max(len(s[1]) for s in sel), m, bucket)
                uas, ugs, lams = [], [], []
                for i, (left, right) in enumerate(sel):
                    left_p = _pad_indices(left, lb, n)
                    right_p = _pad_indices(right, rb, m)
                    mask = np.zeros((lb, rb), np.float32)
                    mask[:len(left), :len(right)] = 1.0
                    grid = (left_p[:, None] * m
                            + right_p[None, :]).reshape(-1)
                    uas.append(ua_full[i][:, left_p])
                    ugs.append(ug_full[i][:, right_p])
                    lams.append(jnp.asarray(
                        lam_vecs[i][grid] * mask.reshape(-1)))
                ua = jnp.stack(uas)
                ug = jnp.stack(ugs)
                lam = jnp.stack(lams).astype(self.dtype)
                diag_vec = jnp.asarray(np.stack(
                    [diag_all[i].T.reshape(-1) for i in range(d)]))
                corr = diag_vec.astype(self.dtype) \
                    - _sif_diagonal_stacked(ua, ug, lam)
                state[name] = {"ua": ua, "ug": ug, "lam": lam, "corr": corr}
                continue

            lam_np = np.asarray(self.lambdas[name]).T.reshape(-1)
            lam_vec = jnp.asarray(lam_np)
            diag_vec = jnp.asarray(self.diags[name]).T.reshape(-1)
            left, right = self._select(lam_np, n, m, rank, max_product)

            lb = _bucket(len(left), n, bucket)
            rb = _bucket(len(right), m, bucket)
            left_p = _pad_indices(left, lb, n)
            right_p = _pad_indices(right, rb, m)
            mask = np.zeros((lb, rb), np.float32)
            mask[:len(left), :len(right)] = 1.0
            grid = (left_p[:, None] * m + right_p[None, :]).reshape(-1)

            ua = ua_full[:, left_p]
            ug = ug_full[:, right_p]
            lam = (lam_vec[grid] * mask.reshape(-1)).astype(self.dtype)
            corr = diag_vec.astype(self.dtype) - _sif_diagonal(ua, ug, lam)
            state[name] = {"ua": ua, "ug": ug, "lam": lam, "corr": corr}
        self.state = state
        return state

    @staticmethod
    def _select(lam_np: np.ndarray, n: int, m: int, rank: int,
                max_product: int):
        """Host-side top-|lambda| index-set selection (see update)."""
        p = n * m
        if rank >= p and (max_product <= 0 or p <= max_product):
            return np.arange(n), np.arange(m)
        k = min(rank, p)
        top = np.argpartition(-np.abs(lam_np), k - 1)[:k]
        left = np.unique(top // m)
        right = np.unique(top % m)
        if max_product > 0 and len(left) * len(right) > max_product:
            # large-layer trim: mass-ranked index-set shrink
            left, right, _ = dim_reduction(lam_np, n, m, rank, max_product)
        return left, right

    def invert_state(self, state, add, multiply):
        inv = {}
        shared = {}  # (ua.shape, ug.shape) -> [(i, name)]
        for i, (name, meta) in enumerate(self.metas.items()):
            s = state[name]
            if meta.stacked or self._is_grouped(meta):
                # already one vmapped body over the depth/group axis
                corr = jnp.clip(s["corr"], 0.0)            # curvatures.py:523
                reg_lambda = _safe_reg_lambda(multiply[i], s["lam"])
                inv_corr = jnp.sqrt(1.0 / (multiply[i] * corr + add[i]))
                pre = jax.vmap(pre_sampler)(s["ua"], s["ug"], reg_lambda,
                                            inv_corr)
                inv[name] = {"ua": s["ua"], "ug": s["ug"],
                             "inv_corr": inv_corr, "pre": pre}
            else:
                shared.setdefault((s["ua"].shape, s["ug"].shape),
                                  []).append((i, name))
        # same-shape sharing: bucketed index sets make most plain layers'
        # (ua, ug) shapes collide; stacking those layers and vmapping ONE
        # pre-sampler body collapses the traced program from a subgraph
        # per LAYER to one per SHAPE CLASS — the root cause of the r3
        # 630 s cold-compile INF evaluate (benchmarks/inf_eval_diag.py)
        for members in shared.values():
            ua = jnp.stack([state[n]["ua"] for _, n in members])
            ug = jnp.stack([state[n]["ug"] for _, n in members])
            lam = jnp.stack([state[n]["lam"] for _, n in members])
            corr = jnp.clip(jnp.stack([state[n]["corr"]
                                       for _, n in members]), 0.0)
            adds = jnp.stack([add[i] for i, _ in members])
            muls = jnp.stack([multiply[i] for i, _ in members])
            reg_lambda = _safe_reg_lambda(muls[:, None], lam)
            inv_corr = jnp.sqrt(1.0 / (muls[:, None] * corr
                                       + adds[:, None]))
            pre = jax.vmap(pre_sampler)(ua, ug, reg_lambda, inv_corr)
            for j, (_, name) in enumerate(members):
                inv[name] = {"ua": ua[j], "ug": ug[j],
                             "inv_corr": inv_corr[j], "pre": pre[j]}
        return inv

    def logdet_state(self, state, add, multiply):
        """logdet of the INF posterior precision D_damped + V S^2 V^T —
        exactly the matrix the Woodbury sampler inverts (see inf_logdet)."""
        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            s = state[name]
            corr = jnp.clip(s["corr"], 0.0)                # curvatures.py:523
            reg_lambda = _safe_reg_lambda(multiply[i], s["lam"])
            inv_corr = jnp.sqrt(1.0 / (multiply[i] * corr + add[i]))
            if meta.stacked or self._is_grouped(meta):
                tot += jnp.sum(jax.vmap(inf_logdet)(s["ua"], s["ug"],
                                                    reg_lambda, inv_corr))
            else:
                tot += inf_logdet(s["ua"], s["ug"], reg_lambda, inv_corr)
        return tot

    def quad_state(self, state, add, multiply, deltas):
        """delta^T (D + V S^2 V^T) delta: the diagonal part on the flat
        layout plus the squared low-rank projection (no p-sized matrix)."""
        def one(ua, ug, lam, corr, d_mat, a, m):
            dcorr = m * jnp.clip(corr, 0.0) + a              # [n*m] flat
            yy = d_mat.T                                     # [cols, out]
            y = yy.reshape(-1)
            proj = (ua.T @ yy @ ug).reshape(-1)              # [L*R]
            return jnp.sum(dcorr * y * y) + jnp.sum(m * lam * proj * proj)

        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            s = state[name]
            d = deltas[name].astype(self.dtype)
            if meta.stacked or self._is_grouped(meta):
                if self._is_grouped(meta):
                    og = meta.out_features // meta.groups
                    d = d.reshape(meta.groups, og, -1)
                tot += jnp.sum(jax.vmap(
                    lambda ua, ug, lam, corr, db: one(
                        ua, ug, lam, corr, db, add[i], multiply[i]))(
                        s["ua"], s["ug"], s["lam"], s["corr"], d))
            else:
                tot += one(s["ua"], s["ug"], s["lam"], s["corr"], d,
                           add[i], multiply[i])
        return tot

    def solve_state(self, inv_state, deltas):
        """Exact Woodbury inverse application per layer (see inf_solve);
        stacked / grouped blocks vmap over their leading axis."""
        out = {}
        for name, meta in self.metas.items():
            s = inv_state[name]
            d = deltas[name].astype(self.dtype)
            if meta.stacked or self._is_grouped(meta):
                blocks = d
                if self._is_grouped(meta):
                    og = meta.out_features // meta.groups
                    blocks = d.reshape(meta.groups, og, -1)
                res = jax.vmap(inf_solve)(s["ua"], s["ug"], s["inv_corr"],
                                          s["pre"], blocks)
                out[name] = (res.reshape(meta.out_features, -1)
                             if self._is_grouped(meta) else res)
            else:
                out[name] = inf_solve(s["ua"], s["ug"], s["inv_corr"],
                                      s["pre"], d)
        return out

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        out = {}
        # per-layer keys split in meta order FIRST, so the shape-grouped
        # batching below cannot change any layer's sample stream
        layer_key = {}
        for name in self.metas:
            rng, layer_key[name] = jax.random.split(rng)
        shared = {}  # (ua.shape, ug.shape) -> [name]
        for name, meta in self.metas.items():
            s = inv_state[name]
            if meta.stacked or self._is_grouped(meta):
                d = meta.stacked or meta.groups
                keys = jax.random.split(layer_key[name], d)
                res = jax.vmap(
                    lambda ua, ug, ic, pre, k:
                    inf_sample(ua, ug, ic, pre, k, self.dtype))(
                        s["ua"], s["ug"], s["inv_corr"], s["pre"], keys)
                # grouped: [g, og, cols] blocks re-stack group-major into
                # the layer's [out, cols] matrix view (stacked layers keep
                # their leading depth axis)
                out[name] = (res.reshape(meta.out_features, -1)
                             if self._is_grouped(meta) else res)
            else:
                shared.setdefault((s["ua"].shape, s["ug"].shape),
                                  []).append(name)
        # same-shape layers sample through ONE vmapped body (see
        # invert_state — same compile-count rationale)
        for members in shared.values():
            s = {k: jnp.stack([inv_state[n][k] for n in members])
                 for k in ("ua", "ug", "inv_corr", "pre")}
            keys = jnp.stack([layer_key[n] for n in members])
            res = jax.vmap(
                lambda ua, ug, ic, pre, k:
                inf_sample(ua, ug, ic, pre, k, self.dtype))(
                    s["ua"], s["ug"], s["inv_corr"], s["pre"], keys)
            for j, name in enumerate(members):
                out[name] = res[j]
        return out
