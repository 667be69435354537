"""Nyström low-rank (subspace) Laplace estimator.

Extension beyond the reference: every estimator in DLR-RM/curvature
(curvatures.py:132-657) is layer-local — Diagonal/KFAC/EFB/INF all drop
every cross-layer second moment by construction. This estimator models the
GLOBAL curvature instead: a rank-``R`` approximation of the full GGN/Fisher
over all tracked parameters jointly, built from a *streamed sketch*

    Y  =  F @ Omega,        Omega ~ N(0, 1)^{p x R} fixed,

accumulated batch-by-batch with the exact matrix-free GGN products of
``ops/matfree.py`` (one shared linearization per batch, ``R`` fused
JVP/VJP columns — all MXU matmuls, no [p, p] matrix ever exists). At
``invert`` time the sketch becomes the randomized Nyström approximation

    F  ~=  Y (Omega^T Y)^+ Y^T  =  U diag(lam) U^T            (rank R)

via the shifted single-pass factorization of Tropp et al. 2017 ("Fixed-rank
approximation of a PSD matrix from streaming data", Alg. 3), which is exact
whenever rank(F) <= R. The damped posterior precision then has the standard
low-rank-plus-diagonal form

    P  =  D + M^{1/2} U diag(lam) U^T M^{1/2},

with per-layer damping D = diag(add_l) and curvature scale M = diag(mult_l)
(the same two-knob damping every other estimator here uses), and sampling /
log-determinant / quadratic form are all CLOSED FORM and exact for this P:

    sample   x = D^{-1/2} (I + W K W^T) eps,   W = D^{-1/2} M^{1/2} U lam^{1/2}
    logdet P   = sum_l n_l log(add_l) + sum_r log(1 + s_r^2)
    d^T P d    = sum_l add_l ||d_l||^2 + || lam^{1/2} U^T M^{1/2} d ||^2

where s^2 are the eigenvalues of W^T W (an [R, R] problem) and
K = V diag(((1+s^2)^{-1/2} - 1)/s^2) V^T, so (I + W K W^T) = (I + W W^T)^{-1/2}
exactly — no Monte-Carlo square roots, no truncation beyond the Nyström
approximation itself.

This is the Laplace-family analogue of the low-rank posteriors in SWAG
(Maddox et al. 2019) and laplace-torch's LowRankLaplace, but streamed (no
dataset-sized eigensolve) and with the label expectation taken analytically
(the GGN equals the model-distribution Fisher for softmax cross-entropy /
unit-variance Gaussian heads), so ``update`` needs no MC label draws at all.

State per layer is ``{"omega": [R, *view], "sketch": [R, *view]}`` in the
estimators' matrix view ([out, fan_in(+1 bias col)]; stacked ScanBlocks /
MoE layers carry their leading depth/expert axis) — the probe rides the
saved factors so a reloaded state reproduces the posterior bit-exactly.
Memory is 2 p R floats; use ``layer_filter`` (e.g. ``'last'``) or modest
ranks for very large models.
"""
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import Estimator
from curvature_tpu.nn.core import Model, param_matrix
from curvature_tpu.ops import matfree

__all__ = ["Subspace"]


class Subspace(Estimator):
    """Global low-rank GGN Laplace via a streamed Nyström sketch."""

    # capture is never used — the GGN products run their own linearization
    need_param_grads = False
    need_probe_grads = False

    def __init__(self,
                 model: Model,
                 variables: Dict,
                 rank: int = 16,
                 omega_seed: int = 0,
                 layer_types: Optional[Union[str, Sequence[str]]] = None,
                 dtype=jnp.float32,
                 compute_dtype=None,
                 loss: str = "cross_entropy",
                 layer_filter: Optional[Union[str, Sequence[str]]] = None):
        # loss='lm' stays 'lm': base.update keys label normalization on it
        # ([B, T] token labels -> [1, B, T], so _step's sample-count weight
        # is S, not B) and use_mesh keys the seq-axis label sharding on it.
        # The CE GGN itself is rank-polymorphic — matfree._h_apply falls
        # through to the softmax branch for every non-gaussian loss, and
        # [B, T, V] logits flatten to B*T token observations below.
        self.rank = int(rank)
        if self.rank < 1:
            raise ValueError(f"rank must be >= 1, got {rank}")
        self.omega_seed = int(omega_seed)
        super().__init__(model, variables, layer_types=layer_types,
                         dtype=dtype, compute_dtype=compute_dtype, loss=loss,
                         layer_filter=layer_filter)

    # -- state ----------------------------------------------------------------
    def init_state(self):
        # a sketch wider than the tracked parameter count makes Omega^T Omega
        # singular (the shifted Cholesky then NaNs); R = p is already exact
        shapes = matfree.delta_shapes(self.metas)
        p_total = sum(int(jnp.prod(jnp.asarray(s))) for s in shapes.values())
        self.rank = min(self.rank, p_total)
        key = jax.random.PRNGKey(self.omega_seed)
        state = {}
        for name, shape in shapes.items():
            key, sub = jax.random.split(key)
            omega = jax.random.normal(sub, (self.rank,) + shape, self.dtype)
            state[name] = {"omega": omega,
                           "sketch": jnp.zeros_like(omega)}
        return state

    # -- sketch update (replaces the capture-based step hooks) ----------------
    def _accumulate(self, state, variables, x, weight):
        """Fold one batch into the sketch: R exact GGN columns F_batch @
        omega sharing ONE forward linearization (matfree.ggn_matvec
        semantics: batch-mean GGN, [B, T, V] logits flatten to B*T token
        observations exactly like the capture path)."""
        variables, x = self._cast_compute(variables, x)
        params, f = matfree._forward_fn(self.model, variables, x, train=True)
        logits, f_lin = jax.linearize(f, params)
        transpose = jax.linear_transpose(f_lin, params)
        flat_obs = 1
        for d in logits.shape[:-1]:
            flat_obs *= d
        lead = logits.shape[:-1]
        logits2d = logits.reshape((flat_obs, logits.shape[-1]))

        def one(col):
            u = f_lin(matfree._tangent(self.metas, params, col))
            hu = matfree._h_apply(self.loss, logits2d,
                                  u.reshape(logits2d.shape))
            (g,) = transpose(hu.reshape(lead + (hu.shape[-1],)))
            return {n: param_matrix(self.metas[n], g[n]).astype(self.dtype)
                    for n in self.metas}

        cols = jax.vmap(one)({n: state[n]["omega"] for n in self.metas})
        # convention shared with every estimator: state/(updates*samples)
        # converges to the batch-mean Fisher (see ops/matfree.py docstring)
        scale = jnp.asarray(weight, self.dtype) / flat_obs
        return {n: {"omega": state[n]["omega"],
                    "sketch": state[n]["sketch"] + scale * cols[n]}
                for n in self.metas}

    def _step(self, state, variables, x, labels):
        # the GGN takes the label expectation analytically — explicit labels
        # only set the sample-count weight for scale parity with MC updates
        weight = labels.shape[0] if hasattr(labels, "shape") else 1
        return self._accumulate(state, variables, x, weight)

    def _step_rng(self, state, variables, x, rng, num_samples):
        del rng  # exact expectation: nothing is drawn
        return self._accumulate(state, variables, x, num_samples)

    def _step_rng_meshed(self, state, variables, x, rng, num_samples):
        del rng
        return self._accumulate(state, variables, x, num_samples)

    # -- mesh rules -----------------------------------------------------------
    def _tp_ok(self, name, meta):
        # the Nyström eigenbasis couples all layers; keep state replicated
        # (data/sample/seq sharding of the sketch updates still applies)
        return False

    def _state_leaf_spec(self, name, keys, shape, ax):
        # leaves are [R, *view]: the stack axis sits at index 1, and the
        # global invert contracts over it — replicate everything
        return [None] * len(shape)

    # -- Nyström factorization (Tropp et al. 2017, Alg. 3, shifted) -----------
    def _nystrom(self, state):
        names = list(self.metas)
        Y = {n: state[n]["sketch"].reshape(self.rank, -1) for n in names}
        Om = {n: state[n]["omega"].reshape(self.rank, -1) for n in names}
        ynorm = jnp.sqrt(sum(jnp.sum(Y[n] * Y[n]) for n in names))
        nu = jnp.finfo(self.dtype).eps * ynorm + jnp.finfo(self.dtype).tiny
        Ynu = {n: Y[n] + nu * Om[n] for n in names}
        C = sum(jnp.einsum("rn,sn->rs", Om[n], Ynu[n]) for n in names)
        C = 0.5 * (C + C.T)
        # clipped-eigh pseudoinverse instead of Tropp's Cholesky solve:
        # when R approaches the tracked parameter count, sigma_min(Om^T Om)
        # collapses (Marchenko-Pastur) and the shifted Cholesky NaNs in f32;
        # the clipped modes carry no curvature (lam ~ 0) so dropping them
        # is exact in the limit
        c, E = jnp.linalg.eigh(C)
        tol = self.rank * jnp.finfo(self.dtype).eps * jnp.maximum(
            c[-1], 0.0) + jnp.finfo(self.dtype).tiny
        c_inv_sqrt = jnp.where(
            c > tol, 1.0 / jnp.sqrt(jnp.maximum(c, tol)), 0.0)
        B = {n: c_inv_sqrt[:, None] * (E.T @ Ynu[n]) for n in names}
        M = sum(jnp.einsum("rn,sn->rs", B[n], B[n]) for n in names)
        s2, V = jnp.linalg.eigh(M)
        s2 = jnp.maximum(s2, 0.0)
        lam = jnp.maximum(s2 - nu, 0.0)
        inv_s = jnp.where(s2 > 0, 1.0 / jnp.sqrt(s2 + jnp.finfo(
            self.dtype).tiny), 0.0)
        U = {n: inv_s[:, None] * (V.T @ B[n]) for n in names}  # rows=eigvecs
        return U, lam

    def _low_rank_spectrum(self, state, add, multiply):
        """Eigenvalues s2 of W^T W plus the pieces sampling needs."""
        U, lam = self._nystrom(state)
        W = {}
        for i, name in enumerate(self.metas):
            W[name] = jnp.sqrt(multiply[i] / add[i]) * \
                jnp.sqrt(lam)[:, None] * U[name]
        G = sum(jnp.einsum("rn,sn->rs", W[n], W[n]) for n in W)
        s2w, Vw = jnp.linalg.eigh(G)
        s2w = jnp.maximum(s2w, 0.0)
        return U, lam, W, s2w, Vw

    # -- posterior ------------------------------------------------------------
    def invert_state(self, state, add, multiply):
        U, lam, W, s2w, Vw = self._low_rank_spectrum(state, add, multiply)
        # (I + W W^T)^{-1/2} = I + W K W^T with K below; the ratio
        # ((1+s)^{-1/2} - 1)/s -> -1/2 smoothly as s -> 0, so zero modes
        # are handled without ever normalizing a zero-length direction
        ratio = jnp.where(
            s2w > 0,
            (1.0 / jnp.sqrt(1.0 + s2w) - 1.0) / jnp.where(s2w > 0, s2w, 1.0),
            -0.5)
        K = (Vw * ratio) @ Vw.T
        # stack (not asarray): damping entries may be tracers under the
        # hyperopt pipeline's vmapped batched evaluator
        inv = {"k": K,
               "dinv_sqrt": jnp.stack(
                   [1.0 / jnp.sqrt(jnp.asarray(a, self.dtype))
                    for a in add])}
        for i, name in enumerate(self.metas):
            shape = state[name]["sketch"].shape
            inv[f"w::{name}"] = W[name].reshape(shape)
        return inv

    def _apply_sqrt(self, inv_state, eps: Dict[str, jax.Array]):
        """The exact covariance square root: x = D^{-1/2}(I + W K W^T) eps,
        so cov(x) = P^{-1} for standard-normal eps. Split out from
        :meth:`sample_state` so tests can drive it with basis vectors."""
        t = jnp.zeros((self.rank,), self.dtype)
        for name in self.metas:
            t = t + jnp.einsum("r...,...->r", inv_state[f"w::{name}"],
                               eps[name])
        y = inv_state["k"] @ t
        out = {}
        for i, name in enumerate(self.metas):
            w = inv_state[f"w::{name}"]
            out[name] = (eps[name] + jnp.einsum("r...,r->...", w, y)) \
                * inv_state["dinv_sqrt"][i]
        return out

    def solve_state(self, inv_state, deltas):
        """P^{-1} d = A (A^T d) with the sampling square root A =
        D^{-1/2}(I + W K W^T): (I + W K W^T) is symmetric, so A^T applies
        the damping scale first and the low-rank correction second."""
        def correct(v):
            t = jnp.zeros((self.rank,), self.dtype)
            for name in self.metas:
                t = t + jnp.einsum("r...,...->r", inv_state[f"w::{name}"],
                                   v[name])
            y = inv_state["k"] @ t
            return {name: v[name] + jnp.einsum(
                "r...,r->...", inv_state[f"w::{name}"], y)
                for name in self.metas}

        dinv = inv_state["dinv_sqrt"]
        u = correct({n: deltas[n].astype(self.dtype) * dinv[i]
                     for i, n in enumerate(self.metas)})
        out = correct(u)
        return {n: out[n] * dinv[i] for i, n in enumerate(self.metas)}

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        eps = {}
        for name in self.metas:
            rng, key = jax.random.split(rng)
            eps[name] = jax.random.normal(
                key, inv_state[f"w::{name}"].shape[1:], self.dtype)
        return self._apply_sqrt(inv_state, eps)

    def logdet_state(self, state, add, multiply):
        _, _, _, s2w, _ = self._low_rank_spectrum(state, add, multiply)
        tot = jnp.sum(jnp.log1p(s2w))
        for i, name in enumerate(self.metas):
            n_l = state[name]["sketch"][0].size
            tot = tot + n_l * jnp.log(jnp.asarray(add[i], self.dtype))
        return tot

    def quad_state(self, state, add, multiply, deltas):
        U, lam = self._nystrom(state)
        tot = jnp.zeros((), self.dtype)
        proj = jnp.zeros((self.rank,), self.dtype)
        for i, name in enumerate(self.metas):
            d = deltas[name].astype(self.dtype)
            tot = tot + add[i] * jnp.sum(d * d)
            proj = proj + jnp.sqrt(multiply[i]) * jnp.einsum(
                "rn,n->r", U[name], d.reshape(-1))
        return tot + jnp.sum(lam * proj * proj)

    # -- diagnostics -----------------------------------------------------------
    def eigenvalues(self):
        """Nyström eigenvalues of the RAW accumulated curvature (divide by
        updates*samples for the batch-mean Fisher spectrum)."""
        _, lam = self._nystrom(self.state)
        return lam
