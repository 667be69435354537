"""Eigenvalue-corrected Kronecker factorization (EFB / EKFAC).

Behavioral parity with the reference's ``EFB`` (curvatures.py:395-460):
KFAC factors are eigendecomposed once at construction
(``get_eigenvectors``: eigh of A + A^T, utils.py:45-60); ``update`` then
accumulates true second moments in the Kronecker eigenbasis

    state  += (U_G^T @ grads @ U_A)^2
    diags  += grads^2 * batch_size          (a free Diagonal, README.rst:246)

with grads the [out, fan_in+1] matrix-view gradient of the mean loss per MC
sample. ``invert`` is elementwise; ``sample`` scales noise in the eigenbasis
and rotates out.

PERF note: the eigenvector pytree is threaded through every jitted transform
as an argument (inside the update carry and inside ``inv_state``) — closing
over it via ``self`` would embed it as XLA constants that this backend
re-stages per call.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import Estimator
from curvature_tpu.estimators.capture import Captured
from curvature_tpu.ops.linalg import eigh_sym


def kfac_eigenvectors(kfac_state: Dict, dtype=jnp.float32) -> Dict:
    """Eigenvectors of each layer's KFAC factors (reference utils.py:45-60).

    Same-shaped factors across layers are stacked and eigendecomposed by
    one batched eigh per distinct dimension (ResNet stages share factor
    shapes) — fewer compiled ops and better device utilization than the
    reference's per-layer loop.

    Returns {name: {'a': U_A [cols, cols], 'g': U_G [out, out]}}.
    """
    from curvature_tpu.ops.linalg import group_by_shape, ungroup

    flat = {}
    for name, fac in kfac_state.items():
        flat[f"{name}::a"] = fac["a"].astype(dtype)
        flat[f"{name}::g"] = fac["g"].astype(dtype)
    vecs = {}
    for names, stacked in group_by_shape(flat):
        _, u = eigh_sym(stacked)
        for i, n in enumerate(names):
            vecs[n] = u[i]
    out = {}
    for name in kfac_state:
        out[name] = {"a": vecs[f"{name}::a"], "g": vecs[f"{name}::g"]}
    return out


class EFB(Estimator):

    need_probe_grads = False

    def __init__(self, model, variables, kfac_state: Dict,
                 layer_types=None, dtype=jnp.float32, compute_dtype=None,
                 loss: str = "cross_entropy", layer_filter=None):
        self.eigvecs: Dict = {}
        self.diags: Dict[str, jax.Array] = {}
        super().__init__(model, variables, layer_types, dtype,
                         compute_dtype=compute_dtype, loss=loss,
                         layer_filter=layer_filter)
        missing = set(self.metas) - set(kfac_state)
        if missing:
            raise ValueError(f"KFAC factors missing for layers: {sorted(missing)}")
        # only the tracked subset gets eigendecomposed — with a layer_filter
        # the (possibly full-network) kfac_state may carry extra layers
        kfac_state = {n: kfac_state[n] for n in self.metas}
        for name, fac in kfac_state.items():
            meta = model.metas.get(name)
            stacked = getattr(meta, "stacked", 0)
            grouped = getattr(meta, "groups", 1) > 1
            # square per-layer factors are [out, out] (or [depth, out, out]
            # for ScanBlocks layers, [groups, ., .] for grouped convs);
            # qkv-split / head-split factors add block axes (and head-split
            # out_proj carries an a_bias block)
            want = 3 if (stacked or grouped) else 2
            if jnp.ndim(fac["g"]) != want or jnp.ndim(fac["a"]) != want \
                    or "a_bias" in fac:
                raise ValueError(
                    f"{name}: split KFAC factors (attention_qkv_split / "
                    "attention_head_split / blocked-G vocab heads) are "
                    "KFAC-only; EFB/INF need square per-layer (or "
                    "per-group) factors")
        self.eigvecs = jax.jit(kfac_eigenvectors)(kfac_state)
        self.diags = {
            name: jnp.zeros(((m.stacked,) if m.stacked else ())
                            + (m.out_features, m.mat_cols), dtype)
            for name, m in self.metas.items()
        }

    @staticmethod
    def _lam_shape(m) -> tuple:
        """Eigenbasis second-moment shape: [out, cols] per layer, with a
        leading depth axis for ScanBlocks layers and per-group blocks
        [groups, out/groups, cols] for grouped convs."""
        if getattr(m, "groups", 1) > 1 and m.kind == "conv":
            return (m.groups, m.out_features // m.groups, m.mat_cols)
        return ((m.stacked,) if m.stacked else ()) \
            + (m.out_features, m.mat_cols)

    def init_state(self):
        return {
            name: jnp.zeros(self._lam_shape(m), self.dtype)
            for name, m in self.metas.items()
        }

    def update_state(self, carry, cap: Captured):
        """Carry is (state, diags, eigvecs); both moments accumulate
        (curvatures.py:427-434)."""
        state, diags, eigvecs = carry
        new_state, new_diags = {}, {}
        for name, meta in self.metas.items():
            g = cap.param_grads[name].astype(self.dtype)  # [S(, L), out, cols]
            ua = eigvecs[name]["a"]
            ug = eigvecs[name]["g"]
            if getattr(meta, "groups", 1) > 1 and meta.kind == "conv":
                # grouped conv: rotate each group's [out/g, cols] grad block
                # into its own Kronecker eigenbasis (one batched einsum)
                og = meta.out_features // meta.groups
                gq = g.reshape(g.shape[0], meta.groups, og, meta.mat_cols)
                lam = jnp.einsum("koi,skoc,kca->skia", ug, gq, ua,
                                 preferred_element_type=self.dtype)
            elif meta.stacked:
                lam = jnp.einsum("loi,sloc,lca->slia", ug, g, ua,
                                 preferred_element_type=self.dtype)
            else:
                lam = jnp.einsum("oi,soc,ca->sia", ug, g, ua,
                                 preferred_element_type=self.dtype)
            new_state[name] = state[name] + jnp.sum(lam * lam, axis=0)
            new_diags[name] = diags[name] + cap.batch_size * jnp.sum(g * g, axis=0)
        return new_state, new_diags, eigvecs

    def _carry(self):
        return (self.state, self.diags, self.eigvecs)

    def _set_carry(self, carry):
        # Keep the RETURNED eigvecs: the scan path donates the whole carry
        # (base.py _jit_update_scan, donate_argnums=0), so the input eigvec
        # buffers are invalidated on donation-honoring backends (TPU/GPU).
        # The originals would be deleted arrays after the first chunk.
        self.state, self.diags, self.eigvecs = carry

    def invert_state(self, state, add, multiply):
        inv = {}
        for i, name in enumerate(self.metas):
            inv[name] = jnp.sqrt(1.0 / (multiply[i] * state[name] + add[i]))
        return inv

    def logdet_state(self, state, add, multiply):
        """Precision = U diag(s*lam + n) U^T with orthonormal Kronecker
        eigenvectors U, so logdet = sum log(s*lam + n)."""
        tot = jnp.zeros((), self.dtype)
        for i, name in enumerate(self.metas):
            tot += jnp.sum(jnp.log(multiply[i] * state[name] + add[i]))
        return tot

    def _quad_pure(self, state, add, multiply, deltas, eigvecs):
        """Rotate the offset into the Kronecker eigenbasis and weight by
        the damped eigen-moments: sum((s*lam + n) * (U_G^T d U_A)^2).
        ``eigvecs`` rides as an argument — closure-captured device arrays
        become re-staged HLO constants on this backend."""
        tot = jnp.zeros((), self.dtype)
        for i, (name, meta) in enumerate(self.metas.items()):
            d = deltas[name].astype(self.dtype)
            ua = eigvecs[name]["a"]
            ug = eigvecs[name]["g"]
            w = multiply[i] * state[name] + add[i]        # [(L|g,) out, cols]
            if getattr(meta, "groups", 1) > 1 and meta.kind == "conv":
                og = meta.out_features // meta.groups
                blocks = d.reshape(meta.groups, og, -1)    # [g, og, cols]
                rot = jnp.einsum("kvu,kvc,kcd->kud", ug, blocks, ua)
            else:
                rot = jnp.einsum("...vu,...vc,...cd->...ud", ug, d, ua)
            tot += jnp.sum(w * rot * rot)
        return tot

    def quad_state(self, state, add, multiply, deltas):
        return self._quad_pure(state, add, multiply, deltas, self.eigvecs)

    def quadratic_form(self, deltas, add=0.0, multiply=1.0) -> float:
        from curvature_tpu.estimators.base import normalize_damping
        assert self.state, \
            "State is empty. Did you call 'update' prior to this?"
        add, multiply = normalize_damping(add, multiply, len(self.metas))
        if not hasattr(self, "_jit_quad_pure"):
            self._jit_quad_pure = jax.jit(self._quad_pure)
        return float(self._jit_quad_pure(self.state, add, multiply, deltas,
                                         self.eigvecs))

    def _inv_aux(self):
        return self.eigvecs

    def _wrap_inv_aux(self, inv, aux):
        # attach eigvecs so sampling receives them as a jit argument
        return {"ilam": inv, "eigvecs": aux}

    def solve_state(self, inv_state, deltas):
        """Eigenbasis inverse: P^{-1} d = U diag(ilam^2) U^T d with the
        Kronecker eigenvectors riding in inv_state (see _wrap_inv_aux) and
        ilam = sqrt(1/(m*lam + a)) from invert_state."""
        ilam = inv_state["ilam"]
        eigvecs = inv_state["eigvecs"]
        out = {}
        for name, meta in self.metas.items():
            d = deltas[name].astype(self.dtype)
            ua = eigvecs[name]["a"]
            ug = eigvecs[name]["g"]
            w = ilam[name] ** 2                          # [(L|g,) out, cols]
            if getattr(meta, "groups", 1) > 1 and meta.kind == "conv":
                og = meta.out_features // meta.groups
                blocks = d.reshape(meta.groups, og, -1)
                rot = jnp.einsum("kvu,kvc,kcd->kud", ug, blocks, ua) * w
                back = jnp.einsum("kvu,kud,kcd->kvc", ug, rot, ua)
                out[name] = back.reshape(meta.out_features, -1)
            else:
                rot = jnp.einsum("...vu,...vc,...cd->...ud", ug, d, ua) * w
                out[name] = jnp.einsum("...vu,...ud,...cd->...vc",
                                       ug, rot, ua)
        return out

    def sample_state(self, inv_state, rng) -> Dict[str, jax.Array]:
        ilam = inv_state["ilam"]
        eigvecs = inv_state["eigvecs"]
        out = {}
        for name, meta in self.metas.items():
            rng, key = jax.random.split(rng)
            ua = eigvecs[name]["a"]                        # [(L,) cols, cols]
            ug = eigvecs[name]["g"]                        # [(L,) out, out]
            if getattr(meta, "groups", 1) > 1 and meta.kind == "conv":
                # per-group eigenbasis noise, rotated out and re-stacked
                # group-major to the [out, cols] matrix view
                gct = (meta.groups, ua.shape[-1], ug.shape[-1])
                z = jax.random.normal(key, gct, self.dtype)
                z = z * jnp.swapaxes(ilam[name], -1, -2)   # [g, cols, og]
                blocks = jnp.einsum("kab,kbg,kog->koa", ua, z, ug)
                out[name] = blocks.reshape(meta.out_features, ua.shape[-1])
            elif meta.stacked:
                z = jax.random.normal(
                    key, (meta.stacked, ua.shape[-1], ug.shape[-1]),
                    self.dtype)
                z = z * jnp.swapaxes(ilam[name], -1, -2)   # [L, cols, out]
                out[name] = jnp.einsum("lab,lbg,log->loa", ua, z, ug)
            else:
                z = jax.random.normal(key, (ua.shape[0], ug.shape[0]),
                                      self.dtype)
                z = z * ilam[name].T                       # [cols, out]
                out[name] = (ua @ z @ ug.T).T              # [out, cols]
        return out
