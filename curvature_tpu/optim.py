"""KFAC-preconditioned training (natural-gradient descent).

Extension beyond the reference (which only *analyzes* trained networks):
the same Kronecker factor machinery that builds the Laplace posterior
doubles as a second-order optimizer preconditioner (Martens & Grosse,
2015). Per tracked layer the gradient matrix ``[out, cols]`` is
preconditioned with the inverted damped factors the sampler already
computes,

    precond(G) = (G_d)^-1  Gmat  (A_d)^-1
               = g_chol g_chol^T  Gmat  a_chol a_chol^T,

and the result feeds any optax transformation (momentum, weight decay,
schedules compose unchanged). Untracked parameters (BatchNorm scales,
biases of untracked layers) keep their plain gradients. Factors are
EMA-smoothed — optimization wants *recent* curvature, unlike the Laplace
accumulation's running sum — and re-inverted every ``invert_every`` steps
inside the jitted step (``lax.cond``; no recompilation, no host sync).

TPU notes: the whole step (forward, backward, factor Grams, EMA, optional
re-inversion, optax update) is ONE jitted program — XLA overlaps the
factor GEMMs with the parameter update, and the periodic eigendecomposition
-free Cholesky re-inversion keeps the MXU busy instead of round-tripping
to host like hook-based KFAC implementations.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.estimators.base import normalize_damping
from curvature_tpu.estimators.capture import collect, softmax_cross_entropy
from curvature_tpu.nn.core import matrix_to_delta, param_matrix


def precondition(metas: Dict, inv_state: Dict, grads: Dict) -> Dict:
    """Apply the inverse damped Kronecker factors to a gradient pytree.

    Tracked layers get ``G_d^-1 Gmat A_d^-1`` (grouped convs per group
    block); everything else passes through unchanged. Split attention
    factors (qkv/head) are a posterior-only structure — use plain factors
    for optimization.
    """
    new = dict(grads)
    for name, meta in metas.items():
        if name not in inv_state:
            continue
        inv = inv_state[name]
        a_chol, g_chol = inv["a_chol"], inv["g_chol"]
        gmat = param_matrix(meta, grads[name])         # [(L,) out, cols]
        grouped = meta.kind == "conv" and getattr(meta, "groups", 1) > 1
        # structural guard: split attention factors (qkv G [3,E,E], head-
        # split G [3,H,d,d] / A [H,d,d] (+ bias block)) carry EXTRA block
        # axes over the plain/stacked/grouped base rank — they are a
        # posterior-only layout; falling through would die with a cryptic
        # einsum shape error deep inside jit
        base = 2 + (1 if meta.stacked else 0) + (1 if grouped else 0)
        if "a_bias_chol" in inv or jnp.ndim(a_chol) != base \
                or jnp.ndim(g_chol) != base:
            raise ValueError(f"{name}: split attention factors (qkv/head) "
                             "are posterior-only; build the optimizer KFAC "
                             "without attention_qkv_split/head_split")
        if grouped:
            og = meta.out_features // meta.groups
            blocks = gmat.reshape(meta.groups, og, -1)  # [g, og, cols]
            pg = jnp.einsum("gue,gve,gvc,gcd,gfd->guf",
                            g_chol, g_chol, blocks, a_chol, a_chol)
            pmat = pg.reshape(meta.out_features, -1)
        else:
            # batched over an optional leading depth axis (ScanBlocks)
            pg = jnp.einsum("...ue,...ve,...vc->...uc", g_chol, g_chol, gmat)
            pmat = jnp.einsum("...uc,...cd,...fd->...uf", pg, a_chol, a_chol)
        new[name] = {
            k: v.astype(grads[name][k].dtype)
            for k, v in matrix_to_delta(meta, pmat).items()
        }
        # matrix_to_delta only emits kernel/bias; keep any other leaves
        for k in grads[name]:
            if k not in new[name]:
                new[name][k] = grads[name][k]
    return new


def make_kfac_train_step(model, est, tx, ema: float = 0.95,
                         damping: float = 1e-2, fisher_scale: float = 1.0,
                         invert_every: int = 10,
                         mc_fisher: bool = True,
                         mesh=None, data_axis: str = "data"):
    """One jitted natural-gradient step.

    ``est`` is a fitted-or-fresh ``estimators.KFAC`` over the layers to
    precondition (its ``layer_filter`` restricts preconditioning to a
    subnetwork). ``mc_fisher=True`` draws one model-distribution label per
    step (true Fisher); ``False`` reuses the training labels (empirical
    Fisher, one fewer backward). Returns ``step(params, opt_state,
    factors, inv, stats, count, x, y, rng)`` -> updated tuple + loss, and
    an ``init(params)`` helper for the carried state.
    """
    metas = est.metas

    def batch_factors(variables, x, y, rng):
        if mc_fisher:
            cap = collect(model, metas, variables, x, rng=rng,
                          num_samples=1, train=True,
                          need_param_grads=False, need_probe_grads=True)
        else:
            cap = collect(model, metas, variables, x, labels=y[None],
                          train=True, need_param_grads=False,
                          need_probe_grads=True)
        return est.update_state(est.init_state(), cap)

    def loss_grads(params, stats, x, y):
        def loss_fn(p):
            logits, aux = model.apply({"params": p, "batch_stats": stats},
                                      x, train=True)
            return softmax_cross_entropy(logits, y), aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, aux["batch_stats"]

    def _step(params, opt_state, factors, inv, stats, count, x, y, rng):
        import optax
        loss, grads, new_stats = loss_grads(params, stats, x, y)
        fresh = batch_factors({"params": params, "batch_stats": stats},
                              x, y, rng)
        factors = jax.tree_util.tree_map(
            lambda old, new: ema * old + (1.0 - ema) * new, factors, fresh)

        def reinvert(_):
            add, mult = normalize_damping(damping, fisher_scale,
                                          len(metas))
            return est.invert_state(factors, add, mult)

        inv = jax.lax.cond(count % invert_every == 0, reinvert,
                           lambda _: inv, None)
        merged = dict(stats)
        merged.update(new_stats)
        pgrads = precondition(metas, inv, grads)
        updates, opt_state = tx.update(pgrads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, factors, inv, merged, count + 1, loss

    jit_plain = jax.jit(_step)
    if mesh is not None:
        # batch sharded over the data axis, everything else replicated —
        # GSPMD turns the gradient/factor reductions into psums over ICI
        # (the reference threads --parallel into training, training.py:26-27)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(data_axis))
        jit_sharded = jax.jit(
            _step, in_shardings=(rep, rep, rep, rep, rep, rep, sh, sh, rep),
            out_shardings=rep)

    def step(params, opt_state, factors, inv, stats, count, x, y, rng):
        fn = jit_plain
        if mesh is not None and x.shape[0] % mesh.shape[data_axis] == 0:
            fn = jit_sharded
        return fn(params, opt_state, factors, inv, stats, count, x, y, rng)

    def init(variables, x0, y0, rng):
        """Initial (factors, inv) from one real batch so step 0's cond has
        a structurally identical carry."""
        factors = batch_factors(variables, x0, y0, rng)
        add, mult = normalize_damping(damping, fisher_scale, len(metas))
        inv = jax.jit(est.invert_state)(factors, add, mult)
        return factors, inv

    return step, init
