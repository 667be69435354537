"""Estimator-fidelity diagnostics against the exact (matrix-free) Fisher.

The factor states are Monte-Carlo estimates of the layer-block Fisher: after
``U`` update calls with ``S`` label samples each, ``E[state] = U*S*F_block``
(score expectation is zero under the model distribution, so the batch-mean
gradient outer products are unbiased for the per-input Fisher mean — see
estimators/base.py update scaling and capture.py's 1/B cotangents). The
exact block Fisher is the GGN, computable matrix-free (ops/matfree.py), so
each estimator's structural approximation quality is directly measurable:
compare the estimator's undamped quadratic form against the exact one on
random probes restricted to each layer's block.

The reference has no analogue — its only curvature introspection
eigendecomposes the KFAC factors themselves (reference utils.py:21-60),
which cannot see the factorization error.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from curvature_tpu.ops.matfree import delta_shapes, ggn_quad

__all__ = ["fidelity_report"]


def fidelity_report(est,
                    x: jax.Array,
                    rng: jax.Array,
                    num_probes: int = 8,
                    norm: float = 1.0,
                    train: bool = True,
                    layers: Optional[list] = None,
                    joint: bool = False) -> Dict[str, Dict]:
    """Per-layer relative error of the estimator's implied Fisher.

    Args:
      est: a fitted estimator (``update`` already accumulated factors).
      x: a representative batch — the exact Fisher is evaluated on it, so use
        (a subset of) the same data the factors were fit on.
      norm: updates*samples accumulated into ``est.state`` (the factor states
        are raw running sums, reference curvatures.py:346-350; dividing by
        ``norm`` puts them in per-update-per-sample Fisher units).
      layers: restrict to these layer names (default: all tracked).

    Returns ``{layer: {"rel_err", "scaled_rel_err", "alpha", "q_true",
    "q_est"}}``:

      * ``rel_err`` — probe-averaged ``|q_est/norm - q_true| / |q_true|``.
        Meaningful for the LINEAR accumulators (Diagonal, BlockDiagonal,
        EFB's free diags), whose state is ``norm * F + MC noise``.
      * ``joint=True`` adds a ``"__joint__"`` row probed across ALL tracked
        layers simultaneously. Layer-local estimators (everything except
        ``Subspace``) answer with the sum of their block quadratic forms —
        the residual against the exact full-network GGN is exactly the
        cross-layer curvature they drop by construction, which the global
        low-rank ``Subspace`` sketch retains.
      * ``alpha``/``scaled_rel_err`` — the least-squares scalar fit
        ``alpha = argmin sum(alpha*q_est - q_true)^2`` over the probes and
        the residual error under it. This is the SCALE-FREE structural error
        (diagonal / Kronecker / eigenbasis / low-rank approximation quality):
        KFAC-family states are products of running sums, so their overall
        scale grows quadratically in update count and is absorbed by the
        damping-scale hyperparameter anyway (the reference's wildly different
        best ``scale`` per estimator, README.rst:259-267).

    Monte-Carlo noise in the factors contributes O(1/sqrt(norm)) even for an
    exact estimator (BlockDiagonal); what remains beyond that is structural.
    """
    metas = est.metas
    names = list(metas) if layers is None else list(layers)
    unknown = [n for n in names if n not in metas]
    if unknown:
        raise ValueError(f"not tracked by this estimator: {unknown}")
    shapes = delta_shapes(metas)
    report = {}

    def one_row(rng, probe_names):
        errs, q_trues, q_ests = [], [], []
        for _ in range(num_probes):
            rng, key = jax.random.split(rng)
            probes = {}
            for n in probe_names:
                key, sub = jax.random.split(key)
                probes[n] = jax.random.rademacher(sub, shapes[n],
                                                  jnp.float32)
            deltas = {n: probes.get(n, jnp.zeros(shapes[n], jnp.float32))
                      for n in metas}
            q_true = float(ggn_quad(est.model, metas, est.variables, x,
                                    probes, loss=est.loss, train=train))
            q_est = float(est.quadratic_form(deltas, add=0.0,
                                             multiply=1.0)) / norm
            errs.append(abs(q_est - q_true) / (abs(q_true) + 1e-30))
            q_trues.append(q_true)
            q_ests.append(q_est)
        qt = jnp.asarray(q_trues)
        qe = jnp.asarray(q_ests)
        alpha = float(jnp.sum(qe * qt) / (jnp.sum(qe * qe) + 1e-30))
        scaled = float(jnp.mean(jnp.abs(alpha * qe - qt)
                                / (jnp.abs(qt) + 1e-30)))
        return rng, {
            "rel_err": float(jnp.mean(jnp.asarray(errs))),
            "scaled_rel_err": scaled,
            "alpha": alpha,
            "q_true": float(jnp.mean(qt)),
            "q_est": float(jnp.mean(qe)),
        }

    for name in names:
        rng, report[name] = one_row(rng, [name])
    if joint:
        rng, report["__joint__"] = one_row(rng, names)
    return report
