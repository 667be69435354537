"""Elastic Weight Consolidation with Laplace curvature (Kirkpatrick et
al., 2017) — the complete-Gaussian-API use case.

Sequential tasks: train on task A, fit a KFAC Fisher at the task-A
optimum, then train on task B with the curvature penalty

    L_B(theta) + lam/2 * (theta - theta_A)^T F_A (theta - theta_A)

where the quadratic form is the estimator's ``quad_state`` — pure and
differentiable, so the penalty sits INSIDE the jitted task-B training
step (the reference library has no density/quadratic-form evaluation at
all; its factors can only be sampled from). Tasks are feature-permuted
versions of one synthetic classification problem (permuted-MNIST style).

    python examples/ewc.py [--platform cpu] [--lam 50]

Prints task-A retention with and without the penalty; EWC must retain
more.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from curvature_tpu import estimators, models
from curvature_tpu.nn.core import param_matrix


def make_task(rng, n, dim, classes, perm=None):
    x = rng.standard_normal((n, dim)).astype(np.float32)
    w = rng.standard_normal((dim, classes)).astype(np.float32)
    y = np.argmax(x @ w + 0.5 * rng.standard_normal((n, classes)), axis=1)
    if perm is not None:
        x = x[:, perm]
    return jnp.asarray(x), jnp.asarray(y.astype(np.int32))


def accuracy(model, variables, x, y):
    logits, _ = model.apply(variables, x, train=False)
    return float(jnp.mean(jnp.argmax(logits, -1) == y))


def train(model, variables, x, y, steps, lr, penalty=None, penalty_aux=()):
    """``penalty(p, *penalty_aux)`` is threaded through the jitted step as
    ARGUMENTS, never closure-captured: closure-captured device arrays
    become XLA constants this backend re-stages on every call (~15x,
    estimators/base.py)."""
    params = variables["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, aux):
        logits, _ = model.apply({"params": p, "batch_stats": {}}, x,
                                train=True)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        loss = jnp.mean(ce)
        if penalty is not None:
            loss = loss + penalty(p, *aux)
        return loss

    @jax.jit
    def step(p, s, aux):
        g = jax.grad(loss_fn)(p, aux)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    for _ in range(steps):
        params, opt_state = step(params, opt_state, penalty_aux)
    return {"params": params, "batch_stats": {}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--lam", type=float, default=50.0)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--mc_samples", type=int, default=8)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.default_rng(0)
    dim, classes = 20, 5
    xa, ya = make_task(rng, 1024, dim, classes)
    perm = rng.permutation(dim)
    xb, yb = make_task(rng, 1024, dim, classes, perm=perm)

    model = models.mlp([64], classes)
    variables = model.init(jax.random.PRNGKey(0), xa[:2])

    # task A
    var_a = train(model, variables, xa, ya, args.steps, 1e-2)
    acc_a0 = accuracy(model, var_a, xa, ya)

    # Fisher at the task-A optimum (MC-label KFAC, the reference's
    # protocol, factors.py:33-62)
    est = estimators.KFAC(model, var_a)
    est.update(xa, rng=jax.random.PRNGKey(1), num_samples=args.mc_samples)
    state = est.state
    metas = est.metas
    map_mats = {n: param_matrix(m, var_a["params"][n])
                for n, m in metas.items()}
    nlayer = len(metas)
    add = jnp.full((nlayer,), 1e-8)
    mul = jnp.full((nlayer,), 1.0)

    def ewc_penalty(p, state, map_mats, add, mul):
        deltas = {n: param_matrix(m, p[n]) - map_mats[n]
                  for n, m in metas.items()}
        return 0.5 * args.lam * est.quad_state(state, add, mul, deltas)

    # task B, with and without consolidation
    var_plain = train(model, var_a, xb, yb, args.steps, 1e-2)
    var_ewc = train(model, var_a, xb, yb, args.steps, 1e-2,
                    penalty=ewc_penalty,
                    penalty_aux=(state, map_mats, add, mul))

    rows = [
        ("task A after A", acc_a0, None),
        ("plain  B", accuracy(model, var_plain, xb, yb),
         accuracy(model, var_plain, xa, ya)),
        ("EWC    B", accuracy(model, var_ewc, xb, yb),
         accuracy(model, var_ewc, xa, ya)),
    ]
    for name, b, a in rows:
        retained = "" if a is None else f"   task-A retained {100 * a:.1f}%"
        print(f"{name:<15} acc {100 * b:6.1f}%{retained}")
    plain_a = rows[1][2]
    ewc_a = rows[2][2]
    print(f"EWC retention gain: {100 * (ewc_a - plain_a):+.1f} points")
    if ewc_a <= plain_a:
        raise SystemExit("EWC did not retain more task-A accuracy")


if __name__ == "__main__":
    main()
