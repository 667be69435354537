"""Data attribution with curvature inverse products — find label noise.

Influence functions (Koh & Liang, 2017) rank training examples by their
effect on a test loss via ``-g_test^T P^{-1} g_train``; self-influence
``g_i^T P^{-1} g_i`` (Feldman & Zhang, 2020) scores how much an example
relies on its own memorization. Every estimator here exposes the exact
inverse application ``precision_solve`` (estimators/base.py), so neither
score needs LiSSA / conjugate-gradient iterations.

This demo trains a small MLP on synthetic classification data with a
fraction of deliberately FLIPPED labels, fits a KFAC Fisher at the
optimum, and shows that self-influence concentrates the flipped examples
at the top of the ranking — the classic label-noise detection use case.
The reference library computes curvature only to sample from the Laplace
posterior (curvatures.py:104-129); it has no data-attribution surface.

    python examples/influence.py [--platform cpu] [--flip 0.1]
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
from curvature_tpu.eval.influence import influence_scores, self_influence


def make_data(rng, n, dim, classes):
    x = rng.standard_normal((n, dim)).astype(np.float32)
    w = rng.standard_normal((dim, classes)).astype(np.float32)
    y = np.argmax(x @ w + 0.3 * rng.standard_normal((n, classes)), axis=1)
    return x, y.astype(np.int32)


def train(model, variables, x, y, steps, lr=1e-2):
    params = variables["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits, _ = model.apply({"params": p, "batch_stats": {}}, x,
                                    train=True)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y))
        g = jax.grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    for _ in range(steps):
        params, opt_state = step(params, opt_state)
    return {"params": params, "batch_stats": {}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--flip", type=float, default=0.1)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.default_rng(0)
    dim, classes = 20, 5
    x, y = make_data(rng, args.n, dim, classes)
    x_test, y_test = make_data(rng, 256, dim, classes)

    # flip a fraction of the training labels
    n_flip = int(args.flip * args.n)
    flip_idx = rng.choice(args.n, n_flip, replace=False)
    y_noisy = y.copy()
    y_noisy[flip_idx] = (y_noisy[flip_idx]
                         + rng.integers(1, classes, n_flip)) % classes

    model = models.mlp([32], classes)
    variables = model.init(jax.random.PRNGKey(0), x[:2])
    variables = train(model, variables, jnp.asarray(x),
                      jnp.asarray(y_noisy), args.steps)

    est = estimators.KFAC(model, variables)
    est.update(jnp.asarray(x), rng=jax.random.PRNGKey(1), num_samples=4)

    si = np.asarray(self_influence(est, jnp.asarray(x),
                                   jnp.asarray(y_noisy),
                                   add=1.0, multiply=1.0))
    order = np.argsort(-si)                  # most self-influential first
    top = order[:n_flip]
    hits = len(set(top.tolist()) & set(flip_idx.tolist()))
    precision = hits / max(n_flip, 1)
    base_rate = n_flip / args.n
    print(f"flipped {n_flip}/{args.n} labels; "
          f"self-influence top-{n_flip} precision {precision:.2f} "
          f"(chance {base_rate:.2f})")
    assert precision > 2 * base_rate, "self-influence failed to rank noise"

    # test-set influence: flipped examples are the most CONTESTED — their
    # |influence| on a clean test loss dwarfs clean examples' (the sign
    # depends on how far training got on each noisy label; the magnitude
    # doesn't)
    inf = np.asarray(influence_scores(est, jnp.asarray(x),
                                      jnp.asarray(y_noisy),
                                      jnp.asarray(x_test),
                                      jnp.asarray(y_test),
                                      add=1.0, multiply=1.0))
    frac = np.isin(np.argsort(-np.abs(inf))[:n_flip], flip_idx).mean()
    print(f"largest |test influence| top-{n_flip}: "
          f"{frac:.2f} are flipped examples (chance {base_rate:.2f})")
    assert frac > 2 * base_rate
    print("influence OK")


if __name__ == "__main__":
    main()
