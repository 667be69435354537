"""Temperature scaling (Guo et al., 2017) — the standard deterministic
calibration baseline the Bayesian predictives are compared against.

Extension beyond the reference: one scalar temperature ``T`` is fit by
NLL minimization on a validation set (convex in ``log T``; a short jitted
Adam loop), then applied as ``softmax(logits / T)``. Keeping the argmax
unchanged, it can only improve calibration, never accuracy — the
interesting comparison is its ECE/NLL against the Laplace/SWAG BNNs.
"""
from typing import Iterable, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def collect_logits(model, variables, data: Iterable
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """[N, K] raw logits + [N] labels over a dataset (eval mode)."""
    @jax.jit
    def fwd(variables, x):
        logits, _ = model.apply(variables, x, train=False)
        return logits

    outs, labels = [], []
    for x, y in data:
        outs.append(np.asarray(fwd(variables, jnp.asarray(x))))
        labels.append(np.asarray(y))
    return np.concatenate(outs), np.concatenate(labels)


def fit_temperature(logits, labels, steps: int = 200, lr: float = 0.05
                    ) -> float:
    """Scalar temperature minimizing validation NLL (optimized in log T).

    The whole descent is ONE jitted ``lax.scan`` program with the
    validation set as jit ARGUMENTS — closure-captured device arrays are
    re-staged HLO constants on the remote backend (and large validation
    logits would overflow the remote-compile request), and a per-step
    Python loop would pay ``steps`` host round trips for scalar math.
    """
    import functools

    import optax
    opt = optax.adam(lr)

    @functools.partial(jax.jit, static_argnums=2)
    def run(logits, labels, n):
        def nll(log_t):
            logp = jax.nn.log_softmax(logits / jnp.exp(log_t), axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None],
                                                 axis=-1))

        def body(carry, _):
            log_t, opt_state = carry
            val, g = jax.value_and_grad(nll)(log_t)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(log_t, updates), opt_state), val

        init = (jnp.zeros(()), opt.init(jnp.zeros(())))
        (log_t, _), _ = jax.lax.scan(body, init, None, length=n)
        return log_t

    log_t = run(jnp.asarray(logits, jnp.float32), jnp.asarray(labels),
                int(steps))
    return float(jnp.exp(log_t))


def temperature_scale(logits, temperature: float) -> np.ndarray:
    """softmax(logits / T) probabilities."""
    return np.asarray(jax.nn.softmax(
        jnp.asarray(logits, jnp.float32) / float(temperature), axis=-1))


def eval_nn_temperature(model, variables, val_data: Iterable,
                        test_data: Iterable
                        ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Fit T on ``val_data``, return (scaled test probs, test labels, T)."""
    v_logits, v_labels = collect_logits(model, variables, val_data)
    t = fit_temperature(v_logits, v_labels)
    t_logits, t_labels = collect_logits(model, variables, test_data)
    return temperature_scale(t_logits, t), t_labels, t
