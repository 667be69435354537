"""Model training (reference scripts/training.py): SGD/Adam with optional
L2, step-decayed learning rate, checkpointing to ``<root>/weights/``.

The train step is one jitted function updating params and BatchNorm running
statistics together (the reference relies on torch's implicit BN updates).
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import optax

from curvature_tpu.estimators.capture import softmax_cross_entropy
from curvature_tpu.utils.checkpoint import save_pytree


def make_train_step(model, tx, mesh=None, data_axis: str = "data"):
    """One jitted SGD/Adam step; with ``mesh`` the batch shards over the
    data axis (params/opt-state/BN stats replicated — XLA inserts the
    gradient psums and the BN cross-shard reductions). The reference
    threads --parallel into training the same way (training.py:26-27).
    Ragged tail batches fall back to the single-program wrapper."""
    def _step(params, opt_state, batch_stats, x, y):
        def loss_fn(p):
            logits, aux = model.apply({"params": p, "batch_stats": batch_stats},
                                      x, train=True)
            return softmax_cross_entropy(logits, y), aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_stats = dict(batch_stats)
        new_stats.update(aux["batch_stats"])
        return params, opt_state, new_stats, loss

    jit_plain = jax.jit(_step)
    if mesh is None:
        return jit_plain
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(data_axis))
    jit_sharded = jax.jit(_step, in_shardings=(rep, rep, rep, sh, sh),
                          out_shardings=rep)

    def step(params, opt_state, batch_stats, x, y):
        fn = jit_sharded if x.shape[0] % mesh.shape[data_axis] == 0 \
            else jit_plain
        return fn(params, opt_state, batch_stats, x, y)
    return step


def train(model, variables, train_data, cfg, val_data=None,
          optimizer: str = "sgd", swag=None, mesh=None):
    """Train and return updated variables; saves per-epoch metrics.

    ``swag``: an optional ``estimators.SWAG`` collector — one parameter
    iterate is folded in at the end of every epoch inside the SWA window
    (the last 25% of training, i.e. after the second LR decay; every
    epoch when training is shorter than 4 epochs)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    steps_per_epoch = max(len(train_data), 1) if hasattr(train_data, "__len__") else 100
    total_steps = cfg.epochs * steps_per_epoch
    schedule = optax.piecewise_constant_schedule(
        cfg.lr, {int(total_steps * 0.5): 0.1, int(total_steps * 0.75): 0.1})
    if optimizer == "adam":
        tx = optax.adam(schedule)
    else:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.l2) if cfg.l2 else optax.identity(),
            optax.sgd(schedule, momentum=cfg.momentum))
    if optimizer == "kfac":
        # natural-gradient preconditioning (optim.py): momentum/weight
        # decay apply to the PRECONDITIONED gradients
        from curvature_tpu import optim
        from curvature_tpu.estimators import KFAC
        est = KFAC(model, {"params": params, "batch_stats": batch_stats})
        kstep, kinit = optim.make_kfac_train_step(
            model, est, tx, damping=getattr(cfg, "opt_damping", 1e-2),
            mesh=mesh)
        first = next(iter(train_data))
        rng = jax.random.PRNGKey(cfg.seed)
        factors, inv = kinit({"params": params, "batch_stats": batch_stats},
                             jnp.asarray(first[0]), jnp.asarray(first[1]),
                             rng)
        opt_state = tx.init(params)
        count = jnp.zeros((), jnp.int32)
        history = {"loss": [], "val_acc": []}
        swa_start = int(cfg.epochs * 0.75) if cfg.epochs >= 4 else 0
        for epoch in range(cfg.epochs):
            epoch_loss = []
            for x, y in train_data:
                rng, key = jax.random.split(rng)
                (params, opt_state, factors, inv, batch_stats, count,
                 loss) = kstep(params, opt_state, factors, inv, batch_stats,
                               count, jnp.asarray(x), jnp.asarray(y), key)
                epoch_loss.append(float(loss))
            history["loss"].append(float(np.mean(epoch_loss)))
            if swag is not None and epoch >= swa_start:
                swag.collect(params)
            if val_data is not None:
                from curvature_tpu.eval import eval_nn, metrics
                probs, labels = eval_nn(
                    model, {"params": params, "batch_stats": batch_stats},
                    val_data)
                history["val_acc"].append(
                    float(metrics.accuracy(probs, labels)))
        return {"params": params, "batch_stats": batch_stats}, history
    step = make_train_step(model, tx, mesh=mesh)
    opt_state = tx.init(params)

    history = {"loss": [], "val_acc": []}
    swa_start = int(cfg.epochs * 0.75) if cfg.epochs >= 4 else 0
    for epoch in range(cfg.epochs):
        epoch_loss = []
        for x, y in train_data:
            params, opt_state, batch_stats, loss = step(
                params, opt_state, batch_stats, jnp.asarray(x), jnp.asarray(y))
            epoch_loss.append(float(loss))
        history["loss"].append(float(np.mean(epoch_loss)))
        if swag is not None and epoch >= swa_start:
            swag.collect(params)
        if val_data is not None:
            from curvature_tpu.eval import eval_nn, metrics
            probs, labels = eval_nn(
                model, {"params": params, "batch_stats": batch_stats}, val_data)
            history["val_acc"].append(float(metrics.accuracy(probs, labels)))
    return {"params": params, "batch_stats": batch_stats}, history


def run(cfg):
    from curvature_tpu.pipelines.common import build_data, build_model
    model, variables = build_model(cfg)
    splits = build_data(cfg, splits=("train", "val"))
    train_data, val_data = splits if isinstance(splits, list) else (splits, None)
    swag = None
    if getattr(cfg, "swag", False):
        from curvature_tpu.estimators.swag import SWAG
        swag = SWAG(model, variables, max_rank=getattr(cfg, "swag_rank", 20))
    opt = cfg.optimizer if cfg.optimizer in ("adam", "kfac") else "sgd"
    from curvature_tpu.parallel import build_mesh
    variables, history = train(model, variables, train_data, cfg, val_data,
                               optimizer=opt, swag=swag,
                               mesh=build_mesh(cfg))
    out = os.path.join(cfg.root_dir, "weights", f"{cfg.model}_{cfg.data}.npz")
    save_pytree(out, variables)
    if swag is not None:
        save_pytree(os.path.join(cfg.root_dir, "weights",
                                 f"{cfg.model}_{cfg.data}_swag.npz"),
                    swag.state)
    return variables, history


def main(argv=None):
    from curvature_tpu.utils.config import setup
    run(setup(argv))


if __name__ == "__main__":
    main()
