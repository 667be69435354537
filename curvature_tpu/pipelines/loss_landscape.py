"""Loss-landscape evaluation (reference scripts/loss.py, Li et al. style).

Filter-normalized random directions (loss.py:121-167), 1-D line scans and
2-D surfaces (loss.py:170-397), with the reference's resumability (skip
already-evaluated coordinates, persist after every chunk).

TPU-native twist: grid points are evaluated in vmapped chunks — a stack of
perturbed parameter pytrees rides one batched forward per data batch, instead
of the reference's one-full-dataset-pass-per-point Python loop.
"""
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.estimators.capture import softmax_cross_entropy


def _filter_normalize(d: jax.Array, w: jax.Array) -> jax.Array:
    """Per-output-filter rescale of direction ``d`` to the norm of the
    corresponding weight filter (loss.py:88-101). The output axis is the
    last one in our layouts (dense [in, out], conv HWIO)."""
    axes = tuple(range(d.ndim - 1))
    dn = jnp.sqrt(jnp.sum(d * d, axis=axes, keepdims=True))
    wn = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return d * (wn / (dn + 1e-10))


def random_direction(params: Dict, rng: jax.Array, norm: str = "filter",
                     ignore: str = "biasbn") -> Dict:
    """Random direction pytree, filter-normalized, zero for 1-D params
    (bias/BN — reference normalize_direction, loss.py:131-141)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for key, w in zip(keys, leaves):
        d = jax.random.normal(key, w.shape, w.dtype)
        if w.ndim <= 1:
            if ignore == "biasbn":
                d = jnp.zeros_like(w)
        elif norm == "filter":
            d = _filter_normalize(d, w)
        elif norm == "layer":
            d = d * (jnp.linalg.norm(w) / (jnp.linalg.norm(d) + 1e-10))
        elif norm == "weight":
            d = d * w
        out.append(d)
    return jax.tree_util.tree_unflatten(treedef, out)


def perturb(params: Dict, directions: Sequence[Dict],
            steps: Sequence[float]) -> Dict:
    """params + sum_i steps[i] * directions[i] (reference set_state,
    loss.py:68-86) — pure, returns a new pytree."""
    out = params
    for d, s in zip(directions, steps):
        out = jax.tree_util.tree_map(lambda p, dd: p + s * dd, out, d)
    return out


def make_chunked_eval(model, batch_stats, mesh=None, data_axis="data"):
    """Jitted (stacked params, x, y) -> per-point (sum loss, sum correct).

    With ``mesh`` the eval batch shards over the data axis (points stay
    replicated; XLA reduces the per-shard sums) — the reference threads
    --parallel into loss.py the same way (loss.py:423-424). Ragged
    batches fall back to the single-program wrapper."""
    def _chunk_eval(stacked_params, x, y):
        def one(p):
            logits, _ = model.apply({"params": p, "batch_stats": batch_stats},
                                    x, train=False)
            loss = softmax_cross_entropy(logits, y) * y.shape[0]
            correct = jnp.sum(jnp.argmax(logits, -1) == y)
            return loss, correct
        return jax.vmap(one)(stacked_params)

    jit_plain = jax.jit(_chunk_eval)
    if mesh is None:
        return jit_plain
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(data_axis))
    jit_sharded = jax.jit(_chunk_eval, in_shardings=(rep, sh, sh),
                          out_shardings=rep)

    def chunk_eval(stacked_params, x, y):
        fn = jit_sharded if x.shape[0] % mesh.shape[data_axis] == 0 \
            else jit_plain
        return fn(stacked_params, x, y)
    return chunk_eval


def make_point_evaluator(model, variables, directions, chunk: int = 8,
                         mesh=None):
    """Build ONE jitted evaluator reused across every chunk of coordinates.

    Rebuilding the jit wrappers per chunk retraces and recompiles the
    vmapped model forward each time — ~1 min per chunk for ResNet-18 on the
    TPU, which turned a 51-point line scan into a multi-hour run. Ragged
    tail chunks are padded to the full chunk size (extra rows discarded) so
    only one program ever compiles."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    chunk_eval = make_chunked_eval(model, batch_stats, mesh=mesh)
    dirs = tuple(directions)

    # directions enter as jit ARGUMENTS: closure-captured pytrees become
    # embedded HLO constants (~2 full parameter sets for loss2d), the
    # re-staging/413 failure class documented in docs/design.md
    @jax.jit
    def stack_chunk(params, dirs, cs):
        return jax.vmap(lambda c: perturb(params, list(dirs), list(c)))(cs)

    def eval_coords(coords: np.ndarray, batches: List
                    ) -> Tuple[np.ndarray, np.ndarray]:
        n_points = len(coords)
        losses = np.zeros(n_points)
        accs = np.zeros(n_points)
        for start in range(0, n_points, chunk):
            sel = coords[start:start + chunk]
            k = len(sel)
            if k < chunk:     # pad: same compiled shape for the tail
                sel = np.concatenate([sel, np.repeat(sel[-1:], chunk - k, 0)])
            stacked = stack_chunk(params, dirs, jnp.asarray(sel))
            loss_sum = np.zeros(chunk)
            correct_sum = np.zeros(chunk)
            total = 0
            for x, y in batches:
                l, c = chunk_eval(stacked, jnp.asarray(x), jnp.asarray(y))
                loss_sum += np.asarray(l)
                correct_sum += np.asarray(c)
                total += len(y)
            losses[start:start + k] = loss_sum[:k] / total
            accs[start:start + k] = 100.0 * correct_sum[:k] / total
        return losses, accs

    return eval_coords


def evaluate_points(model, variables, directions, coords: np.ndarray,
                    batches: List, chunk: int = 8
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Loss/accuracy at each coordinate (rows of ``coords``, one column per
    direction). One-shot convenience over :func:`make_point_evaluator`."""
    return make_point_evaluator(model, variables, directions, chunk)(
        coords, batches)


def loss1d(model, variables, train_batches, val_batches=None,
           rng: Optional[jax.Array] = None, xmin: float = -1.0,
           xmax: float = 1.0, steps: int = 51, path: str = "",
           chunk: int = 8, mesh=None) -> Dict:
    """1-D line scan along one filter-normalized direction
    (reference loss1d, loss.py:170-293); resumable via ``path``."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = steps
    result = _load_or_new(path, {
        "xcoordinates": np.linspace(xmin, xmax, steps),
        "train_loss": np.full(n, np.nan), "train_acc": np.full(n, np.nan),
        "val_loss": np.full(n, np.nan), "val_acc": np.full(n, np.nan),
    })
    direction = random_direction(variables["params"], rng)
    xs = result["xcoordinates"][:, None]
    eval_coords = make_point_evaluator(model, variables, [direction],
                                       chunk, mesh=mesh)

    def fill(split, batches):
        loss_key, acc_key = f"{split}_loss", f"{split}_acc"
        if result[loss_key] is None:
            result[loss_key] = np.full(n, np.nan)
            result[acc_key] = np.full(n, np.nan)
        # resume: evaluate only the missing coordinates, chunk by chunk
        # (the reference persists after every point, loss.py:237-239, 267)
        missing = np.where(~np.isfinite(result[loss_key]))[0]
        batches = list(batches)
        for start in range(0, len(missing), chunk):
            sel = missing[start:start + chunk]
            l, a = eval_coords(xs[sel], batches)
            result[loss_key][sel] = l
            result[acc_key][sel] = a
            _save(path, result)

    fill("train", train_batches)
    if val_batches is not None:
        fill("val", val_batches)
    return result


def loss2d(model, variables, train_batches, rng: Optional[jax.Array] = None,
           xmin: float = -1.0, xmax: float = 1.0, xsteps: int = 21,
           ymin: float = -1.0, ymax: float = 1.0, ysteps: int = 21,
           path: str = "", chunk: int = 8, mesh=None) -> Dict:
    """2-D surface over two random filter-normalized directions
    (reference loss2d, loss.py:296-397); resumable per row."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    xs = np.linspace(xmin, xmax, xsteps)
    ys = np.linspace(ymin, ymax, ysteps)
    result = _load_or_new(path, {
        "xcoordinates": xs, "ycoordinates": ys,
        "loss": np.full((ysteps, xsteps), np.nan),
        "acc": np.full((ysteps, xsteps), np.nan),
    })
    dx = random_direction(variables["params"], r1)
    dy = random_direction(variables["params"], r2)
    batches = list(train_batches)
    eval_coords = make_point_evaluator(model, variables, [dx, dy],
                                       chunk, mesh=mesh)
    for j, yv in enumerate(ys):
        if np.isfinite(result["loss"][j]).all():
            continue  # resume: skip evaluated rows (loss.py:359-364)
        coords = np.stack([xs, np.full_like(xs, yv)], axis=1)
        l, a = eval_coords(coords, batches)
        result["loss"][j] = l
        result["acc"][j] = a
        _save(path, result)
    return result


def _load_or_new(path: str, default: Dict) -> Dict:
    if path and os.path.exists(path):
        return dict(np.load(path, allow_pickle=True).item())
    return default


def _save(path: str, result: Dict):
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.save(path, result, allow_pickle=True)


def run(cfg):
    from curvature_tpu.utils.checkpoint import results_paths
    from curvature_tpu.pipelines.common import build_data, build_model
    results_path, fig_path = results_paths(cfg)
    model, variables = build_model(cfg)
    train = build_data(cfg, splits="train")
    rng = jax.random.PRNGKey(cfg.seed)
    # --parallel/--mesh: eval batches shard over the data axis (reference
    # loss.py:423-424 wraps the model in DataParallel)
    from curvature_tpu.parallel import build_mesh
    mesh = build_mesh(cfg)
    if cfg.loss2d:
        res = loss2d(model, variables, train, rng,
                     path=results_path + "_loss2d.npy", mesh=mesh)
        if cfg.plot:
            from curvature_tpu.pipelines import plot
            plot.plot_surfaces(res, fig_path + "_loss2d.pdf")
        return res
    val = build_data(cfg, splits="val")
    res = loss1d(model, variables, train, val, rng,
                 path=results_path + "_loss1d.npy", mesh=mesh)
    if cfg.plot:
        from curvature_tpu.pipelines import plot
        plot.plot_loss1d(res, fig_path + "_loss1d.pdf")
    return res


def main(argv=None):
    from curvature_tpu.utils.config import setup
    run(setup(argv))


if __name__ == "__main__":
    main()
