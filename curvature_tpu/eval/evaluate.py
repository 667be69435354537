"""Deterministic and Bayesian model evaluation.

Parity with the reference's scripts/evaluate.py:94-170 under a TPU-native
execution model: the reference's ``eval_bnn`` loop — 30x {sample_and_replace,
full dataset pass} (evaluate.py:121-152) — becomes ONE ensemble of sampled
parameter pytrees evaluated with a vmapped forward, so all Monte-Carlo
samples ride a single batched XLA program per data batch.
"""
from typing import Dict, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from curvature_tpu.eval import metrics


from curvature_tpu.utils.casting import cast_floats as _cast_floats
from curvature_tpu.utils.casting import cast_input as _cast_input


def _mesh_dispatch(raw_fwd, mesh, data_axis, x_argnum):
    """Batch-sharded jit of ``raw_fwd`` (params replicated, the x argument
    sharded over ``data_axis``) with automatic fallback to the
    single-program jit for batches that don't divide the mesh — the mesh
    analogue of the reference's DataParallel eval (evaluate.py:344-345)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    x_sh = NamedSharding(mesh, P(data_axis))
    shardings = [rep] * x_argnum + [x_sh]
    plain = jax.jit(raw_fwd)
    sharded = jax.jit(raw_fwd, in_shardings=tuple(shardings),
                      out_shardings=rep)
    n = mesh.shape[data_axis]

    def fwd(*args):
        if args[x_argnum].shape[0] % n == 0:
            return sharded(*args)
        return plain(*args)
    return fwd


def make_forward_fn(model, compute_dtype=None, mesh=None,
                    data_axis: str = "data"):
    """Jitted eval-mode softmax forward.

    ``compute_dtype=jnp.bfloat16`` runs the forward on the MXU's native
    dtype (+32% measured on ResNet-50, benchmarks/NOTES.md); the softmax
    and every downstream metric stay float32. With ``mesh``, the batch
    axis shards over ``data_axis`` (variables replicated)."""
    def raw_fwd(variables, x):
        if compute_dtype is not None:
            variables = _cast_floats(variables, compute_dtype)
            x = _cast_input(x, compute_dtype)
        logits, _ = model.apply(variables, x, train=False)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # causal LMs emit [B, T, V]: flatten token axes so every metric
        # (accuracy/ECE/NLL/entropy/OOD) scores per token
        return p.reshape(-1, p.shape[-1]) if p.ndim > 2 else p
    if mesh is None:
        return jax.jit(raw_fwd)
    return _mesh_dispatch(raw_fwd, mesh, data_axis, 1)


def make_ensemble_fn(model, compute_dtype=None, mesh=None,
                     data_axis: str = "data"):
    """Jitted per-sample softmax forward over an ensemble axis: [S, B, K].

    With ``mesh``, the DATA batch shards over ``data_axis`` and the
    ensemble stays replicated: every device runs all S samples on its B/n
    batch rows — S*B/n forwards per device, the exact fan-out of the
    reference's DataParallel eval loop."""
    def raw_fwd(ensemble_params, batch_stats, x):
        if compute_dtype is not None:
            ensemble_params = _cast_floats(ensemble_params, compute_dtype)
            batch_stats = _cast_floats(batch_stats, compute_dtype)
            x = _cast_input(x, compute_dtype)
        def one(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=False)
            pr = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            # per-token flattening for causal LMs ([B, T, V] -> [B*T, V])
            return pr.reshape(-1, pr.shape[-1]) if pr.ndim > 2 else pr
        return jax.vmap(one)(ensemble_params)
    if mesh is None:
        return jax.jit(raw_fwd)
    return _mesh_dispatch(raw_fwd, mesh, data_axis, 2)


def eval_nn(model, variables, data: Iterable[Tuple[np.ndarray, np.ndarray]],
            forward_fn=None, compute_dtype=None, mesh=None
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Single deterministic pass (reference eval_nn, evaluate.py:94-118).

    Returns (softmax predictions [N, K], labels [N]) as numpy.
    """
    fwd = forward_fn or make_forward_fn(model, compute_dtype, mesh)
    probs_list, labels_list = [], []
    for x, y in data:
        probs_list.append(np.asarray(fwd(variables, jnp.asarray(x))))
        # [B] class labels, or [B, T] per-token LM labels flattened to
        # match the forward fn's token flattening
        labels_list.append(np.asarray(y).reshape(-1))
    return np.concatenate(probs_list), np.concatenate(labels_list)


def eval_bnn(model, variables, estimator, data, samples: int = 30,
             rng: Optional[jax.Array] = None, stats: bool = False,
             ensemble_params=None, sample_chunk: Optional[int] = None,
             compute_dtype=None, mesh=None,
             ) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Bayesian eval: mean softmax over ``samples`` posterior weight draws
    (reference eval_bnn, evaluate.py:121-152).

    The posterior ensemble is drawn once (vmapped sample), then every data
    batch runs all samples in one vmapped forward. ``sample_chunk`` bounds
    how many sampled parameter sets are resident at once (memory control
    for large models). ``stats`` reproduces the reference's running
    statistics over the sample axis (accuracy/ECE/entropy of the running
    mean, per-sample NLL, evaluate.py:141-146).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if sample_chunk is not None and ensemble_params is None \
            and sample_chunk < samples:
        return _eval_bnn_chunked(model, variables, estimator, data, samples,
                                 rng, stats, sample_chunk, compute_dtype,
                                 mesh)
    if ensemble_params is None:
        ensemble_params = estimator.ensemble_params(rng, samples)
    batch_stats = variables.get("batch_stats", {})
    fwd = make_ensemble_fn(model, compute_dtype, mesh)

    sum_probs = None          # [N, K] accumulated over batches
    per_sample = []           # [S, B, K] chunks (stats mode only)
    labels_list = []
    for x, y in data:
        probs_s = fwd(ensemble_params, batch_stats, jnp.asarray(x))  # [S,B,K]
        mean_b = jnp.sum(probs_s, axis=0)
        sum_probs = mean_b if sum_probs is None else \
            jnp.concatenate([sum_probs, mean_b])
        if stats:
            per_sample.append(np.asarray(probs_s))
        labels_list.append(np.asarray(y).reshape(-1))

    labels = np.concatenate(labels_list)
    mean_predictions = np.asarray(sum_probs) / samples

    stats_list = {"acc": [], "ece": [], "nll": [], "ent": []}
    if stats:
        probs_all = np.concatenate(per_sample, axis=1)       # [S, N, K]
        running = np.cumsum(probs_all, axis=0)
        for s in range(samples):
            mean_s = running[s] / (s + 1)
            stats_list["acc"].append(float(metrics.accuracy(mean_s, labels)))
            stats_list["ece"].append(float(
                100 * metrics.expected_calibration_error(mean_s, labels)[0]))
            stats_list["nll"].append(float(
                metrics.negative_log_likelihood(probs_all[s], labels)))
            stats_list["ent"].append(float(
                metrics.predictive_entropy(mean_s, mean=True)))
    return mean_predictions, labels, stats_list


def _eval_bnn_chunked(model, variables, estimator, data, samples, rng,
                      stats, sample_chunk, compute_dtype=None, mesh=None):
    """Chunked ensemble evaluation: at most ``sample_chunk`` sampled
    parameter sets live on the device at a time."""
    batches = list(data)
    batch_stats = variables.get("batch_stats", {})
    fwd = make_ensemble_fn(model, compute_dtype, mesh)
    rngs = jax.random.split(rng, -(-samples // sample_chunk))
    sum_probs = None
    per_sample = []
    labels = None
    done = 0
    for chunk_rng in rngs:
        k = min(sample_chunk, samples - done)
        ens = estimator.ensemble_params(chunk_rng, k)
        chunk_sum, chunk_all, labels_list = None, [], []
        for x, y in batches:
            probs_s = fwd(ens, batch_stats, jnp.asarray(x))
            s = jnp.sum(probs_s, axis=0)
            chunk_sum = s if chunk_sum is None else \
                jnp.concatenate([chunk_sum, s])
            if stats:
                chunk_all.append(np.asarray(probs_s))
            labels_list.append(np.asarray(y).reshape(-1))
        labels = np.concatenate(labels_list)
        sum_probs = chunk_sum if sum_probs is None else sum_probs + chunk_sum
        if stats:
            per_sample.append(np.concatenate(chunk_all, axis=1))
        done += k
    mean_predictions = np.asarray(sum_probs) / samples
    stats_list = {"acc": [], "ece": [], "nll": [], "ent": []}
    if stats:
        probs_all = np.concatenate(per_sample, axis=0)
        running = np.cumsum(probs_all, axis=0)
        for s in range(samples):
            mean_s = running[s] / (s + 1)
            stats_list["acc"].append(float(metrics.accuracy(mean_s, labels)))
            stats_list["ece"].append(float(
                100 * metrics.expected_calibration_error(mean_s, labels)[0]))
            stats_list["nll"].append(float(
                metrics.negative_log_likelihood(probs_all[s], labels)))
            stats_list["ent"].append(float(
                metrics.predictive_entropy(mean_s, mean=True)))
    return mean_predictions, labels, stats_list


def eval_nn_and_bnn(model, variables, estimator, data, samples: int = 30,
                    rng: Optional[jax.Array] = None, stats: bool = False,
                    compute_dtype=None, sample_chunk=None, mesh=None):
    """Both deterministic and Bayesian predictions over the same data
    (reference eval_nn_and_bnn, evaluate.py:155-170). ``data`` may be any
    re-iterable (list of batches or a loader)."""
    batches = list(data)
    predictions, labels = eval_nn(model, variables, batches,
                                  compute_dtype=compute_dtype, mesh=mesh)
    bnn_predictions, _, bnn_stats = eval_bnn(
        model, variables, estimator, batches, samples, rng, stats,
        compute_dtype=compute_dtype, sample_chunk=sample_chunk, mesh=mesh)
    return predictions, bnn_predictions, labels, bnn_stats


# -- sufficient-statistics eval (vocab-scale outputs) -------------------------
#
# At GPT-2's 50,257-way output a single test pass produces a [16k, 50257]
# probability matrix: 3.3 GB that metrics only ever reduce to four numbers
# per token. These variants compute those sufficient statistics ON DEVICE,
# so nothing larger than [N, 4] crosses the (slow, tunneled) host boundary:
#
#     columns: p_label   probability of the true token  -> NLL
#              conf      max probability                -> ECE bins
#              correct   argmax == label                -> accuracy, ECE
#              entropy   -sum p log p                   -> OOD scores
STATS_COLUMNS = ("p_label", "confidence", "correct", "entropy")


def _probs_to_stats(p2d, y):
    y = jnp.asarray(y).reshape(-1)
    p_label = jnp.take_along_axis(p2d, y[:, None], axis=1)[:, 0]
    conf = jnp.max(p2d, axis=1)
    correct = (jnp.argmax(p2d, axis=1) == y).astype(jnp.float32)
    ent = -jnp.sum(p2d * jnp.log(jnp.clip(p2d, 1e-12, None)), axis=1)
    return jnp.stack([p_label, conf, correct, ent], axis=1)


def eval_nn_stats(model, variables, data, compute_dtype=None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """:func:`eval_nn` reduced on device to the [N, 4] STATS_COLUMNS."""
    def raw(variables, x, y):
        if compute_dtype is not None:
            variables = _cast_floats(variables, compute_dtype)
            x = _cast_input(x, compute_dtype)
        logits, _ = model.apply(variables, x, train=False)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        p = p.reshape(-1, p.shape[-1]) if p.ndim > 2 else p
        return _probs_to_stats(p, y)

    fwd = jax.jit(raw)
    stats_list, labels_list = [], []
    for x, y in data:
        stats_list.append(np.asarray(
            fwd(variables, jnp.asarray(x), jnp.asarray(y))))
        labels_list.append(np.asarray(y).reshape(-1))
    return np.concatenate(stats_list), np.concatenate(labels_list)


def eval_bnn_stats(model, variables, estimator, data, samples: int = 30,
                   rng: Optional[jax.Array] = None,
                   sample_chunk: Optional[int] = None, compute_dtype=None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """:func:`eval_bnn` reduced on device: per batch, the sample-mean
    softmax accumulates on device and collapses straight to STATS_COLUMNS.
    ``sample_chunk`` bounds resident sampled parameter sets — chunks are
    RE-DRAWN per batch from the same per-chunk keys (deterministic), so
    neither the ensemble nor any [N, K] matrix is ever fully resident."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    batch_stats = variables.get("batch_stats", {})
    fwd = make_ensemble_fn(model, compute_dtype)
    chunk = min(sample_chunk or samples, samples)
    if chunk == samples:
        rngs = [rng]          # one chunk: bit-identical draws to eval_bnn
    else:
        rngs = list(jax.random.split(rng, -(-samples // chunk)))
    sizes = [min(chunk, samples - i * chunk) for i in range(len(rngs))]

    @jax.jit
    def reduce(sum_probs, y):
        return _probs_to_stats(sum_probs / samples, y)

    stats_list, labels_list = [], []
    for x, y in data:
        xj = jnp.asarray(x)
        total = None
        for r, k in zip(rngs, sizes):
            ens = estimator.ensemble_params(r, k)
            s = jnp.sum(fwd(ens, batch_stats, xj), axis=0)
            total = s if total is None else total + s
        stats_list.append(np.asarray(reduce(total, jnp.asarray(y))))
        labels_list.append(np.asarray(y).reshape(-1))
    return np.concatenate(stats_list), np.concatenate(labels_list)
