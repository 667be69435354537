"""Factor estimation pipeline (reference scripts/factors.py).

The reference's hot loop — per batch: one forward, then ``--samples`` MC
label draws each doing a full ``backward(retain_graph=True)`` + per-layer
update (factors.py:48-61) — is here one jitted step per batch: forward,
vmapped cotangent backwards, and all factor accumulations fused by XLA.
"""
import os
from typing import Optional

import jax

from curvature_tpu import estimators
from curvature_tpu.utils.checkpoint import (factors_path, load_pytree,
                                            save_pytree)
from curvature_tpu.pipelines.common import (build_data, build_model,
                                            layer_filter, loss_kind)


def compute_factors(model, variables, data, cfg, kfac_state=None,
                    rng: Optional[jax.Array] = None):
    """Run the Fisher estimation loop (reference compute_factors,
    factors.py:33-62)."""
    name = cfg.estimator.lower()
    lf = layer_filter(cfg)
    subsample = float(getattr(cfg, "token_subsample", 1.0) or 1.0)
    if subsample < 1.0 and name != "kfac":
        raise ValueError(
            "--token_subsample applies to KFAC's conv A-factor Grams only; "
            f"--estimator {name} has no patch-Gram phase")
    # --precision bfloat16: factor forwards/backwards on the MXU's native
    # dtype, f32 factor accumulation (the measured 697->902 img/s ResNet-50
    # lever, benchmarks/NOTES.md)
    compute_dtype = None
    if getattr(cfg, "precision", "") == "bfloat16":
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16
    loss = loss_kind(cfg)
    if name == "diag":
        est = estimators.Diagonal(model, variables, layer_filter=lf,
                                  compute_dtype=compute_dtype, loss=loss)
    elif name == "kfac":
        est = estimators.KFAC(
            model, variables, layer_filter=lf,
            compute_dtype=compute_dtype, loss=loss,
            token_subsample=subsample,
            attention_qkv_split=getattr(cfg, "qkv_split", False),
            attention_head_split=getattr(cfg, "head_split", False),
            g_block_size=getattr(cfg, "g_block_size", 1024))
    elif name == "block":
        est = estimators.BlockDiagonal(model, variables, layer_filter=lf,
                                       compute_dtype=compute_dtype,
                                       loss=loss)
    elif name == "efb":
        if kfac_state is None:
            kfac_state = load_pytree(factors_path(cfg, "kfac"))
        est = estimators.EFB(model, variables, kfac_state, layer_filter=lf,
                             compute_dtype=compute_dtype, loss=loss)
    elif name == "subspace":
        # global low-rank Nyström sketch (estimators/subspace.py) — reuses
        # the INF --rank flag for the sketch width; the update loop below
        # works unchanged (rng/MC draws are accepted and ignored: the GGN
        # takes the label expectation analytically)
        est = estimators.Subspace(model, variables, rank=cfg.rank,
                                  omega_seed=cfg.seed, layer_filter=lf,
                                  compute_dtype=compute_dtype, loss=loss)
    else:
        raise ValueError(f"unknown estimator {cfg.estimator!r}")

    import numpy as np

    # multi-chip: batch sharded over the mesh's data axis, factors
    # replicated — the reference threads --parallel into this script the
    # same way (reference factors.py:86-87); ragged tail batches fall back
    # to the single-program path inside the estimator
    from curvature_tpu.parallel import build_mesh
    mesh = build_mesh(cfg)
    if mesh is not None:
        est.use_mesh(mesh)

    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    chunk = max(getattr(cfg, "scan_chunk", 1), 1)
    num_updates = 0  # update-call count: factor states are raw running sums

    # On an accelerator, overlap H2D staging with compute: a background
    # thread device_puts upcoming batches while the current chunk runs
    # (the reference's pin_memory + non_blocking analogue, factors.py:51);
    # batches then stack on-device instead of round-tripping through host.
    if jax.devices()[0].platform != "cpu":
        from curvature_tpu.data.prefetch import DevicePrefetcher
        import jax.numpy as jnp
        device = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            device = NamedSharding(mesh, P("data"))
        data = DevicePrefetcher(data, depth=max(getattr(cfg, "workers", 0), 2),
                                device=device)
        stack, as_batch = jnp.stack, lambda b: b
    else:
        stack, as_batch = np.stack, np.asarray

    for epoch in range(cfg.epochs):
        batches = data
        if cfg.verbose:
            # the reference's tqdm + RAM/VRAM postfix telemetry
            # (factors.py:47-49)
            from tqdm import tqdm
            from curvature_tpu.utils.monitor import device_memory_gb, ram
            batches = tqdm(data, desc=f"Epoch [{epoch + 1}/{cfg.epochs}]")
        buffer = []
        for x, _ in batches:
            buffer.append(as_batch(x))
            if len(buffer) == chunk and chunk > 1 \
                    and all(b.shape == buffer[0].shape for b in buffer):
                # fold uniform batches through one jitted lax.scan
                rng, key = jax.random.split(rng)
                est.update_batches(stack(buffer), key,
                                   num_samples=cfg.mc_samples)
                num_updates += len(buffer)
                buffer = []
            elif len(buffer) >= chunk:
                for b in buffer:
                    rng, key = jax.random.split(rng)
                    est.update(b, rng=key, num_samples=cfg.mc_samples)
                num_updates += len(buffer)
                buffer = []
            if cfg.verbose:
                batches.set_postfix({"RAM": f"{ram():.0f}%",
                                     "HBM": f"{device_memory_gb():.2f}GB"})
        for b in buffer:        # ragged tail
            rng, key = jax.random.split(rng)
            est.update(b, rng=key, num_samples=cfg.mc_samples)
            num_updates += 1
    est.num_updates = num_updates
    return est


def compute_inf(cfg, model, variables):
    """Assemble INF from saved diag/kfac/efb factors (reference compute_inf,
    factors.py:12-30 — with its swapped-argument call bug fixed)."""
    factors = load_pytree(factors_path(cfg, "kfac"))
    lambdas = load_pytree(factors_path(cfg, "efb"))
    diags = load_pytree(factors_path(cfg, "diag"))
    est = estimators.INF(model, variables, diags, factors, lambdas,
                         layer_filter=layer_filter(cfg))
    # bucket=8: index-set sizes rounded up with zero-lambda padding — the
    # posterior is unchanged but low-rank shapes become data-independent,
    # so same-shaped layers (ResNet stages) share compiled programs.
    est.update(cfg.rank, bucket=8)
    return est


def diagnose(est, x, cfg, norm: float = 1.0):
    """Optional exact-curvature diagnostics against the fitted factors:
    --fidelity N measures each layer's structural error vs the matrix-free
    GGN (eval/fidelity.py), --spectrum K saves K Lanczos steps of the TRUE
    curvature spectrum — neither exists in the reference (its only spectral
    tool eigendecomposes the factors, utils.py:21-60)."""
    import numpy as np

    probes = int(getattr(cfg, "fidelity", 0) or 0)
    steps = int(getattr(cfg, "spectrum", 0) or 0)
    key = jax.random.PRNGKey(cfg.seed + 1)
    if probes > 0:
        from curvature_tpu.eval.fidelity import fidelity_report
        # joint=True appends a "__joint__" all-layers row: its residual is
        # the cross-layer curvature layer-local estimators drop (and the
        # global Subspace sketch retains)
        rep = fidelity_report(est, x, key, num_probes=probes, norm=norm,
                              joint=True)
        rows = [(n, r["scaled_rel_err"], r["alpha"], r["rel_err"],
                 r["q_true"]) for n, r in rep.items()]
        try:
            from tabulate import tabulate
            print(tabulate(rows, headers=(
                "layer", "structural err", "alpha", "rel err @norm",
                "q_true"), floatfmt=".4g"))
        except ImportError:
            for row in rows:
                print(*row)
        path = factors_path(cfg) + "_fidelity.npz"
        np.savez(path, **{f"{n}/{k}": v for n, r in rep.items()
                          for k, v in r.items()})
        print(f"fidelity report -> {path}")
    if steps > 0:
        from curvature_tpu.ops import matfree
        import jax.numpy as jnp
        example = {n: jnp.zeros(s, jnp.float32)
                   for n, s in matfree.delta_shapes(est.metas).items()}
        mv = jax.jit(lambda d: matfree.ggn_matvec(
            est.model, est.metas, est.variables, x, d, loss=est.loss))
        ritz, weights = matfree.lanczos_topk(mv, example, steps, key)
        path = factors_path(cfg) + "_spectrum.npz"
        np.savez(path, ritz=np.asarray(ritz), weights=np.asarray(weights))
        print(f"true-curvature spectrum (top ritz "
              f"{np.asarray(ritz)[:3].round(6)}) -> {path}")


def run(cfg):
    """Full pipeline: model -> data -> factors -> save (factors.py:65-129)."""
    os.makedirs(os.path.join(cfg.root_dir, "factors"), exist_ok=True)
    model, variables = build_model(cfg)
    want_diag = getattr(cfg, "fidelity", 0) or getattr(cfg, "spectrum", 0)

    if cfg.estimator == "inf":
        est = compute_inf(cfg, model, variables)
        save_pytree(factors_path(cfg, rank=str(cfg.rank)), est.state)
        if want_diag:
            x0 = next(iter(build_data(cfg, splits="train")))[0]
            # INF is assembled from saved sums — the raw scale is unknown
            # here; the scale-free (alpha-fit) columns are the signal
            diagnose(est, x0, cfg)
        return est

    data = build_data(cfg, splits="train")
    est = compute_factors(model, variables, data, cfg)
    save_pytree(factors_path(cfg), est.state)
    if cfg.estimator == "efb":
        # EFB computes the plain diagonal for free (reference
        # factors.py:126-127, README.rst:246)
        save_pytree(factors_path(cfg, "diag"), est.diags)
    if want_diag:
        x0 = next(iter(data))[0]
        diagnose(est, x0, cfg,
                 norm=float(est.num_updates * cfg.mc_samples))
    return est


def main(argv=None):
    from curvature_tpu.utils.config import setup
    run(setup(argv))


if __name__ == "__main__":
    main()
