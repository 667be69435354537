"""Evaluation pipeline (reference scripts/evaluate.py): deterministic test,
in-domain vs out-of-domain Bayesian eval, and FGSM sweeps, with the
reference's artifact layout and best-params fallback."""
import numpy as np
import jax

from curvature_tpu import estimators
from curvature_tpu.eval import (eval_fgsm, eval_fgsm_bnn, eval_nn,
                                eval_nn_and_bnn)
from curvature_tpu.utils.checkpoint import (factors_path, load_pytree,
                                            results_paths)
from curvature_tpu.pipelines.common import (build_data, build_model,
                                            build_ood_data)


def _compute_dtype(cfg):
    """--precision bfloat16: forwards run in bf16 on the MXU's native dtype;
    softmax and all metrics stay f32 (extension beyond the reference)."""
    if getattr(cfg, "precision", "") == "bfloat16":
        import jax.numpy as jnp
        return jnp.bfloat16
    return None


def load_estimator(cfg, model, variables):
    """Rebuild an estimator from saved factors (evaluate.py:347-370)."""
    from curvature_tpu.pipelines.common import layer_filter, loss_kind
    name = cfg.estimator
    lf = layer_filter(cfg)
    loss = loss_kind(cfg)
    if name == "diag":
        est = estimators.Diagonal(model, variables, layer_filter=lf,
                                  loss=loss)
        est.state = load_pytree(factors_path(cfg))
    elif name == "kfac":
        est = estimators.KFAC(
            model, variables, layer_filter=lf, loss=loss,
            attention_qkv_split=getattr(cfg, "qkv_split", False),
            attention_head_split=getattr(cfg, "head_split", False),
            g_block_size=getattr(cfg, "g_block_size", 1024))
        est.state = load_pytree(factors_path(cfg))
    elif name == "efb":
        kfac_state = load_pytree(factors_path(cfg, "kfac"))
        est = estimators.EFB(model, variables, kfac_state, layer_filter=lf,
                             loss=loss)
        est.state = load_pytree(factors_path(cfg))
    elif name == "inf":
        diags = load_pytree(factors_path(cfg, "diag"))
        kfac_state = load_pytree(factors_path(cfg, "kfac"))
        lambdas = load_pytree(factors_path(cfg, "efb"))
        est = estimators.INF(model, variables, diags, kfac_state, lambdas,
                             layer_filter=lf, loss=loss)
        est.state = load_pytree(factors_path(cfg, rank=str(cfg.rank)))
    elif name == "subspace":
        est = estimators.Subspace(model, variables, rank=cfg.rank,
                                  omega_seed=cfg.seed, layer_filter=lf,
                                  loss=loss)
        est.state = load_pytree(factors_path(cfg))
    elif name == "swag":
        # SWAG rides the training pipeline (--swag), not factors; its
        # state lives next to the weights (extension; estimators/swag.py)
        import os
        from curvature_tpu.estimators.swag import SWAG
        est = SWAG(model, variables)
        est.state = load_pytree(os.path.join(
            cfg.root_dir, "weights", f"{cfg.model}_{cfg.data}_swag.npz"))
        return est
    else:
        raise ValueError(f"unknown estimator {name!r}")
    missing = set(est.metas) - set(est.state)
    if missing:
        # factors computed under a NARROWER --layers than this run asks
        # for — sampling would KeyError deep inside jit; fail loudly here
        raise ValueError(
            f"saved factors at {factors_path(cfg)} lack layers "
            f"{sorted(missing)}; recompute factors or pass the matching "
            "--layers filter")
    return est


def invert_from_config(cfg, est, results_path: str):
    """norm/scale from flags or the hyperopt best-params file; the scale is
    multiplied by pre_scale (evaluate.py:373-378)."""
    if cfg.norm == -1 or cfg.scale == -1:
        best = np.load(results_path + "_best_params.npy", allow_pickle=True)
        norm = np.asarray(best[0], dtype=float)
        scale = np.asarray(best[1], dtype=float)
        if norm.size == 1:
            norm = float(norm.ravel()[0])
            scale = float(scale.ravel()[0])
    else:
        norm, scale = cfg.norm, cfg.scale
    est.invert(norm, np.asarray(cfg.pre_scale * np.asarray(scale)))
    return norm, scale


def _print_summary(tag: str, predictions, labels):
    """Console metric summary (the reference prints accuracy/ECE after every
    eval pass, evaluate.py:114-118, 149-152)."""
    from curvature_tpu.eval import metrics
    import jax.numpy as jnp
    p = jnp.asarray(predictions)
    y = jnp.asarray(labels)
    acc = float(metrics.accuracy(p, y))
    ece = float(metrics.expected_calibration_error(p, y)[0])
    nll = float(metrics.negative_log_likelihood(p, y))
    print(f"{tag}: accuracy {acc:.2f}% | ECE {100 * ece:.2f}% | NLL {nll:.4f}")


def _stats_mode_k(cfg) -> int:
    """Output cardinality when the sufficient-statistics eval must be used
    (vocab-scale heads: a full [N, K] prediction matrix would be GBs)."""
    from curvature_tpu.pipelines.common import NUM_CLASSES
    k = getattr(cfg, "vocab", 0) or NUM_CLASSES.get(cfg.data, 10)
    return k if k >= 8192 else 0


def _print_stats_summary(tag, stats):
    from curvature_tpu.eval import metrics
    acc = 100.0 * float(np.mean(stats[:, 2]))
    ece = float(metrics.ece_from_confidence(stats[:, 1], stats[:, 2])[0])
    nll = float(-np.mean(np.log(np.clip(stats[:, 0], 1e-12, None))))
    print(f"{tag}: accuracy {acc:.2f}% | ECE {100 * ece:.2f}% | NLL {nll:.4f}")


def _out_of_domain_stats(cfg, model, variables, est, results_path: str):
    """Vocab-scale variant of :func:`out_of_domain`: per-token sufficient
    statistics (eval/evaluate.py STATS_COLUMNS) computed on device; the
    [N, 50257] probability matrices never cross the host boundary. Same
    metrics, compact artifact."""
    from curvature_tpu.eval import metrics
    from curvature_tpu.eval.evaluate import (STATS_COLUMNS, eval_bnn_stats,
                                             eval_nn_stats)
    pred_kind = getattr(cfg, "predictive", "sampled") or "sampled"
    if pred_kind != "sampled":
        raise ValueError(
            f"--predictive {pred_kind} is not implemented for vocab-scale "
            "outputs (>= 8192 classes); use the sampled predictive")
    in_data, out_data = build_ood_data(cfg)
    in_data, out_data = list(in_data), list(out_data)
    rng = jax.random.PRNGKey(cfg.seed)
    dtype = _compute_dtype(cfg)
    chunk = getattr(cfg, "sample_chunk", 0) or None
    nn_s, labels = eval_nn_stats(model, variables, in_data,
                                 compute_dtype=dtype)
    bnn_s, _ = eval_bnn_stats(model, variables, est, in_data, cfg.samples,
                              rng, sample_chunk=chunk, compute_dtype=dtype)
    ood_nn_s, _ = eval_nn_stats(model, variables, out_data,
                                compute_dtype=dtype)
    ood_bnn_s, _ = eval_bnn_stats(model, variables, est, out_data,
                                  cfg.samples, rng, sample_chunk=chunk,
                                  compute_dtype=dtype)
    _print_stats_summary("NN ", nn_s)
    _print_stats_summary("BNN", bnn_s)
    auroc_nn = metrics.auroc(nn_s[:, 3], ood_nn_s[:, 3])
    auroc_bnn = metrics.auroc(bnn_s[:, 3], ood_bnn_s[:, 3])
    print(f"OOD AUROC (predictive entropy): NN {auroc_nn:.4f} "
          f"| BNN {auroc_bnn:.4f}")
    if not cfg.no_results:
        np.savez_compressed(results_path + "_stats.npz",
                            stats_columns=np.asarray(STATS_COLUMNS),
                            labels=labels,
                            nn_stats=nn_s, bnn_stats=bnn_s,
                            ood_nn_stats=ood_nn_s,
                            ood_bnn_stats=ood_bnn_s,
                            auroc=np.asarray([auroc_nn, auroc_bnn]))
    return nn_s, bnn_s, labels


def out_of_domain(cfg, model, variables, est, results_path: str,
                  fig_path: str):
    """In-domain + OOD eval for NN and BNN (evaluate.py:199-280). With
    --parallel/--mesh the eval batch shards over the mesh's data axis
    (reference evaluate.py:344-345 wraps the model in DataParallel)."""
    if _stats_mode_k(cfg):
        return _out_of_domain_stats(cfg, model, variables, est,
                                    results_path)
    from curvature_tpu.parallel import build_mesh
    mesh = build_mesh(cfg)
    in_data, out_data = build_ood_data(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    dtype = _compute_dtype(cfg)
    chunk = getattr(cfg, "sample_chunk", 0) or None
    pred_kind = getattr(cfg, "predictive", "sampled") or "sampled"
    if pred_kind == "sampled":
        predictions, bnn_predictions, labels, stats = eval_nn_and_bnn(
            model, variables, est, in_data, cfg.samples, rng, cfg.stats,
            compute_dtype=dtype, sample_chunk=chunk, mesh=mesh)
        ood_predictions, bnn_ood_predictions, _, _ = eval_nn_and_bnn(
            model, variables, est, out_data, cfg.samples, rng, False,
            compute_dtype=dtype, sample_chunk=chunk, mesh=mesh)
    else:
        # closed-form / GLM predictives (extension beyond the reference;
        # eval/predictive.py): same posterior ensemble, different push
        # through the network
        if cfg.stats:
            raise ValueError(
                "--stats tracks running statistics over the SAMPLED "
                f"ensemble; it is undefined for --predictive {pred_kind}")
        if chunk:
            # match the FGSM precedent: never silently ignore a flag
            raise ValueError(
                "--sample_chunk is only implemented for the sampled "
                f"predictive; drop it or use --predictive sampled "
                f"(got --predictive {pred_kind})")
        from curvature_tpu.eval import (eval_bnn_closed_form,
                                        eval_bnn_linearized)

        def alt_bnn(data):
            if pred_kind in ("probit", "bridge"):
                return eval_bnn_closed_form(model, variables, est, data,
                                            cfg.samples, rng, pred_kind,
                                            mesh=mesh)[0]
            if pred_kind.startswith("linearized"):
                method = pred_kind[len("linearized"):].lstrip("_") or "mc"
                return eval_bnn_linearized(model, variables, est, data,
                                           cfg.samples, rng, method,
                                           mesh=mesh)[0]
            raise ValueError(f"unknown --predictive {pred_kind!r}")

        stats = {}
        predictions, labels = eval_nn(model, variables, in_data,
                                      compute_dtype=dtype, mesh=mesh)
        bnn_predictions = alt_bnn(in_data)
        ood_predictions, _ = eval_nn(model, variables, out_data,
                                     compute_dtype=dtype, mesh=mesh)
        bnn_ood_predictions = alt_bnn(out_data)
    _print_summary("NN ", predictions, labels)
    _print_summary("BNN", bnn_predictions, labels)

    # OOD separability with predictive entropy as the score (extension:
    # the reference only plots ECDF panels, visualize.py:148-208)
    from curvature_tpu.eval import metrics
    def _ent(p):
        return np.asarray(metrics.predictive_entropy(np.asarray(p)))
    auroc_nn = metrics.auroc(_ent(predictions), _ent(ood_predictions))
    auroc_bnn = metrics.auroc(_ent(bnn_predictions),
                              _ent(bnn_ood_predictions))
    print(f"OOD AUROC (predictive entropy): NN {auroc_nn:.4f} "
          f"| BNN {auroc_bnn:.4f}")

    if not cfg.no_results:
        np.savez_compressed(results_path + ".npz",
                            stats=stats,
                            labels=labels,
                            predictions=predictions,
                            bnn_predictions=bnn_predictions,
                            ood_predictions=ood_predictions,
                            bnn_ood_predictions=bnn_ood_predictions,
                            auroc=np.asarray([auroc_nn, auroc_bnn]))
    if cfg.plot:
        from curvature_tpu.pipelines import plot
        plot.ood_panels(cfg, predictions, bnn_predictions, ood_predictions,
                        bnn_ood_predictions, labels, fig_path)
    return predictions, bnn_predictions, labels


#: the reference's epsilon sweep (evaluate.py:307)
FGSM_STEPS = np.concatenate([np.linspace(0, 0.2, 11), np.linspace(0.3, 1, 8)])


def adversarial_attack(cfg, model, variables, est, results_path: str,
                       fig_path: str):
    """FGSM sweep for NN and BNN (evaluate.py:283-318)."""
    data = list(build_data(cfg, splits="test"))
    if cfg.epsilon > 0:
        return eval_fgsm(model, variables, data, cfg.epsilon)[-1]

    stats_dict = {k: [] for k in ("eps", "acc", "ece1", "ece2", "nll", "ent")}
    bnn_stats_dict = {k: [] for k in stats_dict}
    rng = jax.random.PRNGKey(cfg.seed)
    if getattr(cfg, "sample_chunk", 0):
        # the FGSM sweep reuses one resident ensemble across all epsilon
        # steps; chunking is not implemented there — fail the expectation
        # loudly rather than silently ignoring the flag
        raise ValueError(
            "--sample_chunk is not supported by the FGSM sweep (the "
            "ensemble stays resident across the epsilon grid); drop the "
            "flag or lower --samples")
    ensemble = est.ensemble_params(rng, cfg.samples)
    for step in FGSM_STEPS:
        s = eval_fgsm(model, variables, data, float(step))[-1]
        bs = eval_fgsm_bnn(model, variables, est, data, cfg.samples,
                           float(step), rng, ensemble_params=ensemble)[-1]
        for k in stats_dict:
            stats_dict[k].append(s[k])
            bnn_stats_dict[k].append(bs[k])
        if not cfg.no_results:
            np.savez(results_path + "_fgsm.npz", stats=stats_dict,
                     bnn_stats=bnn_stats_dict)
    import tabulate
    print(tabulate.tabulate(stats_dict, headers="keys"))
    print(tabulate.tabulate(bnn_stats_dict, headers="keys"))
    if cfg.plot:
        from curvature_tpu.pipelines import plot
        plot.adversarial_results(FGSM_STEPS, stats_dict, bnn_stats_dict,
                                 fig_path)
    return stats_dict, bnn_stats_dict


def test(cfg, model, variables, fig_path: str = ""):
    """Plain deterministic test pass + reliability diagram
    (evaluate.py:173-196)."""
    from curvature_tpu.parallel import build_mesh
    data = build_data(cfg, splits="test")
    predictions, labels = eval_nn(model, variables, data,
                                  compute_dtype=_compute_dtype(cfg),
                                  mesh=build_mesh(cfg))
    _print_summary("NN ", predictions, labels)
    if cfg.plot:
        from curvature_tpu.pipelines import plot
        plot.reliability_diagram(predictions, labels,
                                 path=fig_path + "_reliability.pdf")
    return predictions, labels


def run(cfg):
    results_path, fig_path = results_paths(cfg)
    model, variables = build_model(cfg)
    if cfg.ood or cfg.fgsm:
        est = load_estimator(cfg, model, variables)
        if cfg.estimator == "swag" and getattr(cfg, "bn_update", False):
            # SWA-averaged weights shift the activation statistics; standard
            # SWAG practice re-estimates BN running stats before evaluating
            from curvature_tpu.estimators.swag import update_batch_stats
            if variables.get("batch_stats"):
                stats = update_batch_stats(
                    model, est.mean, variables["batch_stats"],
                    build_data(cfg, splits="train"))
                variables = {"params": variables["params"],
                             "batch_stats": stats}
                est.variables = variables
        invert_from_config(cfg, est, results_path)
        if cfg.fgsm:
            return adversarial_attack(cfg, model, variables, est,
                                      results_path, fig_path)
        return out_of_domain(cfg, model, variables, est, results_path,
                             fig_path)
    return test(cfg, model, variables, fig_path)


def main(argv=None):
    from curvature_tpu.utils.config import setup
    run(setup(argv))


if __name__ == "__main__":
    main()
