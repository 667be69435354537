"""End-to-end cross-framework pipeline parity (VERDICT r1 item 4).

Drives the installed PyTorch reference through its full pipeline —
factor estimation -> damped inversion -> sample_and_replace -> Bayesian
ensemble eval -> metrics — on the bundled LeNet-5 checkpoint with a fixed
input set, and requires the *end-of-pipeline* BNN predictions and metrics
to agree with ours, not just single-batch factors.

Posterior noise is the controlled variable: both frameworks consume the
same numpy N(0,1) draws through their own samplers' conventions
(curvatures.py:186-193 Diagonal, 387-392 KFAC, 453-460 EFB), so agreement
is exact (no Monte-Carlo tolerance). EFB eigenvector sign freedom is
aligned per column before injecting noise (the posterior is invariant;
exact parity of individual samples is not).

No real MNIST exists in this environment; the input set is fixed synthetic
MNIST-shaped data (tutorial.ipynb cells 18-20 define the target semantics,
not the target constants, which need the real test set).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_harness as H

from curvature_tpu import estimators
from curvature_tpu.eval import metrics
from curvature_tpu.models.lenet5 import TORCH_KEY_MAP
from curvature_tpu.models.torch_convert import convert_torch_state_dict
from curvature_tpu.nn.core import apply_matrix_delta
from curvature_tpu import models

pytestmark = pytest.mark.slow

B = 256
S_FISHER = 2     # empirical-Fisher label sets (shared across frameworks)
S_POST = 5       # posterior samples (shared noise)
ADD, MULT = 10.0, 100.0
LAYERS = ["conv1", "conv2", "fc1", "fc2", "fc3"]


@pytest.fixture(scope="module")
def pipeline_setup():
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature.lenet5 import lenet5 as torch_lenet5

    tmodel = torch_lenet5(pretrained="", device="cpu")
    state = torch.load("/root/reference/curvature/lenet5_mnist.pth",
                       map_location="cpu")
    tmodel.load_state_dict(state)
    tmodel.eval()

    variables = convert_torch_state_dict(tmodel.state_dict(), TORCH_KEY_MAP)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    variables.setdefault("batch_stats", {})
    jmodel = models.lenet5()
    jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))

    rng = np.random.default_rng(123)
    x = rng.random((B, 1, 28, 28)).astype(np.float32)
    y = rng.integers(0, 10, size=(B,))
    fisher_labels = rng.integers(0, 10, size=(S_FISHER, B))
    return tmodel, jmodel, variables, x, y, fisher_labels


def _softmax(logits):
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _bnn_reference(tmodel, est_name, x, fisher_labels, noise):
    """Reference pipeline: update -> invert -> per-sample replace+forward.
    The random draw in each sampler (curvatures.py:186-193, 387-392,
    453-460) is replaced by the shared ``noise[s][layer]`` array; everything
    else (factor math, damping, bias split, weight replacement, forward) is
    the reference's own code."""
    tx = torch.from_numpy(x)
    tlabels = torch.from_numpy(fisher_labels)
    kfac = None
    if est_name == "EFB":
        kfac = H.run_reference_estimator("KFAC", tmodel, tx, tlabels, B)
        est = H.run_reference_estimator("EFB", tmodel, tx, tlabels, B,
                                        factors=kfac.state)
    else:
        est = H.run_reference_estimator(est_name, tmodel, tx, tlabels, B)
    est.invert(ADD, MULT)

    probs = []
    layers = [l for l in tmodel.modules()
              if l.__class__.__name__ in ("Linear", "Conv2d")]
    for s in range(S_POST):
        tmodel.load_state_dict(est.model_state)
        for li, layer in enumerate(layers):
            z = torch.from_numpy(noise[s][li])
            if est_name == "Diagonal":
                delta = z * est.inv_state[layer]
            elif est_name == "KFAC":
                first, second = est.inv_state[layer]
                delta = (first @ z @ second.t()).t()
            else:  # EFB
                first, second = est.eigvecs[layer]
                delta = (first @ (z * est.inv_state[layer].t())
                         @ second.t()).t()
            est._replace(delta, layer.weight, layer.bias)
        with torch.no_grad():
            probs.append(_softmax(tmodel(torch.from_numpy(x)).numpy()))
    tmodel.load_state_dict(est.model_state)
    return est, np.stack(probs)


def _bnn_ours(jmodel, variables, est_name, x, fisher_labels, noise,
              sign_align=None):
    jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jlabels = jnp.asarray(fisher_labels)
    if est_name == "EFB":
        kfac = estimators.KFAC(jmodel, variables)
        kfac.update(jx, labels=jlabels)
        est = estimators.EFB(jmodel, variables, kfac.state)
    else:
        cls = {"Diagonal": estimators.Diagonal,
               "KFAC": estimators.KFAC}[est_name]
        est = cls(jmodel, variables)
    est.update(jx, labels=jlabels)
    est.invert(ADD, MULT)

    probs = []
    for s in range(S_POST):
        deltas = {}
        for li, name in enumerate(LAYERS):
            z = jnp.asarray(noise[s][li])
            if est_name == "Diagonal":
                deltas[name] = z * est.inv_state[name]
            elif est_name == "KFAC":
                inv = est.inv_state[name]
                deltas[name] = (inv["a_chol"] @ z @ inv["g_chol"].T).T
            else:  # EFB — rotate the shared noise into our eigenbasis
                ra, rg = sign_align[name]
                zz = ra @ z @ rg.T
                ua = est.inv_state["eigvecs"][name]["a"]
                ug = est.inv_state["eigvecs"][name]["g"]
                deltas[name] = (ua @ (zz * est.inv_state["ilam"][name].T)
                                @ ug.T).T
        params = apply_matrix_delta(est.metas, est.mean_params, deltas)
        out, _ = jmodel.apply({"params": params, "batch_stats": {}}, jx)
        probs.append(_softmax(np.asarray(out)))
    return est, np.stack(probs)


@pytest.mark.parametrize("est_name", ["Diagonal", "KFAC", "EFB"])
def test_pipeline_statistical_parity(pipeline_setup, est_name):
    tmodel, jmodel, variables, x, y, fisher_labels = pipeline_setup

    rng = np.random.default_rng(7)
    # shared posterior noise, shaped per layer as [cols(+1), out] for
    # KFAC/EFB (z in curvatures.py:391, 458) / [out, cols+1] for Diagonal
    shapes_zk = [(26, 6), (151, 16), (401, 120), (121, 84), (85, 10)]
    if est_name == "Diagonal":
        noise = [[rng.standard_normal((o, c)).astype(np.float32)
                  for c, o in shapes_zk] for _ in range(S_POST)]
    else:
        noise = [[rng.standard_normal(shape).astype(np.float32)
                  for shape in shapes_zk] for _ in range(S_POST)]

    ref_est, ref_probs = _bnn_reference(tmodel, est_name, x, fisher_labels,
                                        noise)

    sign_align = None
    if est_name == "EFB":
        # torch and jax eigh agree only up to per-column sign — and up to an
        # arbitrary orthogonal rotation inside (near-)degenerate eigenspaces
        # (rank-deficient factors have large null spaces here). The noise is
        # aligned through the full rotation R = U_ours^T U_ref, which is
        # sign-diagonal on non-degenerate columns and block-orthogonal on
        # degenerate ones; the posterior is invariant, per-sample identity
        # requires it.
        ours_tmp = estimators.KFAC(jmodel, variables)
        ours_tmp.update(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        labels=jnp.asarray(fisher_labels))
        efb_tmp = estimators.EFB(jmodel, variables, ours_tmp.state)
        sign_align = {}
        for name, layer in zip(LAYERS, ref_est.eigvecs):
            ua_r, ug_r = [t.numpy() for t in ref_est.eigvecs[layer]]
            ua_o = np.asarray(efb_tmp.eigvecs[name]["a"])
            ug_o = np.asarray(efb_tmp.eigvecs[name]["g"])
            ra = ua_o.T @ ua_r
            rg = ug_o.T @ ug_r
            # the alignment must be orthogonal (same eigenspaces)
            np.testing.assert_allclose(ra @ ra.T, np.eye(ra.shape[0]),
                                       atol=5e-3)
            np.testing.assert_allclose(rg @ rg.T, np.eye(rg.shape[0]),
                                       atol=5e-3)
            sign_align[name] = (jnp.asarray(ra), jnp.asarray(rg))

    _, our_probs = _bnn_ours(jmodel, variables, est_name, x, fisher_labels,
                             noise, sign_align)

    # per-sample BNN predictions agree (shared noise, no MC slack; the
    # remaining slack is f32 accumulation-order noise amplified through
    # softmax on near-zero probabilities)
    np.testing.assert_allclose(our_probs, ref_probs, rtol=5e-2, atol=5e-4)
    assert np.abs(our_probs - ref_probs).mean() < 1e-4

    # end-of-pipeline metrics agree between frameworks
    ref_mean = ref_probs.mean(axis=0)
    our_mean = our_probs.mean(axis=0)
    import sys
    sys.path.insert(0, "/root/reference")
    from curvature import utils as ref_utils
    ref_acc = ref_utils.accuracy(ref_mean, y)
    our_acc = float(metrics.accuracy(jnp.asarray(our_mean), jnp.asarray(y)))
    ref_ece = ref_utils.expected_calibration_error(ref_mean, y)[0]
    our_ece = float(metrics.expected_calibration_error(
        jnp.asarray(our_mean), jnp.asarray(y))[0])
    ref_nll = ref_utils.negative_log_likelihood(ref_mean, y)
    our_nll = float(metrics.negative_log_likelihood(jnp.asarray(our_mean),
                                                    jnp.asarray(y)))
    assert abs(float(ref_acc) - our_acc) < 0.5          # percent
    assert abs(float(ref_ece) - our_ece) < 5e-3
    assert abs(float(ref_nll) - our_nll) < 1e-3
