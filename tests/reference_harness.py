"""Harness for golden-parity tests against the PyTorch reference.

Imports the reference library read-only from /root/reference and runs its
estimators on a tiny torch model as ground truth; our estimators run on the
weight-converted JAX twin with byte-identical inputs and MC labels.

``torch.symeig`` was removed in torch>=2; the shim below restores the exact
semantics the reference relies on (ascending eigenvalues, optional vectors)
so its EFB/INF code paths execute unmodified.
"""
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")


def _symeig_shim(a, eigenvectors=False, upper=True):
    w, v = torch.linalg.eigh(a)
    if not eigenvectors:
        v = torch.zeros_like(a)
    return w, v


if not hasattr(torch, "_symeig_patched"):
    torch.symeig = _symeig_shim
    torch._symeig_patched = True

from curvature import curvatures as ref_curvatures  # noqa: E402


class TorchFlatten(torch.nn.Module):
    def forward(self, x):
        return x.reshape(x.size(0), -1)


def tiny_torch_convnet(seed: int = 0):
    """Conv(1->4, 3x3 pad 1) -> ReLU -> MaxPool2 -> Flatten -> Linear(36->5)."""
    torch.manual_seed(seed)
    return torch.nn.Sequential(
        torch.nn.Conv2d(1, 4, 3, padding=1),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        TorchFlatten(),
        torch.nn.Linear(4 * 3 * 3, 5),
    )


TINY_KEY_MAP = {"0": "conv1", "4": "fc1"}


def tiny_jax_convnet():
    from curvature_tpu import nn
    return nn.Model(nn.Sequential([
        nn.Conv(4, 3, padding=1, name="conv1"),
        nn.ReLU(),
        nn.MaxPool(2, 2),
        nn.Flatten(),
        nn.Dense(5, name="fc1"),
    ]))


def run_reference_estimator(est_name, model, x, labels_s, batch_size,
                            factors=None, diags=None, lambdas=None):
    """Run a reference estimator's update loop exactly as scripts/factors.py
    does (forward once, backward per MC label set with retain_graph)."""
    criterion = torch.nn.CrossEntropyLoss()
    cls = getattr(ref_curvatures, est_name)
    if est_name == "EFB":
        est = cls(model, factors)
    elif est_name == "INF":
        est = cls(model, diags, factors, lambdas)
        return est
    else:
        est = cls(model)
    model.train()
    logits = model(x)
    for s in range(labels_s.shape[0]):
        loss = criterion(logits, labels_s[s])
        model.zero_grad()
        loss.backward(retain_graph=True)
        est.update(batch_size)
    return est


def ref_state_by_name(est, order):
    """Reference state (keyed by layer objects in module order) -> name keys."""
    out = {}
    items = list(est.state.items())
    assert len(items) == len(order), (len(items), order)
    for name, (_, value) in zip(order, items):
        out[name] = value
    return out


class ReferenceINF(ref_curvatures.INF):
    """The reference INF with its `_dim_reduction` made executable on
    torch>=2 (curvatures.py:643-645 indexes tensors with lists of 0-dim
    tensors, an IndexError since torch 2.x). The 1-based index bookkeeping
    is preserved verbatim semantics-wise; only int() conversions are added,
    so this subclass is valid ground truth for the index selection."""

    @staticmethod
    def _dim_reduction(frst_eigvecs, scnd_eigvecs, lambda_vec, rank):
        if rank >= lambda_vec.shape[0]:
            return frst_eigvecs, scnd_eigvecs, lambda_vec
        m = scnd_eigvecs.shape[1]
        idx_total = torch.argsort(-torch.abs(lambda_vec)) + 1
        idx_top_l = idx_total[0:rank]
        idx_left, idx_right = [], []
        for z in range(rank):
            # reference's float 1-based arithmetic, curvatures.py:627-631
            i = int((float(idx_top_l[z]) - 1.) / m + 1.)
            j = int(idx_top_l[z]) - (m * (i - 1))
            idx_left.append(i)
            idx_right.append(j)
        idx_left = [int(v) for v in torch.unique(torch.tensor(idx_left))]
        idx_right = [int(v) for v in torch.unique(torch.tensor(idx_right))]
        idx_top_lm = [m * (i - 1) + j for i in idx_left for j in idx_right]
        lr_lambda = lambda_vec[[idx - 1 for idx in idx_top_lm]]
        lr_cov_inner = frst_eigvecs[:, [idx - 1 for idx in idx_left]]
        lr_cov_outer = scnd_eigvecs[:, [idx - 1 for idx in idx_right]]
        return lr_cov_inner, lr_cov_outer, lr_lambda


def make_reference_inf(model, diags, factors, lambdas):
    return ReferenceINF(model, diags, factors, lambdas)
