"""Spectrum plot primitives (factors --spectrum artifacts)."""
import os

import numpy as np

from curvature_tpu.pipelines import plot


def test_spectral_density_writes_figure(tmp_path):
    ritz = np.array([1e-3, 0.1, 2.0, 50.0])
    weights = np.array([0.4, 0.3, 0.2, 0.1])
    path = str(tmp_path / "density.pdf")
    plot.spectral_density(ritz, weights, path=path, label="exact")
    assert os.path.exists(path)


def test_spectral_density_degenerate_inputs(tmp_path):
    # non-finite and non-positive nodes are dropped, empty input no-ops
    path = str(tmp_path / "density.pdf")
    plot.spectral_density(np.array([np.nan, -1.0, 0.0]),
                          np.array([0.5, 0.3, 0.2]), path=path)
    assert os.path.exists(path)


def test_eigenvalue_histogram_true_spectrum_overlay(tmp_path):
    rng = np.random.default_rng(0)
    ev = np.abs(rng.normal(size=200)) + 1e-4
    path = str(tmp_path / "eig.pdf")
    plot.eigenvalue_histogram(ev, path=path, label="KFAC",
                              true_spectrum=np.array([0.5, 1.5, 3.0]))
    assert os.path.exists(path)
