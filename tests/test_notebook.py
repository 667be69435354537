"""Execute docs/tutorial.ipynb headless — the executed-notebook golden
record. The reference ships its tutorial.ipynb WITH stored outputs, which
act as a de-facto regression record (SURVEY.md section 4; reference
tutorial.ipynb cells 7/18/20 carry the published metric numbers). This
test runs our notebook end-to-end on CPU with synthetic data (no dataset
downloads) and asserts the key metric cells print finite numbers, so a
broken tutorial cannot go unnoticed.

Refresh the stored outputs with:  python tests/test_notebook.py
"""
import math
import os
import re

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")
NB_PATH = os.path.join(DOCS, "tutorial.ipynb")
FLOAT = re.compile(r"-?\d+\.\d+")


def _stream_text(cell):
    return "".join(o.get("text", "") for o in cell.get("outputs", [])
                   if o.get("output_type") == "stream")


def _execute():
    nb = nbformat.read(NB_PATH, as_version=4)
    nbformat.validator.normalize(nb)
    # the kernel is a FRESH process: conftest's jax.config CPU override does
    # not reach it, and JAX_PLATFORMS=cpu is ignored by this image's site
    # customization (the axon plugin wins) — a wedged TPU tunnel would hang
    # the first compute cell until the nbclient timeout. Cell 1 honors this
    # env var and pins the kernel to CPU.
    os.environ["CURVATURE_TPU_TUTORIAL_CPU"] = "1"
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": DOCS}})
    try:
        client.execute()  # raises CellExecutionError on any failing cell
    finally:
        os.environ.pop("CURVATURE_TPU_TUTORIAL_CPU", None)
    return nb


def _check_metrics(nb):
    """The NN-eval cell and the NN-vs-BNN comparison cell must both print
    finite accuracy/ECE/NLL numbers."""
    by_marker = {}
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        if "NN accuracy" in cell.source:
            by_marker["nn"] = _stream_text(cell)
        if "for name, p in" in cell.source and "BNN" in cell.source:
            by_marker["bnn"] = _stream_text(cell)
    assert set(by_marker) == {"nn", "bnn"}, \
        f"metric cells missing from the notebook: {sorted(by_marker)}"
    for marker, text in by_marker.items():
        values = [float(v) for v in FLOAT.findall(text)]
        assert values, f"{marker} cell printed no numbers: {text!r}"
        assert all(math.isfinite(v) for v in values), (marker, text)
    # the BNN cell compares two models -> two accuracy/ECE/NLL rows
    assert len(FLOAT.findall(by_marker["bnn"])) >= 6, by_marker["bnn"]


@pytest.mark.slow
def test_tutorial_notebook_executes():
    _check_metrics(_execute())


if __name__ == "__main__":  # refresh the committed golden outputs
    executed = _execute()
    _check_metrics(executed)
    nbformat.write(executed, NB_PATH)
    print(f"stored outputs refreshed in {NB_PATH}")
