# Sphinx configuration for the curvature_tpu API reference.
#
# The reference ships a Sphinx tree (reference docs/source/conf.py,
# README.rst:268-289); this mirrors that onboarding surface. Build with
# ``sphinx-build -b html docs/source docs/build`` (sphinx is an optional
# doc-time dependency — the markdown docs under docs/ and the executed
# tutorial notebook are the primary onboarding and need nothing).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "curvature_tpu"
author = "curvature_tpu contributors"
release = "0.4.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"
# autodoc imports the real modules (signatures reference jax types), so a
# docs build needs the runtime deps installed — same requirement as the
# reference's Sphinx tree, which automodules the torch-importing package.

templates_path = []
exclude_patterns = []
html_theme = "alabaster"
