"""Shared utilities: pytree/array helpers and optional plotting."""

from . import trees
from .trees import ravel_ensemble, tree_bytes, tree_summary

__all__ = ["trees", "plotting", "ravel_ensemble", "tree_bytes",
           "tree_summary"]


def __getattr__(name):
    # matplotlib-dependent module loads lazily
    if name == "plotting":
        from . import plotting
        return plotting
    raise AttributeError(name)
