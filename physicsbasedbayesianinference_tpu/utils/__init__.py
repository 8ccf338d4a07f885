"""Shared utilities: pytree/array helpers and optional plotting."""

from . import trees
from .trees import ravel_ensemble, tree_bytes, tree_summary

__all__ = ["trees", "plotting", "ravel_ensemble", "tree_bytes",
           "tree_summary"]


def __getattr__(name):
    # matplotlib-dependent module loads lazily (importlib, not
    # ``from . import`` — the latter re-enters this __getattr__ through
    # _handle_fromlist and recurses)
    if name == "plotting":
        import importlib
        return importlib.import_module(".plotting", __name__)
    raise AttributeError(name)
