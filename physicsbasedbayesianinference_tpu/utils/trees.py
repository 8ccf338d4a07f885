"""Pytree/array utilities used across the framework."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def ravel_ensemble(tree) -> Tuple[Array, callable]:
    """Flatten a per-walker pytree ({site: [W, ...]}) into [W, D] plus an
    unravel function — the walker-batched version of
    ``jax.flatten_util.ravel_pytree`` (which flattens everything)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    w = leaves[0].shape[0]
    shapes = [l.shape[1:] for l in leaves]
    sizes = [int(jnp.prod(jnp.asarray(s))) if s else 1 for s in shapes]
    flat = jnp.concatenate(
        [l.reshape(w, -1) for l in leaves], axis=-1)

    def unravel(q: Array):
        out = []
        offset = 0
        for shape, size in zip(shapes, sizes):
            chunk = q[..., offset:offset + size]
            out.append(chunk.reshape(q.shape[:-1] + shape))
            offset += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unravel


def tree_bytes(tree) -> int:
    """Total bytes of all array leaves."""
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype"))


def tree_summary(tree) -> str:
    """One-line-per-leaf shape/dtype/sharding summary for logging."""
    lines = []

    def visit(path, leaf):
        if hasattr(leaf, "shape"):
            shard = ""
            if hasattr(leaf, "sharding"):
                shard = f" @ {leaf.sharding}"
            lines.append(
                f"  {jax.tree_util.keystr(path)}: "
                f"{leaf.dtype}{list(leaf.shape)}{shard}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return "\n".join(lines)
