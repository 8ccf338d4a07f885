"""Distributed systematic resampling over the walker mesh.

SMC resampling is the one ensemble operation that genuinely communicates
across walkers (SURVEY.md §7 risks: "sharded resampling without killing
scaling efficiency"). The GSPMD path (``jnp.take`` by global indices,
smc.py) lets XLA emit an all-to-all over the full ``[W, D]`` ensemble and
needs the whole index space per device. This module implements the same
*exact* global systematic resampling as a **ring stream**: per-device
memory stays O(W/K), communication is K-1 neighbor ``ppermute`` hops of
one walker block (the same schedule as :mod:`.ring`'s N-body forces), and
the only global exchange is an ``all_gather`` of K scalars (per-shard
log-weight totals).

Equivalence: with the same uniform offset ``u0``, the output equals dense
``jnp.take(q, smc.systematic_indices(...), axis=0)`` exactly (up to float
reduction order in the CDF) — tested on the virtual 8-device mesh. The
decomposition: global CDF position ``(j + u0)/W`` is split into (owner
shard, position within the owner's local CDF) using the gathered shard
totals; each ring step serves the slots owned by the block currently
passing through.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import WALKER_AXIS

Array = jax.Array


def _local_resample_plan(logw_blk, u0, axis_name):
    """Compute, for each of this shard's output slots: the owner shard of
    its global-CDF position and the position within the owner's local CDF.
    Returns (owner [W_loc] int32, rel [W_loc] in [0,1))."""
    k = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    w_loc = logw_blk.shape[0]
    w_tot = k * w_loc
    dtype = logw_blk.dtype

    lse_local = jax.scipy.special.logsumexp(logw_blk)
    lse_all = jax.lax.all_gather(lse_local, axis_name)        # [K] scalars
    lse_global = jax.scipy.special.logsumexp(lse_all)
    shard_w = jnp.exp(lse_all - lse_global)                   # sums to 1
    shard_cum = jnp.cumsum(shard_w)

    slots = me * w_loc + jnp.arange(w_loc, dtype=dtype)
    pos = (u0 + slots) / w_tot                                # sorted in [0,1)
    owner = jnp.clip(
        jnp.searchsorted(shard_cum, pos, side="right"), 0, k - 1)
    base = jnp.concatenate([jnp.zeros((1,), dtype), shard_cum[:-1]])
    denom = jnp.maximum(shard_w[owner], jnp.finfo(dtype).tiny)
    rel = jnp.clip((pos - base[owner]) / denom, 0.0, 1.0)
    return owner.astype(jnp.int32), rel


def _ring_serve(tree_blk, logw_blk, owner, rel, axis_name):
    """Stream every shard's block around the ring; serve each output slot
    from the block that owns its CDF position."""
    k = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    w_loc = logw_blk.shape[0]
    perm = [(j, (j - 1) % k) for j in range(k)]

    out = jax.tree_util.tree_map(jnp.zeros_like, tree_blk)
    src_tree, src_lw = tree_blk, logw_blk
    for s in range(k):
        src_id = jax.lax.rem(me + s, jnp.asarray(k, me.dtype))
        # local CDF of the visiting block (normalised within the block)
        lw = src_lw - jax.scipy.special.logsumexp(src_lw)
        cum = jnp.cumsum(jnp.exp(lw))
        idx = jnp.clip(
            jnp.searchsorted(cum, rel, side="right"), 0, w_loc - 1)
        take = owner == src_id
        out = jax.tree_util.tree_map(
            lambda o, src: jnp.where(
                take.reshape((-1,) + (1,) * (o.ndim - 1)),
                jnp.take(src, idx, axis=0), o),
            out, src_tree)
        if s + 1 < k:
            src_tree = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), src_tree)
            src_lw = jax.lax.ppermute(src_lw, axis_name, perm)
    return out


@partial(jax.jit, static_argnames=("mesh", "axis_name"))
def ring_systematic_resample(
    key: Array,
    tree,
    log_w: Array,
    *,
    mesh: Mesh,
    axis_name: str = WALKER_AXIS,
):
    """Exact global systematic resampling of every walker-leading array in
    ``tree`` by ``log_w``, sharded over ``axis_name`` with ring streaming.

    Returns ``(tree_resampled, zeroed log-weights)`` — the same contract
    as :func:`~..smc.resample` (method="systematic"), distributed.
    """
    log_w = jnp.asarray(log_w)
    k = mesh.shape[axis_name]
    if log_w.shape[0] % k != 0:
        raise ValueError(
            f"num_walkers={log_w.shape[0]} must divide mesh size {k}")
    u0 = jax.random.uniform(key, (), dtype=log_w.dtype)

    def local(tree_blk, logw_blk, u0):
        owner, rel = _local_resample_plan(logw_blk, u0, axis_name)
        out = _ring_serve(tree_blk, logw_blk, owner, rel, axis_name)
        return out, jnp.zeros_like(logw_blk)

    def spec(x):
        return P(axis_name, *([None] * (x.ndim - 1)))

    tree_specs = jax.tree_util.tree_map(spec, tree)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(tree_specs, P(axis_name), P()),
        out_specs=(tree_specs, P(axis_name)),
    )(tree, log_w, u0)
