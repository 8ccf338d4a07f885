"""Sharded HMC execution: shard_map kernel wrapper + auto-SPMD run.

Two complementary paths, both over a ``walkers`` mesh axis (the TPU-native
replacement for the reference's planned MPI parallelism, reference
manuals/SetUp.md:82-200; SURVEY.md §2 parallelism audit):

* :func:`build_sharded_hmc_step` — an explicit ``jax.shard_map`` wrapper
  around a built HMC kernel: each device owns a walker block, draws its own
  per-shard RNG stream (key folded with the mesh axis index), and ensemble
  scalars (mean acceptance/divergence/energy) reduce with ``pmean`` over
  ICI. Communication is explicit and provably just a few scalar
  collectives per transition. NOTE: on the experimental single-chip
  tunnel backend of this dev environment, any shard_map-partitioned
  executable runs ~7x slower than the identical GSPMD program (measured,
  independent of kernel choice or where the shard_map boundary sits) —
  prefer the GSPMD path below for throughput there; on standard pod
  runtimes shard_map is the explicit-control option.

* :func:`sharded_run_hmc` — the zero-ceremony path: place the initial
  positions with a walker sharding and call the ordinary
  :func:`~..hmc.run_hmc`; GSPMD propagates the sharding through every scan.
  Statistically identical to the single-device run (same RNG streams;
  floating-point reduction order in the ensemble-mean adaptation statistics
  may differ across shardings), which the parity tests check to tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..hmc import HMCInfo, HMCKernel, HMCState
from .mesh import WALKER_AXIS, walker_sharding


def _specs_like(tree, num_walkers: int, axis_name: str):
    """P(axis_name, None, ...) for walker-leading arrays, P() otherwise."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_walkers:
            return P(axis_name, *([None] * (x.ndim - 1)))
        return P()
    return jax.tree_util.tree_map(spec, tree)


def build_sharded_hmc_step(kernel: HMCKernel, mesh: Mesh,
                           state_example: HMCState,
                           axis_name: str = WALKER_AXIS):
    """Wrap ``kernel.step`` in shard_map over the walker axis.

    Returns a jitted ``step(key, state, step_size) -> (state', info, stats)``
    where ``key`` is a single replicated key (each shard folds in its mesh
    position for an independent stream) and ``stats`` is a dict of
    ensemble-level scalars pmean-reduced across all devices (the psum-shaped
    metric reductions SURVEY.md §5 calls for).
    """
    num_walkers = state_example.ensemble.q.shape[0]
    state_specs = _specs_like(state_example, num_walkers, axis_name)
    info_specs = HMCInfo(
        accept_prob=P(axis_name),
        accepted=P(axis_name),
        energy_error=P(axis_name),
        divergent=P(axis_name),
        potential_energy=P(axis_name),
        step_size=P(),
    )

    def local_step(key, state, step_size):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        new_state, info = kernel.step(key, state, step_size)
        stats = {
            "accept_rate": jax.lax.pmean(
                jnp.mean(info.accept_prob), axis_name),
            "divergence_rate": jax.lax.pmean(
                jnp.mean(info.divergent.astype(jnp.float32)), axis_name),
            "mean_potential_energy": jax.lax.pmean(
                jnp.mean(info.potential_energy), axis_name),
        }
        return new_state, info, stats

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), state_specs, P()),
        out_specs=(state_specs, info_specs, P()),
        # pallas_call's out_shape structs carry no varying-mesh-axes
        # annotation, so the vma checker cannot see through the fused
        # trajectory kernel; the specs above are the full contract.
        check_vma=False,
    )

    @jax.jit
    def step(key, state, step_size):
        return sharded(key, state, jnp.asarray(step_size))

    # the un-jitted shard_map callable, for composing into larger jitted
    # programs (e.g. a lax.scan over transitions)
    step.inner = sharded  # type: ignore[attr-defined]
    return step


def sharded_run_hmc(key, potential_fn, init_q, *, mesh: Optional[Mesh] = None,
                    **run_kwargs):
    """GSPMD path: shard the initial positions over the mesh and run the

    standard :func:`~..hmc.run_hmc`; XLA partitions every scan over the
    walker axis automatically and inserts the (scalar) collectives for the
    adaptation reductions. Results match the unsharded run with the same key
    up to floating-point reduction order.

    The kernel is pinned to ``"xla"`` (unless the caller overrides):
    GSPMD cannot partition a ``pallas_call``, so the fused engine under
    auto-sharding would force a gather onto one device. The fused
    multi-chip path is :func:`build_sharded_hmc_step` — pass it a
    ``build_fused_hmc_kernel(...)`` kernel and each device runs the
    pallas transition on its own walker shard inside ``shard_map``.
    """
    from ..hmc import run_hmc
    from .mesh import make_walker_mesh

    if mesh is None:
        mesh = make_walker_mesh()
    run_kwargs.setdefault("kernel", "xla")
    init_q = jnp.asarray(init_q)
    if init_q.shape[0] % mesh.devices.size != 0:
        raise ValueError(
            f"num_walkers={init_q.shape[0]} must be divisible by the mesh "
            f"size {mesh.devices.size}")
    init_q = jax.device_put(init_q, walker_sharding(mesh, init_q.ndim))
    return run_hmc(key, potential_fn, init_q, **run_kwargs)
