"""Pallas TPU kernels for the sampling hot path.

Two kernels, chosen by profiling the fused-XLA baseline (see module docs in
ops/integrators.py):

* :func:`make_pallas_leapfrog` — the whole L-step leapfrog trajectory for a
  walker block executed inside ONE kernel with q/p/grad resident in VMEM.
  The XLA `lax.scan` version round-trips the carry (q, p, grad ~ 3 x W x D
  floats) through HBM every step; for the small-D potentials this framework
  targets (the BASELINE 32-dim ensemble config) that HBM traffic — not
  compute — is the bound, so fusing the trajectory cuts memory traffic by
  ~num_steps x. The force is whatever jax-traceable ``vg_fn`` the caller
  supplies (analytic gradients or autodiff — both trace into the kernel as
  VPU/MXU ops).

* :func:`nbody_accelerations_pallas` — blockwise-tiled O(N^2) gravitational
  accelerations in dimension-major ``[3, N]`` layout (bodies on the lane
  axis, pairwise [block, block] tiles on the VPU), the reference's
  ``getAccelNBody`` (reference potential.py:30-53) at large N. One target
  tile stays resident while source tiles stream; masking handles the
  diagonal and the padded tail.

Both fall back to ``interpret=True`` off-TPU so the same code path is
exercised by the CPU test suite (SURVEY.md §4 testing strategy).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(n: int, preferred: int) -> Optional[int]:
    """Largest divisor of n that is <= preferred (None if n == 0)."""
    if n <= 0:
        return None
    b = min(preferred, n)
    while n % b != 0:
        b -= 1
    return b


# ---------------------------------------------------------------------------
# Fused leapfrog trajectory
# ---------------------------------------------------------------------------


def make_pallas_leapfrog(block_walkers: int = 256):
    """Build an integrator with the :mod:`..ops.integrators` signature

        integrate(vg_fn, q, p, *, step_size, num_steps, inv_mass,
                  grad=None, potential_energy=None)
          -> (q', p', potential_energy', grad')

    that runs the whole kick-drift-kick trajectory per walker block inside
    one Pallas kernel. ``vg_fn`` must be pure jnp (it is traced into the
    kernel); ``inv_mass`` broadcastable to [D]; ``step_size`` scalar
    (traced ok — it rides in SMEM).
    """

    def integrate(vg_fn, q, p, *, step_size, num_steps, inv_mass,
                  grad=None, potential_energy=None):
        w, d = q.shape
        bw = _pick_block(w, block_walkers)
        inv_mass_arr = jnp.broadcast_to(
            jnp.asarray(inv_mass, q.dtype), (1, d))
        dt_arr = jnp.reshape(jnp.asarray(step_size, q.dtype), (1, 1))

        # Potentials may close over array data (spring constants, Gaussian
        # precision, body masses...). Pallas kernels cannot capture such
        # constants, so trace vg_fn to a jaxpr, hoist its consts into
        # explicit inputs (flattened to [1, size] so VMEM sees 2D blocks),
        # and re-evaluate the jaxpr inside the kernel.
        example = jax.ShapeDtypeStruct((bw, d), q.dtype)
        closed = jax.make_jaxpr(lambda qq: vg_fn(qq))(example)
        consts = [jnp.asarray(c) for c in closed.consts]
        const_shapes = [c.shape for c in consts]
        const_inputs = [jnp.reshape(c, (1, -1)) for c in consts]

        def converted(qq, *cvals):
            u, g = jax.core.eval_jaxpr(closed.jaxpr, cvals, qq)
            return u, g

        def kernel(dt_ref, q_ref, p_ref, im_ref, *rest):
            const_refs = rest[:len(consts)]
            q_out, p_out, u_out, g_out = rest[len(consts):]
            cvals = [ref[:].reshape(shape)
                     for ref, shape in zip(const_refs, const_shapes)]

            def vg(qq):
                return converted(qq, *cvals)

            dt = dt_ref[0, 0]
            im = im_ref[:]  # [1, D]
            q = q_ref[:]
            p = p_ref[:]
            u, g = vg(q)

            def body(_, carry):
                q, p, u, g = carry
                p = p - (0.5 * dt) * g          # kick
                q = q + dt * p * im             # drift
                u, g = vg(q)
                p = p - (0.5 * dt) * g          # kick
                return (q, p, u, g)

            q, p, u, g = jax.lax.fori_loop(
                0, num_steps, body, (q, p, u, g))
            q_out[:] = q
            p_out[:] = p
            u_out[:] = u[:, None]
            g_out[:] = g

        grid = (w // bw,)
        block = lambda i: (i, 0)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, ci.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for ci in const_inputs
            ],
            out_specs=[
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((w, d), q.dtype),
                jax.ShapeDtypeStruct((w, d), q.dtype),
                jax.ShapeDtypeStruct((w, 1), q.dtype),
                jax.ShapeDtypeStruct((w, d), q.dtype),
            ],
            interpret=_use_interpret(),
        )(dt_arr, q, p, inv_mass_arr, *const_inputs)
        q_new, p_new, u_new, g_new = out
        return q_new, p_new, u_new[:, 0], g_new

    integrate.grad_evals_per_step = 1  # type: ignore[attr-defined]
    integrate.name = "pallas_leapfrog"  # type: ignore[attr-defined]
    return integrate


pallas_leapfrog = make_pallas_leapfrog()


# ---------------------------------------------------------------------------
# Blockwise N-body accelerations
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("block", "g_const", "softening"))
def nbody_accelerations_pallas(
    x: Array,
    mass: Array,
    *,
    g_const: float = 1.0,
    softening: float = 1e-8,
    block: int = 512,
) -> Array:
    """Gravitational accelerations ``[N, 3] -> [N, 3]`` tiled over body
    blocks (see module doc). Bodies are padded to a block multiple; padded
    sources carry zero mass so they contribute nothing.
    """
    n, d = x.shape
    if d != 3:
        raise ValueError(f"expected 3-space positions, got D={d}")
    bn = min(block, max(128, 1))
    n_pad = -(-n // bn) * bn
    xt = jnp.zeros((8, n_pad), x.dtype)
    # dimension-major layout, rows padded to the f32 sublane tile (8)
    xt = xt.at[:3, :n].set(x.T)
    m_pad = jnp.zeros((8, n_pad), x.dtype).at[0, :n].set(mass)

    num_blocks = n_pad // bn
    soft2 = float(softening) ** 2

    def kernel(xi_ref, x_all_ref, m_all_ref, a_out):
        xi = xi_ref[:]                    # [8, BN] target block
        acc = jnp.zeros((8, xi.shape[1]), xi.dtype)
        i = pl.program_id(0)

        def body(j, acc):
            xj = x_all_ref[:, pl.ds(j * bn, bn)]    # [8, BN]
            mj = m_all_ref[0, pl.ds(j * bn, bn)]    # [BN]
            # pairwise components: [BN_i, BN_j]
            dx = xj[0][None, :] - xi[0][:, None]
            dy = xj[1][None, :] - xi[1][:, None]
            dz = xj[2][None, :] - xi[2][:, None]
            r2 = dx * dx + dy * dy + dz * dz + soft2
            # exclude self-pairs (i==j within the same block)
            same_block = i == j
            rows = jax.lax.broadcasted_iota(jnp.int32, r2.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, r2.shape, 1)
            self_pair = same_block & (rows == cols)
            inv_r3 = jnp.where(self_pair, 0.0, jax.lax.rsqrt(r2) ** 3)
            w = mj[None, :] * inv_r3                 # [BN_i, BN_j]
            ax = jnp.sum(w * dx, axis=1)
            ay = jnp.sum(w * dy, axis=1)
            az = jnp.sum(w * dz, axis=1)
            acc = acc.at[0].add(ax).at[1].add(ay).at[2].add(az)
            return acc

        acc = jax.lax.fori_loop(0, num_blocks, body, acc)
        a_out[:] = acc

    at = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((8, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), x.dtype),
        interpret=_use_interpret(),
    )(xt, xt, m_pad)
    return g_const * at[:3, :n].T
