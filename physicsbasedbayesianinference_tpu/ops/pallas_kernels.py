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


def interpret_fused_enabled() -> bool:
    """Opt-in (PBBI_FUSED_INTERPRET=1): run the REAL fused HMC kernel
    bodies under pallas interpret mode off-TPU, with the hardware PRNG
    substituted by a jax.random-backed stream (below). Off by default —
    the composed XLA kernel is much faster for CPU users — but it gives
    the CPU CI coverage of the actual kernel code paths (merged-kick
    loop, Metropolis select, packed reductions): VERDICT.md r4 item 6."""
    import os
    return os.environ.get("PBBI_FUSED_INTERPRET") == "1"


# ---------------------------------------------------------------------------
# In-kernel PRNG indirection: TPU hardware generator on hardware, a
# jax.random stream under interpret mode (the hardware PRNG has no
# interpret-mode lowering). The interpret stream folds (seed, call index)
# into a fixed key — deterministic per transition, independent across the
# kernel's draw sites, statistically equivalent.
# ---------------------------------------------------------------------------

_INTERP_PRNG = {"key": None, "calls": 0}


def _prng_seed(seed) -> None:
    if _use_interpret():
        _INTERP_PRNG["key"] = jax.random.fold_in(
            jax.random.key(0), jnp.asarray(seed, jnp.int32))
        _INTERP_PRNG["calls"] = 0
    else:
        pltpu.prng_seed(seed)


def _random_bits(shape):
    """uint32 random bits from the active in-kernel generator."""
    if _use_interpret():
        _INTERP_PRNG["calls"] += 1
        k = jax.random.fold_in(_INTERP_PRNG["key"], _INTERP_PRNG["calls"])
        return jax.random.bits(k, shape, dtype=jnp.uint32)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _bitcast_i32(bits):
    if _use_interpret():
        return jax.lax.bitcast_convert_type(bits, jnp.int32)
    return pltpu.bitcast(bits, jnp.int32)


def _pick_block(n: int, preferred: int) -> Optional[int]:
    """Largest divisor of n that is <= preferred (None if n == 0)."""
    if n <= 0:
        return None
    b = min(preferred, n)
    while n % b != 0:
        b -= 1
    return b


def _hoist_consts(closed):
    """Turn a closed jaxpr's consts into pallas kernel inputs.

    2D consts (data matrices, precision matrices — e.g. the [256, 31]
    design matrix of a logistic regression) pass through UNCHANGED:
    Mosaic cannot lower the shape cast (1, N) -> (R, C), which is exactly
    the "logreg generic = null" failure VERDICT.md round-2 item 3 tracks.
    Scalars and vectors flatten to a (1, -1) row (VMEM wants 2D blocks)
    and are reshaped back in-kernel ((1, N) -> (N,)/() casts do lower).
    Rank > 2 collapses trailing-dim-major to (lead, last) and is restored
    in-kernel (best effort — no builtin potential produces one).

    Returns (inputs, recon) where recon[i] is None for pass-through
    consts and the original shape otherwise.
    """
    inputs, recon = [], []
    for c in closed.consts:
        c = jnp.asarray(c)
        if c.ndim == 2:
            inputs.append(c)
            recon.append(None)
        elif c.ndim > 2:
            inputs.append(jnp.reshape(c, (-1, c.shape[-1])))
            recon.append(c.shape)
        else:
            inputs.append(jnp.reshape(c, (1, -1)))
            recon.append(c.shape)
    return inputs, recon


def _restore_consts(const_refs, recon):
    return [ref[:] if shape is None else ref[:].reshape(shape)
            for ref, shape in zip(const_refs, recon)]


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
        const_inputs, const_recon = _hoist_consts(closed)

        def converted(qq, *cvals):
            u, g = jax.core.eval_jaxpr(closed.jaxpr, cvals, qq)
            return u, g

        def kernel(dt_ref, q_ref, p_ref, im_ref, *rest):
            const_refs = rest[:len(const_inputs)]
            q_out, p_out, u_out, g_out = rest[len(const_inputs):]
            cvals = _restore_consts(const_refs, const_recon)

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
                pl.BlockSpec(ci.shape, lambda i: (0, 0),
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
        i = pl.program_id(0)
        zero = jnp.zeros((1, xi.shape[1]), xi.dtype)

        def body(j, carry):
            # per-component (1, BN) accumulators: Mosaic has no
            # scatter-add lowering, so NO .at[row].add on the packed
            # [8, BN] array (worked only in CPU interpret mode — caught
            # by the r4 on-hardware suite run)
            axc, ayc, azc = carry
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
            axc = axc + jnp.sum(w * dx, axis=1)[None, :]
            ayc = ayc + jnp.sum(w * dy, axis=1)[None, :]
            azc = azc + jnp.sum(w * dz, axis=1)[None, :]
            return (axc, ayc, azc)

        axc, ayc, azc = jax.lax.fori_loop(
            0, num_blocks, body, (zero, zero, zero))
        a_out[:] = jnp.concatenate(
            [axc, ayc, azc, jnp.zeros((5, xi.shape[1]), xi.dtype)],
            axis=0)

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


# ---------------------------------------------------------------------------
# Fully-fused HMC transition
# ---------------------------------------------------------------------------


def _uniform_from_bits(bits):
    """uint32 -> (0, 1) float32 uniforms (24-bit mantissa path).

    Mosaic has no uint32->f32 cast; the top-24-bit value fits in int32,
    which converts fine after a bitcast.
    """
    high24 = _bitcast_i32(bits >> 8)
    return high24.astype(jnp.float32) * (1.0 / (1 << 24)) \
        + (0.5 / (1 << 24))


def _normal_from_bits(bits1, bits2):
    """Box-Muller from two uint32 draws."""
    u1 = _uniform_from_bits(bits1)
    u2 = _uniform_from_bits(bits2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _normals_both_branches(shape):
    """[2*R, C] standard normals using BOTH Box-Muller branches
    (r cos theta AND r sin theta), so each log/sqrt serves two outputs —
    the momentum refresh is ~1/3 of the roofline's transcendental budget
    and this halves it. Draws bits for [R, C], returns [2R, C]
    (row-stacked: full 128-lane rows throughout)."""
    r_half, c = shape
    bits1 = _random_bits((r_half, c))
    bits2 = _random_bits((r_half, c))
    u1 = _uniform_from_bits(bits1)
    u2 = _uniform_from_bits(bits2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * jnp.pi) * u2
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                           axis=0)


def make_fused_hmc_transition(
    vg_fn,
    *,
    num_steps: int,
    block_walkers: int = 512,  # measured optimum on v5e (46M vs 42M @ 256)
    divergence_threshold: float = 1000.0,
    dynamic_steps: bool = False,
    emit_proposal: bool = False,
):
    """One COMPLETE HMC transition per walker block inside a single Pallas
    kernel: thermal momentum refresh (in-kernel PRNG, Box-Muller),
    ``num_steps`` kick-drift-kick leapfrog with the force traced in,
    Metropolis accept/reject, and the accept-select — no q/p/grad HBM
    round-trips at all between the momentum draw and the accepted state
    write-back. The step-level composition (hmc.py's kernel.step) needs
    ~6 extra elementwise passes over [W, D] for exactly this sequence;
    at small D those passes, not the trajectory math, bound throughput.

    The PRNG is the TPU hardware generator seeded per (transition, block)
    — streams are independent of jax.random but statistically equivalent
    (validated against closed-form posteriors in tests).

    ``scale`` is a traced potential prefactor (the tempered target is
    exp(-beta_T * scale * U)): forces are ``scale * grad U`` and the
    Hamiltonian uses ``scale * U``, while the cached/returned (u, g) stay
    UNSCALED — one compiled kernel serves every SMC tempering stage.

    ``dynamic_steps=True`` makes the leapfrog count a TRACED value: the
    transition takes ``num_steps=<int32 scalar>`` per call, which rides in
    SMEM and bounds an in-kernel ``fori_loop`` — one compiled kernel for
    every jittered ChEES trajectory length (VERDICT.md round-2 item 5);
    the builder's ``num_steps`` then only sizes cost accounting.

    ``emit_proposal=True`` adds the PRE-ACCEPT trajectory endpoint
    ``(q_prop, p_prop)`` to the outputs (two extra [bw, d] VMEM writes;
    ``p_prop`` is the momentum-flipped endpoint, matching the XLA
    jittered kernel's proposal convention) — what the ChEES
    trajectory-length gradient estimator needs, so ChEES *warmup* can run
    on this kernel too instead of dropping to the XLA scan (VERDICT.md
    round-3 item 4).

    Returns ``transition(seed, q, u, g, *, step_size, p_std, inv_mass,
    beta[, scale][, num_steps])
    -> (q', u', g', accept_prob[W], accepted[W], energy_error[W]
    [, q_prop, p_prop])``.
    """

    def transition(seed, q, u, g, *, step_size, p_std, inv_mass, beta,
                   scale=1.0, num_steps=num_steps):
        w, d = q.shape
        bw = _pick_block(w, block_walkers)
        dtype = q.dtype
        p_std_arr = jnp.broadcast_to(jnp.asarray(p_std, dtype), (1, d))
        inv_mass_arr = jnp.broadcast_to(jnp.asarray(inv_mass, dtype), (1, d))
        scalars = jnp.stack([
            jnp.asarray(step_size, dtype), jnp.asarray(beta, dtype),
            jnp.asarray(scale, dtype),
        ]).reshape(1, 3)
        seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1))
        ns_arr = jnp.reshape(jnp.asarray(num_steps, jnp.int32), (1, 1))

        example = jax.ShapeDtypeStruct((bw, d), dtype)
        closed = jax.make_jaxpr(lambda qq: vg_fn(qq))(example)
        const_inputs, const_recon = _hoist_consts(closed)

        def kernel(seed_ref, ns_ref, sc_ref, q_ref, u_ref, g_ref, ps_ref,
                   im_ref, *rest):
            const_refs = rest[:len(const_inputs)]
            outs = rest[len(const_inputs):]
            if emit_proposal:
                (q_out, u_out, g_out, acc_out, taken_out, derr_out,
                 qp_out, pp_out) = outs
            else:
                (q_out, u_out, g_out, acc_out, taken_out, derr_out) = outs
            cvals = _restore_consts(const_refs, const_recon)

            def vg(qq):
                uu, gg = jax.core.eval_jaxpr(closed.jaxpr, cvals, qq)
                return uu, gg

            _prng_seed(seed_ref[0, 0] + pl.program_id(0))
            dt = sc_ref[0, 0]
            beta_v = sc_ref[0, 1]
            s = sc_ref[0, 2]
            n_steps = ns_ref[0, 0] if dynamic_steps else num_steps
            im = im_ref[:]
            q0 = q_ref[:]
            # Keep the potential value 2D [bw, 1] throughout: a 1D slice
            # (u_ref[:, 0]) carried through fori_loop crashes Mosaic's
            # layout inference on matmul-bearing jaxprs ("Check failed:
            # arr.size() >= layout_rank") — the round-2 "logreg generic
            # = null" failure.
            u0 = u_ref[:]            # [bw, 1]
            g0 = g_ref[:]

            if q0.shape[0] % 2 == 0:
                p0 = ps_ref[:] * _normals_both_branches(
                    (q0.shape[0] // 2, q0.shape[1]))
            else:
                bits1 = _random_bits(q0.shape)
                bits2 = _random_bits(q0.shape)
                p0 = ps_ref[:] * _normal_from_bits(bits1, bits2)
            h0 = 0.5 * jnp.sum(p0 * p0 * im, axis=1, keepdims=True) \
                + s * u0

            # merged-kick leapfrog (see make_fused_hmc_diag_quadratic):
            # half-kick in, L x (drift + full kick), half-kick undone
            dtim = dt * im
            ck = dt * s
            p_in = p0 - (0.5 * ck) * g0

            def body(_, carry):
                q, p, u, g = carry
                q = q + p * dtim
                u1d, g = vg(q)
                p = p - ck * g
                return (q, p, u1d[:, None], g)

            q1, p1, u1, g1 = jax.lax.fori_loop(
                0, n_steps, body, (q0, p_in, u0, g0))
            p1 = p1 + (0.5 * ck) * g1
            h1 = 0.5 * jnp.sum(p1 * p1 * im, axis=1, keepdims=True) \
                + s * u1

            energy_error = beta_v * (h1 - h0)      # [bw, 1]
            energy_error = jnp.where(
                jnp.isfinite(energy_error), energy_error, jnp.inf)
            divergent = energy_error > divergence_threshold

            bits_u = _random_bits((q0.shape[0], 1))
            log_u = jnp.log(_uniform_from_bits(bits_u))
            accepted = (log_u < -energy_error) & ~divergent
            accept_prob = jnp.where(
                divergent, 0.0,
                jnp.exp(jnp.minimum(0.0, -energy_error)))

            q_out[:] = jnp.where(accepted, q1, q0)
            u_out[:] = jnp.where(accepted, u1, u0)
            g_out[:] = jnp.where(accepted, g1, g0)
            acc_out[:] = accept_prob
            taken_out[:] = accepted.astype(dtype)
            derr_out[:] = energy_error
            if emit_proposal:
                qp_out[:] = q1
                pp_out[:] = -p1  # flipped, as the XLA kernel's proposal

        grid = (w // bw,)
        block = lambda i: (i, 0)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                rep((1, d)),
                rep((1, d)),
            ] + [rep(ci.shape) for ci in const_inputs],
            out_specs=[
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1), block, memory_space=pltpu.VMEM),
            ] + ([pl.BlockSpec((bw, d), block, memory_space=pltpu.VMEM)] * 2
                 if emit_proposal else []),
            out_shape=[
                jax.ShapeDtypeStruct((w, d), dtype),
                jax.ShapeDtypeStruct((w, 1), dtype),
                jax.ShapeDtypeStruct((w, d), dtype),
                jax.ShapeDtypeStruct((w, 1), dtype),
                jax.ShapeDtypeStruct((w, 1), dtype),
                jax.ShapeDtypeStruct((w, 1), dtype),
            ] + ([jax.ShapeDtypeStruct((w, d), dtype)] * 2
                 if emit_proposal else []),
            interpret=_use_interpret(),
        )(seed_arr, ns_arr, scalars, q, u[:, None], g, p_std_arr,
          inv_mass_arr, *const_inputs)
        q1, u1, g1, acc, taken, derr = out[:6]
        res = (q1, u1[:, 0], g1, acc[:, 0], taken[:, 0] > 0.5, derr[:, 0])
        if emit_proposal:
            res = res + (out[6], out[7])
        return res

    transition.num_steps = num_steps  # type: ignore[attr-defined]
    transition.dynamic_steps = dynamic_steps  # type: ignore[attr-defined]
    return transition


# ---------------------------------------------------------------------------
# Packed fused HMC for ARBITRARY potentials (via ops.packed transform)
# ---------------------------------------------------------------------------


def make_fused_hmc_packed(
    potential_fn,
    *,
    num_dims: int,
    num_steps: int,
    block_rows: int = 1024,  # r4 sweep (merged-kick body, funnel_32
    #                          @102400): 78.3M t/s vs 50.7M at the old
    #                          128 — the jaxpr-packed kernel's heavier
    #                          per-grid-step cost favours bigger blocks
    #                          (benchmarks/results/block_sweep_r4_*.jsonl).
    #                          Treated as an upper preference: the actual
    #                          block is capped by the VMEM estimate below
    #                          (wide-intermediate potentials like logreg
    #                          OOM the 16M scoped vmem at 1024: measured
    #                          19.3M@128 / 21.1M@256 / OOM@1024)
    divergence_threshold: float = 1000.0,
    use_analytic: bool = True,
    dynamic_steps: bool = False,
    emit_proposal: bool = False,
    fast_trajectory_grad: bool = False,
):
    """Fused HMC transition in the walker-packed layout for ANY potential
    (via the :mod:`..ops.packed` jaxpr transform): elementwise force ops
    run at full VPU lane utilisation and layout bookkeeping rides the MXU,
    generalising :func:`make_fused_hmc_diag_quadratic` beyond
    diagonal-quadratic targets (VERDICT.md round-1 item 1). The packed
    functions trace into the kernel through the same jaxpr const-hoisting
    path as every other potential; their block-diagonal matrices arrive as
    VMEM-resident constants.

    The trajectory loop evaluates a gradient-ONLY packed jaxpr (the
    potential value's final reductions are dead inside the loop and jax
    DCEs them away — for packed layouts each is a whole blockdiag matmul
    per step); the value is computed once at the trajectory endpoint.

    Raises :class:`..ops.packed.PackedUnsupported` at build time when the
    potential is outside the packed interpreter's coverage.

    Returns ``transition(seed, q, u, g, *, step_size, p_std, inv_mass,
    beta) -> (q', u', g', accept_prob, accepted, energy_error)`` with
    ``q, g: [W, D]``, ``u: [W]`` — the [W, D] <-> [W/P, P*D] reshape at the
    boundary is a free row-major bitcast.
    """
    from .packed import (
        FAST_TRANSCENDENTAL_SUBS, PackedUnsupported, packed_grad,
        packed_value)

    pack = 128 // num_dims
    if 128 % num_dims != 0:
        raise ValueError(f"packed kernel needs D | 128; got D={num_dims}")
    # ``fast_trajectory_grad`` (default OFF — measured negative): the
    # LOOP force substitutes cheap algebraic stand-ins for logistic/tanh
    # (ops.packed FAST_TRANSCENDENTAL_SUBS). The construction is
    # statistically exact (leapfrog under any force field is
    # volume-preserving + reversible; the Metropolis test uses the exact
    # endpoint potential), BUT on data-sized targets it is useless: the
    # trajectory conserves the SURROGATE Hamiltonian, so the exact
    # energy error picks up the (U - U~) mismatch summed over all data
    # points — measured +114 k_BT systematic offset on logreg_32_n256
    # (256 points x ~0.05 per-point sigmoid error), acceptance -> 0.
    # Kept as an option for narrow/low-data targets; the production fix
    # for the transcendental cost is the exact tanh-form sigmoid in
    # models/transforms.softplus.
    pgrad = packed_grad(
        potential_fn, num_dims, use_analytic=use_analytic,
        fast_subs=FAST_TRANSCENDENTAL_SUBS if fast_trajectory_grad
        else None)
    pvalue = packed_value(potential_fn, num_dims)

    def _vmem_block_cap(dtype) -> int:
        """Bound block_rows by Mosaic's ~16M scoped-VMEM stack: every
        jaxpr intermediate is [rows, width], so rows <= budget / (itemsize
        * sum of intermediate widths). Widths are row-count independent —
        probe them on a tiny example. Narrow potentials (funnel: ~1K
        total width) keep the 1024-row preference; wide ones (logreg:
        each walker's 256 logits pack to [rows, 1024] intermediates)
        drop to 256/128 instead of OOMing at compile."""
        probe = jax.make_jaxpr(lambda qq: pgrad(qq))(
            jax.ShapeDtypeStruct((8, pack * num_dims), dtype))
        width = 0
        for eqn in probe.jaxpr.eqns:
            for v in eqn.outvars:
                shape = getattr(v.aval, "shape", ())
                if shape:
                    width += int(shape[-1])
        # r5 recalibration: with affine-chain fusion the packed jaxprs
        # are lean enough that the live set ~= the sum of output widths
        # (measured: logreg sums 6528 floats/row = 26KB vs Mosaic's
        # reported 24KB/row stack need) — no correction factor; the
        # floor keeps the kernel's own q/p/g carries counted
        width = max(width, 6 * 128)
        budget = 16 * 1024 * 1024
        cap = budget // (4 * width)
        if cap < 128:
            # even the minimum 128-row block would exceed Mosaic's
            # scoped-VMEM stack: there is no viable packed block, and a
            # blind 128 would surface as a compile-time VMEM OOM with
            # no fallback. Raising at build lets build_fused_hmc_kernel
            # catch PackedUnsupported and route to the generic/XLA path.
            raise PackedUnsupported(
                f"packed intermediates ({width} floats/row) exceed the "
                f"16MB scoped-VMEM budget at the 128-row minimum block")
        # round down to a power of two >= 128
        b = 128
        while b * 2 <= cap:
            b *= 2
        return b

    # build-time viability check (float32, the framework dtype): surfaces
    # the PackedUnsupported above where callers have a fallback, not
    # mid-compile
    _vmem_block_cap(jnp.float32)

    def transition(seed, q, u, g, *, step_size, p_std, inv_mass, beta,
                   scale=1.0, num_steps=num_steps):
        w, d = q.shape
        if d != num_dims:
            raise ValueError(f"expected D={num_dims}, got {d}")
        if w % pack != 0:
            raise ValueError(f"num_walkers {w} not divisible by pack {pack}")
        rows = w // pack
        br = _pick_block(rows, min(block_rows, _vmem_block_cap(q.dtype)))
        dtype = q.dtype

        qp = q.reshape(rows, pack * d)
        gp = g.reshape(rows, pack * d)
        up = u.reshape(rows, pack)
        tile = lambda v: jnp.tile(
            jnp.broadcast_to(jnp.asarray(v, dtype), (d,)), (pack,)
        ).reshape(1, pack * d)
        imp = tile(inv_mass)
        psp = tile(p_std)
        scalars = jnp.stack([
            jnp.asarray(step_size, dtype), jnp.asarray(beta, dtype),
            jnp.asarray(scale, dtype),
        ]).reshape(1, 3)
        seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1))
        ns_arr = jnp.reshape(jnp.asarray(num_steps, jnp.int32), (1, 1))

        import numpy as _np
        s_np = _np.zeros((pack * d, pack), _np.float32)
        for j in range(pack):
            s_np[j * d:(j + 1) * d, j] = 1.0
        S = jnp.asarray(s_np, dtype)
        ST = jnp.asarray(s_np.T, dtype)

        # hoist both packed jaxprs' consts (blockdiag matrices, tiled rows,
        # fold masks — the ops.packed transform guarantees they are all 2D)
        # into kernel inputs as genuine 2D VMEM blocks: no in-kernel
        # reshape, which Mosaic cannot lower for matrix-shaped constants
        example = jax.ShapeDtypeStruct((br, pack * d), dtype)
        closed_g = jax.make_jaxpr(lambda qq: pgrad(qq))(example)
        closed_u = jax.make_jaxpr(lambda qq: pvalue(qq))(example)
        consts = [jnp.asarray(c)
                  for c in list(closed_g.consts) + list(closed_u.consts)]
        ng = len(closed_g.consts)
        for c in consts:
            if c.ndim != 2:
                raise ValueError(
                    f"packed const of rank {c.ndim} (shape {c.shape}); "
                    "ops.packed must produce only 2D constants")
        const_inputs = consts

        def kernel(seed_ref, ns_ref, sc_ref, q_ref, u_ref, g_ref, im_ref,
                   ps_ref, s_ref, st_ref, *rest):
            const_refs = rest[:len(consts)]
            outs = rest[len(consts):]
            if emit_proposal:
                (q_out, u_out, g_out, acc_out, taken_out, derr_out,
                 qp_out, pp_out) = outs
            else:
                (q_out, u_out, g_out, acc_out, taken_out, derr_out) = outs
            cvals = [ref[:] for ref in const_refs]

            def grad_fn(qq):
                (gg,) = jax.core.eval_jaxpr(
                    closed_g.jaxpr, cvals[:ng], qq)
                return gg

            def value_fn(qq):
                (uu,) = jax.core.eval_jaxpr(
                    closed_u.jaxpr, cvals[ng:], qq)
                return uu

            _prng_seed(seed_ref[0, 0] + pl.program_id(0))
            dt = sc_ref[0, 0]
            beta_v = sc_ref[0, 1]
            s = sc_ref[0, 2]
            n_steps = ns_ref[0, 0] if dynamic_steps else num_steps
            im = im_ref[:]
            s_mat = s_ref[:]
            st_mat = st_ref[:]
            q0 = q_ref[:]
            u0 = u_ref[:]
            g0 = g_ref[:]

            if q0.shape[0] % 2 == 0:
                p0 = ps_ref[:] * _normals_both_branches(
                    (q0.shape[0] // 2, q0.shape[1]))
            else:
                bits1 = _random_bits(q0.shape)
                bits2 = _random_bits(q0.shape)
                p0 = ps_ref[:] * _normal_from_bits(bits1, bits2)

            def seg_sum(x):  # (br, pack*d) -> (br, pack)
                return jnp.dot(x, s_mat, preferred_element_type=dtype)

            h0 = 0.5 * seg_sum(p0 * p0 * im) + s * u0

            # merged-kick leapfrog (see make_fused_hmc_diag_quadratic)
            dtim = dt * im
            ck = dt * s
            p_in = p0 - (0.5 * ck) * g0

            def body(_, carry):
                q, p, g = carry
                q = q + p * dtim
                g = grad_fn(q)
                p = p - ck * g
                return (q, p, g)

            q1, p1, g1 = jax.lax.fori_loop(
                0, n_steps, body, (q0, p_in, g0))
            p1 = p1 + (0.5 * ck) * g1
            u1 = value_fn(q1)
            h1 = 0.5 * seg_sum(p1 * p1 * im) + s * u1

            derr = beta_v * (h1 - h0)               # (br, pack)
            derr = jnp.where(jnp.isfinite(derr), derr, jnp.inf)
            divergent = derr > divergence_threshold

            bits_u = _random_bits(derr.shape)
            log_u = jnp.log(_uniform_from_bits(bits_u))
            accepted = (log_u < -derr) & ~divergent
            acc_f = accepted.astype(dtype)
            accept_prob = jnp.where(
                divergent, 0.0, jnp.exp(jnp.minimum(0.0, -derr)))

            mask = jnp.dot(acc_f, st_mat, preferred_element_type=dtype)
            # select with where, NOT arithmetic blending: a divergent
            # rejected proposal can carry inf/NaN (hot-replica PT sweeps
            # overflow trajectories routinely) and 0 * inf = NaN would
            # poison the kept state
            q_out[:] = jnp.where(mask > 0.5, q1, q0)
            g_out[:] = jnp.where(mask > 0.5, g1, g0)
            u_out[:] = jnp.where(acc_f > 0.5, u1, u0)
            acc_out[:] = accept_prob
            taken_out[:] = acc_f
            derr_out[:] = derr
            if emit_proposal:
                qp_out[:] = q1
                pp_out[:] = -p1  # flipped, as the XLA kernel's proposal

        grid = (rows // br,)
        block = lambda i: (i, 0)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                rep((1, pack * d)), rep((1, pack * d)),
                rep((pack * d, pack)), rep((pack, pack * d)),
            ] + [rep(ci.shape) for ci in const_inputs],
            out_specs=[
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
            ] + ([pl.BlockSpec((br, pack * d), block,
                               memory_space=pltpu.VMEM)] * 2
                 if emit_proposal else []),
            out_shape=[
                jax.ShapeDtypeStruct((rows, pack * d), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack * d), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
            ] + ([jax.ShapeDtypeStruct((rows, pack * d), dtype)] * 2
                 if emit_proposal else []),
            interpret=_use_interpret(),
        )(seed_arr, ns_arr, scalars, qp, up, gp, imp, psp, S, ST,
          *const_inputs)
        q1, u1, g1, acc, taken, derr = out[:6]
        res = (q1.reshape(w, d), u1.reshape(w), g1.reshape(w, d),
               acc.reshape(w), taken.reshape(w) > 0.5, derr.reshape(w))
        if emit_proposal:
            res = res + (out[6].reshape(w, d), out[7].reshape(w, d))
        return res

    transition.num_steps = num_steps  # type: ignore[attr-defined]
    transition.pack = pack  # type: ignore[attr-defined]
    transition.dynamic_steps = dynamic_steps  # type: ignore[attr-defined]
    return transition


# ---------------------------------------------------------------------------
# Packed fused HMC for diagonal-quadratic targets
# ---------------------------------------------------------------------------


def make_fused_hmc_diag_quadratic(
    *,
    num_steps: int,
    block_rows: int = 128,  # measured optimum on v5e: 210M transitions/s
    #                        (vs 155M @ 512) — more grid steps pipeline the
    #                        HBM streaming against the VPU trajectory math
    divergence_threshold: float = 1000.0,
    trajectory_dtype=None,
    dynamic_steps: bool = False,
):
    """Fused HMC transition specialised to diagonal-quadratic potentials
    ``U(q) = 0.5 sum_d k_d (q_d - mu_d)^2`` (standard normal, harmonic,
    diagonal Gaussians) with a **walker-packed layout**: when D divides
    128, P = 128/D walkers share one lane row, so the VPU runs at full
    lane utilisation instead of D/128 (4x for the 32-dim bench config).
    Per-walker energy reductions become one (rows, 128) x (128, P) MXU
    matmul against a block-diagonal 0/1 matrix; the accept mask expands
    back through its transpose. The [W, D] -> [W/P, P*D] reshape is a
    free row-major bitcast at the kernel boundary.

    ``trajectory_dtype`` (e.g. ``jnp.bfloat16``): run the VPU-bound
    trajectory loop (drift/kick chain) in a reduced precision while
    keeping the momentum draw, both Hamiltonian evaluations, and the
    Metropolis test in the input dtype — the precision-policy experiment
    BASELINE.md's roofline names as the remaining ~2x candidate
    (VERDICT.md round-3 item 6). The accept/reject stays EXACT for the
    map actually simulated (the energy error of the bf16 trajectory is
    measured in f32), so the invariant distribution is preserved up to
    the (measured, test-gated) reversibility defect of rounded leapfrog.
    ``None`` (default) keeps everything in the input dtype.

    ``dynamic_steps=True`` makes the leapfrog count a traced SMEM scalar
    (same contract as the generic/packed variants): one compiled kernel
    serves every jittered trajectory length.

    Returns ``transition(seed, q, *, step_size, p_std, inv_mass, beta,
    k_diag, mean[, num_steps]) -> (q', grad', u', accept_prob, accepted,
    energy_error)``.
    """

    def transition(seed, q, *, step_size, p_std, inv_mass, beta,
                   k_diag, mean, scale=1.0, num_steps=num_steps):
        w, d = q.shape
        if 128 % d != 0:
            raise ValueError(f"packed kernel needs D | 128; got D={d}")
        pack = 128 // d
        if w % pack != 0:
            raise ValueError(f"num_walkers {w} not divisible by pack {pack}")
        rows = w // pack
        br = _pick_block(rows, block_rows)
        dtype = q.dtype

        qp = q.reshape(rows, pack * d)
        tile = lambda v: jnp.tile(
            jnp.broadcast_to(jnp.asarray(v, dtype), (d,)), (pack,)
        ).reshape(1, pack * d)
        kp = tile(k_diag)
        mup = tile(mean)
        imp = tile(inv_mass)
        psp = tile(p_std)
        scalars = jnp.stack([
            jnp.asarray(step_size, dtype), jnp.asarray(beta, dtype),
            jnp.asarray(scale, dtype),
        ]).reshape(1, 3)
        seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1))
        ns_arr = jnp.reshape(jnp.asarray(num_steps, jnp.int32), (1, 1))

        # segment-sum matrix S[pack*d, pack] and its expansion transpose
        import numpy as _np
        s_np = _np.zeros((pack * d, pack), _np.float32)
        for j in range(pack):
            s_np[j * d:(j + 1) * d, j] = 1.0
        S = jnp.asarray(s_np, dtype)
        ST = jnp.asarray(s_np.T, dtype)

        def kernel(seed_ref, ns_ref, sc_ref, q_ref, kp_ref, mu_ref, im_ref,
                   ps_ref, s_ref, st_ref, q_out, g_out, u_out, acc_out,
                   taken_out, derr_out):
            _prng_seed(seed_ref[0, 0] + pl.program_id(0))
            dt = sc_ref[0, 0]
            beta_v = sc_ref[0, 1]
            s = sc_ref[0, 2]
            n_steps = ns_ref[0, 0] if dynamic_steps else num_steps
            k = kp_ref[:]
            mu = mu_ref[:]
            im = im_ref[:]
            s_mat = s_ref[:]
            st_mat = st_ref[:]
            q0 = q_ref[:]

            if q0.shape[0] % 2 == 0:
                p0 = ps_ref[:] * _normals_both_branches(
                    (q0.shape[0] // 2, q0.shape[1]))
            else:
                bits1 = _random_bits(q0.shape)
                bits2 = _random_bits(q0.shape)
                p0 = ps_ref[:] * _normal_from_bits(bits1, bits2)

            def seg_sum(x):  # (br, pack*d) -> (br, pack)
                return jnp.dot(x, s_mat, preferred_element_type=dtype)

            qc0 = q0 - mu
            u0 = 0.5 * seg_sum(k * qc0 * qc0)
            h0 = 0.5 * seg_sum(p0 * p0 * im) + s * u0

            # Merged-kick leapfrog: the two half-kicks of consecutive
            # steps combine into one full kick (identical trajectory up
            # to fp rounding, ~25% fewer VPU ops in the roofline-bound
            # loop). Half-kick in, L x (drift + full kick), half-kick
            # undone at the end.
            dtim = dt * im
            ck = dt * s
            p_in = p0 - (0.5 * ck) * (k * qc0)

            tdt = trajectory_dtype if trajectory_dtype is not None \
                else dtype
            kt, mut, dtimt = k.astype(tdt), mu.astype(tdt), \
                dtim.astype(tdt)
            ckt = ck.astype(tdt)

            def body(_, carry):
                q, p = carry
                q = q + p * dtimt
                p = p - ckt * (kt * (q - mut))
                return (q, p)

            q1, p1 = jax.lax.fori_loop(
                0, n_steps, body, (q0.astype(tdt), p_in.astype(tdt)))
            q1 = q1.astype(dtype)
            p1 = p1.astype(dtype)
            qc1 = q1 - mu
            p1 = p1 + (0.5 * ck) * (k * qc1)
            u1 = 0.5 * seg_sum(k * qc1 * qc1)
            h1 = 0.5 * seg_sum(p1 * p1 * im) + s * u1

            derr = beta_v * (h1 - h0)               # (br, pack)
            derr = jnp.where(jnp.isfinite(derr), derr, jnp.inf)
            divergent = derr > divergence_threshold

            bits_u = _random_bits(derr.shape)
            log_u = jnp.log(_uniform_from_bits(bits_u))
            accepted = (log_u < -derr) & ~divergent
            acc_f = accepted.astype(dtype)
            accept_prob = jnp.where(
                divergent, 0.0, jnp.exp(jnp.minimum(0.0, -derr)))

            # expand per-walker mask to lanes and select (where, not
            # arithmetic blend: 0 * inf = NaN on divergent proposals)
            mask = jnp.dot(acc_f, st_mat, preferred_element_type=dtype)
            q_sel = jnp.where(mask > 0.5, q1, q0)
            q_out[:] = q_sel
            # gradient of the selected state, written in-kernel so the
            # caller needs no extra elementwise pass over [W, D]
            g_out[:] = k * (q_sel - mu)
            u_out[:] = jnp.where(acc_f > 0.5, u1, u0)
            acc_out[:] = accept_prob
            taken_out[:] = acc_f
            derr_out[:] = derr

        grid = (rows // br,)
        block = lambda i: (i, 0)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                rep((1, pack * d)), rep((1, pack * d)),
                rep((1, pack * d)), rep((1, pack * d)),
                rep((pack * d, pack)), rep((pack, pack * d)),
            ],
            out_specs=[
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack * d), block,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
                pl.BlockSpec((br, pack), block, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, pack * d), dtype),
                jax.ShapeDtypeStruct((rows, pack * d), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
                jax.ShapeDtypeStruct((rows, pack), dtype),
            ],
            interpret=_use_interpret(),
        )(seed_arr, ns_arr, scalars, qp, kp, mup, imp, psp, S, ST)
        q1, g1, u1, acc, taken, derr = out
        return (q1.reshape(w, d), g1.reshape(w, d), u1.reshape(w),
                acc.reshape(w), taken.reshape(w) > 0.5, derr.reshape(w))

    transition.num_steps = num_steps  # type: ignore[attr-defined]
    transition.dynamic_steps = dynamic_steps  # type: ignore[attr-defined]
    return transition
