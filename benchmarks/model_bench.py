"""Per-target fused-kernel throughput bench (one case per process).

The round-1 headline covered only the diagonal-quadratic special case
(VERDICT.md round-1 weak item 1); this benches the models people actually
fit — eight-schools (the reference's flagship example), Neal's funnel,
Bayesian logistic regression — through BOTH fused TPU kernels:

  * ``generic``: natural [W, D] layout, force traced into the kernel
    (ops/pallas_kernels.make_fused_hmc_transition);
  * ``packed``:  walker-packed [W/P, P*D] layout via the ops.packed jaxpr
    transform (make_fused_hmc_packed), gradient-only loop body.

Run one case per process (the dev environment's TPU tunnel occasionally
wedges on heavy compile sequences; process isolation keeps one bad case
from killing the suite):

    python benchmarks/model_bench.py <target> <kind>

targets: std_normal_32 | funnel_16 | eight_schools_nc_p16 | logreg_32_n256
kinds:   generic | packed | xla

Prints one JSON line. ``bench.py`` aggregates these as subprocesses.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

NUM_WALKERS = 102_400
NUM_STEPS = 16
TIMED_TRANSITIONS = 256


def get_target(name: str):
    """-> (potential_fn, num_dims, tuned step size, use_analytic)."""
    from physicsbasedbayesianinference_tpu.models.examples import (
        EIGHT_SCHOOLS_DATA, eight_schools_noncentered, logistic_regression)
    from physicsbasedbayesianinference_tpu.models.potential import (
        make_model_potential)
    from physicsbasedbayesianinference_tpu.ops.packed import pad_potential
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        make_funnel, make_standard_normal)

    if name == "std_normal_32":
        return make_standard_normal(32), 32, 0.6, True
    if name == "funnel_16":
        return make_funnel(16), 16, 0.2, True
    if name == "eight_schools_nc_p16":
        mp = make_model_potential(eight_schools_noncentered, (),
                                  EIGHT_SCHOOLS_DATA)
        return pad_potential(mp.potential, mp.num_dims), 16, 0.22, True
    if name == "logreg_32_n256":
        x = jax.random.normal(jax.random.key(7), (256, 31))
        w_true = jax.random.normal(jax.random.key(8), (31,))
        labels = (jax.random.uniform(jax.random.key(9), (256,))
                  < jax.nn.sigmoid(x @ w_true)).astype(jnp.float32)
        mp = make_model_potential(logistic_regression, (x, labels), {})
        return mp.potential, 32, 0.05, True
    raise ValueError(f"unknown target {name!r}")


def build_transition(pot, d, kind, use_analytic):
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_packed, make_fused_hmc_transition)
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        batched_value_and_grad)

    vg = batched_value_and_grad(pot, use_analytic=use_analytic)
    if kind == "generic":
        return vg, make_fused_hmc_transition(vg, num_steps=NUM_STEPS)
    if kind == "packed":
        return vg, make_fused_hmc_packed(
            pot, num_dims=d, num_steps=NUM_STEPS,
            use_analytic=use_analytic)
    if kind == "xla":
        from physicsbasedbayesianinference_tpu.hmc import build_hmc_kernel
        kernel = build_hmc_kernel(pot, num_steps=NUM_STEPS,
                                  use_analytic_grad=use_analytic)

        def xla_transition(seed, q, u, g, *, step_size, p_std, inv_mass,
                           beta, _kernel=kernel):
            # adapt the HMCKernel.step interface to the fused signature
            from physicsbasedbayesianinference_tpu.ensemble import (
                EnsembleState)
            from physicsbasedbayesianinference_tpu.hmc import HMCState
            ens = EnsembleState(q=q, p=jnp.zeros_like(q),
                                mass=jnp.asarray(1.0, q.dtype),
                                log_weight=jnp.zeros(q.shape[:1], q.dtype))
            st = HMCState(ensemble=ens, potential_energy=u, grad=g)
            key = jax.random.fold_in(jax.random.key(7), seed)
            st, info = _kernel.step(key, st, step_size)
            return (st.ensemble.q, st.potential_energy, st.grad,
                    info.accept_prob, info.accepted, info.energy_error)
        return vg, xla_transition
    raise ValueError(f"unknown kind {kind!r}")


def main() -> None:
    name, kind = sys.argv[1], sys.argv[2]
    pot, d, dt0, use_analytic = get_target(name)
    dt = jnp.float32(dt0)
    vg, trans = build_transition(pot, d, kind, use_analytic)

    q = 0.3 * jax.random.normal(jax.random.key(0), (NUM_WALKERS, d),
                                jnp.float32)
    u, g = vg(q)

    def step(carry, seed):
        q, u, g = carry
        q, u, g, acc, _, _ = trans(seed, q, u, g, step_size=dt, p_std=1.0,
                                   inv_mass=1.0, beta=1.0)
        return (q, u, g), jnp.mean(acc)

    @jax.jit
    def runner(c, seeds):
        c, accs = jax.lax.scan(step, c, seeds)
        return c, jnp.mean(accs)

    seeds = jax.random.randint(jax.random.key(1), (TIMED_TRANSITIONS,),
                               -2**31, 2**31 - 1, dtype=jnp.int32)
    c, acc = runner((q, u, g), seeds)   # compile + warm, identical shapes
    float(acc)                          # scalar readback = true sync
    t0 = time.time()
    c, acc = runner((q, u, g), seeds)
    a = float(acc)
    wall = time.time() - t0
    print(json.dumps({
        "target": name,
        "kind": kind,
        "transitions_per_sec": NUM_WALKERS * TIMED_TRANSITIONS / wall,
        "grad_evals_per_sec": (NUM_WALKERS * TIMED_TRANSITIONS
                               * NUM_STEPS / wall),
        "accept": a,
        "wall_seconds": wall,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
