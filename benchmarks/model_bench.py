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
kinds:   generic | packed | xla | chees

``chees`` is the practitioner's number (VERDICT.md round-2 item 4): the
recommended *adaptive* sampler (ChEES-adapted trajectory lengths through
the dynamic-trip-count fused kernel) measured in Geyer **min-ESS/s** on
the real model, not just raw transitions/s.

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

if os.environ.get("PBBI_PLATFORM"):  # CPU smoke-testing escape hatch
    jax.config.update("jax_platforms", os.environ["PBBI_PLATFORM"])

import jax.numpy as jnp

NUM_WALKERS = int(os.environ.get("MODEL_BENCH_WALKERS", 102_400))
NUM_STEPS = 16
TIMED_TRANSITIONS = int(os.environ.get("MODEL_BENCH_TRANSITIONS", 256))


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


def run_chees_case(name: str) -> None:
    """ChEES-adapted min-ESS/s on a real model: warmup (XLA jittered
    kernel + ChEES/dual-averaging adaptation), then a one-dispatch timed
    scan of Halton-jittered transitions through the fused dynamic-step
    kernel (falls back to the XLA jittered kernel off-TPU)."""
    from physicsbasedbayesianinference_tpu.chees import (
        build_fused_jittered_step, build_jittered_hmc_kernel,
        halton_sequence, run_chees_hmc)
    from physicsbasedbayesianinference_tpu.diagnostics import (
        effective_sample_size)

    pot, d, dt0, _ = get_target(name)
    ess_walkers = 512
    max_steps = 256
    q0 = 0.3 * jax.random.normal(jax.random.key(0), (NUM_WALKERS, d),
                                 jnp.float32)
    warm = run_chees_hmc(
        jax.random.key(1), pot, q0, num_warmup=300, num_samples=0,
        init_step_size=dt0, max_steps=max_steps, collect="none",
        kernel="auto")
    state, eps, tau = warm.state, warm.step_size, warm.trajectory_time
    fused = None
    if jax.default_backend() == "tpu":
        fused = build_fused_jittered_step(pot, num_dims=d,
                                          max_steps=max_steps)
    _, step_fn = build_jittered_hmc_kernel(pot, max_steps=max_steps)

    def body(st, xs):
        k, h = xs
        n = jnp.clip(jnp.round(2.0 * h * tau / eps).astype(jnp.int32),
                     1, max_steps)
        if fused is not None:
            st, info = fused(k, st, eps, n)
        else:
            st, info, _ = step_fn(k, st, eps, n)
        return st, (st.ensemble.q[:ess_walkers, :min(d, 8)],
                    jnp.mean(info.accept_prob), n.astype(jnp.float32))

    @jax.jit
    def runner(st, keys, hs):
        st, (hist, acc, ns) = jax.lax.scan(body, st, (keys, hs))
        return st, hist, jnp.mean(acc), jnp.mean(ns)

    keys = jax.random.split(jax.random.key(2), TIMED_TRANSITIONS)
    hs = jnp.asarray(
        halton_sequence(300 + TIMED_TRANSITIONS)[300:], jnp.float32)
    st, hist, acc, ns = runner(state, keys, hs)
    float(acc)                      # compile + warm; scalar sync
    t0 = time.time()
    st, hist, acc, ns = runner(state, keys, hs)
    a = float(acc)
    wall = time.time() - t0

    ess = jax.jit(effective_sample_size)(hist)
    min_ess = float(jnp.min(ess)) * (NUM_WALKERS / ess_walkers)
    mean_steps = float(ns)
    print(json.dumps({
        "target": name,
        "kind": "chees",
        "min_ess_per_sec": min_ess / wall,
        "transitions_per_sec": NUM_WALKERS * TIMED_TRANSITIONS / wall,
        "grad_evals_per_sec": (NUM_WALKERS * TIMED_TRANSITIONS
                               * mean_steps / wall),
        "mean_steps": mean_steps,
        "trajectory_time": float(tau),
        "step_size": float(eps),
        "accept": a,
        "engine": "fused" if fused is not None else "xla",
        "wall_seconds": wall,
        "device": str(jax.devices()[0]),
    }))


def main() -> None:
    name, kind = sys.argv[1], sys.argv[2]
    if kind == "chees":
        run_chees_case(name)
        return
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
