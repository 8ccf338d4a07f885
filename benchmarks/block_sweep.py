"""Block-size sweep for the fused HMC kernels (TPU).

The tuned constants in ops/pallas_kernels.py (packed ``block_rows=128``,
generic ``block_walkers=512``) came from round-1 on-chip sweeps; kernel
body changes (merged-kick, dual-branch refresh) can move the optimum, so
re-sweep after each kernel rewrite and update the defaults from data.

    python benchmarks/block_sweep.py packed          # diag-quadratic
    python benchmarks/block_sweep.py generic         # natural-layout
    python benchmarks/block_sweep.py packed_generic  # jaxpr-packed
    python benchmarks/block_sweep.py bf16            # bf16-trajectory
                                                     # vs f32 (packed)

One JSON line per block size; best-last summary. Headline config
(102400 x 32, 16 steps). The bf16 mode also reports the energy-error
distribution shift — the Metropolis-exactness risk BASELINE.md's
roofline flags for the reduced-precision experiment.
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

NUM_WALKERS = int(os.environ.get("SWEEP_WALKERS", 102_400))
NUM_DIMS = 32
NUM_STEPS = 16
TIMED = int(os.environ.get("SWEEP_TRANSITIONS", 128))


def time_transition(make_step, carry0):
    @jax.jit
    def runner(c, seeds):
        def body(c, seed):
            c, acc = make_step(c, seed)
            return c, acc
        c, accs = jax.lax.scan(body, c, seeds)
        return c, jnp.mean(accs)

    seeds = jax.random.randint(jax.random.key(1), (TIMED,), -2**31,
                               2**31 - 1, dtype=jnp.int32)
    c, acc = runner(carry0, seeds)
    float(acc)
    t0 = time.time()
    c, acc = runner(carry0, seeds)
    float(acc)
    return NUM_WALKERS * TIMED / (time.time() - t0)


def sweep_packed():
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_diag_quadratic)
    q0 = jax.random.normal(jax.random.key(0), (NUM_WALKERS, NUM_DIMS),
                           jnp.float32)
    rows = NUM_WALKERS * NUM_DIMS // 128
    best = None
    for br in (32, 64, 128, 256, 512, 1024):
        if rows % br != 0:
            continue
        trans = make_fused_hmc_diag_quadratic(num_steps=NUM_STEPS,
                                              block_rows=br)

        def step(q, seed, trans=trans):
            q, g, u, acc, taken, derr = trans(
                seed, q, step_size=jnp.float32(0.6), p_std=1.0,
                inv_mass=1.0, beta=1.0, k_diag=1.0, mean=0.0)
            return q, jnp.mean(acc)

        tps = time_transition(step, q0)
        row = {"kernel": "packed", "block_rows": br,
               "transitions_per_sec": round(tps)}
        print(json.dumps(row), flush=True)
        if best is None or tps > best["transitions_per_sec"]:
            best = row
    print(json.dumps({"best": best}))


def sweep_generic():
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_transition)
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        batched_value_and_grad, make_funnel)
    pot = make_funnel(NUM_DIMS)
    vg = batched_value_and_grad(pot)
    q0 = 0.3 * jax.random.normal(jax.random.key(0),
                                 (NUM_WALKERS, NUM_DIMS), jnp.float32)
    u0, g0 = vg(q0)
    best = None
    for bw in (128, 256, 512, 1024, 2048):
        if NUM_WALKERS % bw != 0:
            continue
        trans = make_fused_hmc_transition(vg, num_steps=NUM_STEPS,
                                          block_walkers=bw)

        def step(c, seed, trans=trans):
            q, u, g = c
            q, u, g, acc, _, _ = trans(seed, q, u, g,
                                       step_size=jnp.float32(0.2),
                                       p_std=1.0, inv_mass=1.0, beta=1.0)
            return (q, u, g), jnp.mean(acc)

        tps = time_transition(step, (q0, u0, g0))
        row = {"kernel": "generic", "block_walkers": bw,
               "transitions_per_sec": round(tps)}
        print(json.dumps(row), flush=True)
        if best is None or tps > best["transitions_per_sec"]:
            best = row
    print(json.dumps({"best": best}))


def sweep_packed_generic():
    """The jaxpr-transform packed kernel (make_fused_hmc_packed) on an
    eight-schools-like non-quadratic potential."""
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_packed)
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        batched_value_and_grad, make_funnel)
    pot = make_funnel(NUM_DIMS)
    vg = batched_value_and_grad(pot)
    q0 = 0.3 * jax.random.normal(jax.random.key(0),
                                 (NUM_WALKERS, NUM_DIMS), jnp.float32)
    u0, g0 = vg(q0)
    best = None
    rows = NUM_WALKERS * NUM_DIMS // 128
    for br in (32, 64, 128, 256, 512, 1024):
        if rows % br != 0:
            continue
        trans = make_fused_hmc_packed(pot, num_dims=NUM_DIMS,
                                      num_steps=NUM_STEPS, block_rows=br)

        def step(c, seed, trans=trans):
            q, u, g = c
            q, u, g, acc, _, _ = trans(seed, q, u, g,
                                       step_size=jnp.float32(0.2),
                                       p_std=1.0, inv_mass=1.0, beta=1.0)
            return (q, u, g), jnp.mean(acc)

        tps = time_transition(step, (q0, u0, g0))
        row = {"kernel": "packed_generic", "block_rows": br,
               "transitions_per_sec": round(tps)}
        print(json.dumps(row), flush=True)
        if best is None or tps > best["transitions_per_sec"]:
            best = row
    print(json.dumps({"best": best}))


def sweep_bf16():
    """bf16 trajectory loop vs f32, packed diag kernel at the tuned
    block: throughput ratio + the energy-error/acceptance shift (the
    exactness evidence). Runs 3 block sizes around the f32 optimum in
    case the precision change moves it."""
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_diag_quadratic)
    q0 = jax.random.normal(jax.random.key(0), (NUM_WALKERS, NUM_DIMS),
                           jnp.float32)
    rows = NUM_WALKERS * NUM_DIMS // 128
    out = {}
    for tag, tdt in (("f32", None), ("bf16", jnp.bfloat16)):
        best = None
        for br in (64, 128, 256):
            if rows % br != 0:
                continue
            trans = make_fused_hmc_diag_quadratic(
                num_steps=NUM_STEPS, block_rows=br,
                trajectory_dtype=tdt)

            def step(q, seed, trans=trans):
                q, g, u, acc, taken, derr = trans(
                    seed, q, step_size=jnp.float32(0.6), p_std=1.0,
                    inv_mass=1.0, beta=1.0, k_diag=1.0, mean=0.0)
                return q, jnp.mean(acc)

            tps = time_transition(step, q0)
            row = {"kernel": f"packed_{tag}", "block_rows": br,
                   "transitions_per_sec": round(tps)}
            print(json.dumps(row), flush=True)
            if best is None or tps > best["transitions_per_sec"]:
                best = row
        # energy-error / acceptance statistics at the best block
        trans = make_fused_hmc_diag_quadratic(
            num_steps=NUM_STEPS, block_rows=best["block_rows"],
            trajectory_dtype=tdt)
        q, g, u, acc, taken, derr = jax.jit(lambda: trans(
            jnp.int32(7), q0, step_size=jnp.float32(0.6), p_std=1.0,
            inv_mass=1.0, beta=1.0, k_diag=1.0, mean=0.0))()
        best["accept_rate"] = round(float(jnp.mean(acc)), 4)
        best["mean_abs_energy_error"] = round(
            float(jnp.mean(jnp.abs(derr))), 5)
        best["p99_abs_energy_error"] = round(
            float(jnp.percentile(jnp.abs(derr), 99.0)), 5)
        out[tag] = best
    out["bf16_speedup"] = round(
        out["bf16"]["transitions_per_sec"]
        / out["f32"]["transitions_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    {"packed": sweep_packed, "generic": sweep_generic,
     "packed_generic": sweep_packed_generic,
     "bf16": sweep_bf16}[sys.argv[1]]()
