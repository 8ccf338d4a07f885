"""Walker weak-scaling harness (the BASELINE.json north star: scaling
efficiency >= 0.9 from 1 chip to N hosts).

Real multi-chip hardware is not reachable from this environment, so the
harness measures two proxies that together bound the production number:

1. **Weak scaling on a virtual K-device CPU mesh** (K = 1, 2, 4, 8 via
   ``--xla_force_host_platform_device_count``): walkers-per-device held
   fixed, time-per-transition of the GSPMD-sharded HMC scan measured at
   each K. Perfect weak scaling keeps time flat; efficiency(K) =
   t(1) / t(K). On CPU the "devices" share cores, so this is a *lower
   bound* on TPU efficiency — it includes all partitioning overhead XLA
   introduces (collectives, reshards) with none of the hardware
   parallelism. Each K runs in a subprocess (device count is fixed at
   process start).

2. **Collective census**: the compiled HLO of the sharded step is scanned
   for communication ops (all-reduce / all-gather / collective-permute /
   all-to-all). Ensemble HMC transitions are embarrassingly parallel over
   walkers — the census proves the program communicates only O(1) scalar
   reductions per transition (the adaptation statistics), independent of
   W and D, which is what makes >= 0.9 efficiency credible on real ICI.

3. **Single-chip partitioning penalty** (TPU only): the identical program
   unpartitioned vs under a 1-device NamedSharding. On this environment's
   tunnel backend any partitioned executable pays a large constant
   penalty (BASELINE.md config 5); this quantifies it as a number.

Usage:
  python benchmarks/scaling.py                 # orchestrates everything
  python benchmarks/scaling.py --child K       # internal: one mesh size

Output: one JSON line per measurement; summary JSON at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WALKERS_PER_DEVICE = 4096
NUM_DIMS = 32
NUM_STEPS = 16
NUM_TRANSITIONS = 30


def _build_step_and_state(jax, jnp, mesh=None):
    from physicsbasedbayesianinference_tpu.hmc import build_hmc_kernel
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        make_standard_normal)
    from physicsbasedbayesianinference_tpu.parallel.mesh import (
        WALKER_AXIS, walker_sharding)

    num_devices = len(mesh.devices.flat) if mesh is not None else 1
    w = WALKERS_PER_DEVICE * num_devices
    kernel = build_hmc_kernel(make_standard_normal(NUM_DIMS),
                              num_steps=NUM_STEPS)
    q = jax.random.normal(jax.random.key(0), (w, NUM_DIMS), jnp.float32)
    if mesh is not None:
        q = jax.device_put(q, walker_sharding(mesh, 2))
    state = kernel.init(q)

    def chain(state, keys):
        def body(st, key):
            st, info = kernel.step(key, st, jnp.float32(0.6))
            return st, jnp.mean(info.accept_prob)
        return jax.lax.scan(body, state, keys)

    return jax.jit(chain), state


def _measure(jax, jnp, chain, state):
    keys = jax.random.split(jax.random.key(1), NUM_TRANSITIONS)
    st, acc = chain(state, keys)         # compile + warm
    jax.block_until_ready(st.ensemble.q)
    t0 = time.perf_counter()
    st, acc = chain(state, keys)
    jax.block_until_ready(st.ensemble.q)
    dt = time.perf_counter() - t0
    return dt / NUM_TRANSITIONS


def collective_census(jax, jnp, mesh) -> dict:
    """Count communication ops in the compiled sharded-step HLO."""
    chain, state = _build_step_and_state(jax, jnp, mesh)
    keys = jax.random.split(jax.random.key(1), NUM_TRANSITIONS)
    hlo = chain.lower(state, keys).compile().as_text()
    ops = {
        "all_reduce": len(re.findall(r"\ball-reduce[.\d]*\s*=", hlo)),
        "all_gather": len(re.findall(r"\ball-gather[.\d]*\s*=", hlo)),
        "collective_permute": len(
            re.findall(r"\bcollective-permute[.\d]*\s*=", hlo)),
        "all_to_all": len(re.findall(r"\ball-to-all[.\d]*\s*=", hlo)),
    }
    return ops


def run_child(num_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={num_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from physicsbasedbayesianinference_tpu.parallel.mesh import (
        make_walker_mesh)

    mesh = make_walker_mesh()
    assert len(mesh.devices.flat) == num_devices
    chain, state = _build_step_and_state(jax, jnp, mesh)
    t = _measure(jax, jnp, chain, state)
    census = collective_census(jax, jnp, mesh)

    # partitioning-overhead proxy: the SAME total walkers unsharded on one
    # virtual device, same process, same physical cores. Both runs use the
    # whole machine, so their ratio isolates what partitioning adds
    # (collectives + resharding + per-shard dispatch), which is the piece
    # that threatens the >= 0.9 target on real hardware.
    global WALKERS_PER_DEVICE
    saved = WALKERS_PER_DEVICE
    WALKERS_PER_DEVICE = saved * num_devices
    try:
        chain_u, state_u = _build_step_and_state(jax, jnp, None)
        t_unsharded = _measure(jax, jnp, chain_u, state_u)
    finally:
        WALKERS_PER_DEVICE = saved
    print(json.dumps({
        "devices": num_devices,
        "walkers": saved * num_devices,
        "sec_per_transition": t,
        "sec_per_transition_unsharded_same_walkers": t_unsharded,
        # clamped to <= 1.0: raw values above 1 (sharded beating its
        # unsharded twin at equal walkers) mean the partitioning cost is
        # below the oversubscribed-CPU timing floor, not a real speedup
        # (VERDICT.md r3 weak #6 — no table may present noise as signal)
        "partition_overhead_efficiency": min(1.0, t_unsharded / t),
        "partition_overhead_efficiency_raw": t_unsharded / t,
        "collectives": census,
    }))


def tpu_partition_penalty() -> dict | None:
    """On TPU: unpartitioned vs 1-device-NamedSharding of the identical
    program (quantifies the tunnel backend's partitioning overhead)."""
    import jax
    if jax.default_backend() != "tpu":
        return None
    import jax.numpy as jnp
    from physicsbasedbayesianinference_tpu.parallel.mesh import (
        make_walker_mesh)

    chain_plain, state_plain = _build_step_and_state(jax, jnp, None)
    t_plain = _measure(jax, jnp, chain_plain, state_plain)
    mesh = make_walker_mesh(jax.devices()[:1])
    chain_sh, state_sh = _build_step_and_state(jax, jnp, mesh)
    t_sh = _measure(jax, jnp, chain_sh, state_sh)
    return {
        "sec_per_transition_unpartitioned": t_plain,
        "sec_per_transition_partitioned_1dev": t_sh,
        "partition_penalty": t_sh / t_plain,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--mesh-sizes", type=int, nargs="*",
                    default=[1, 2, 4, 8])
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    if args.child is not None:
        run_child(args.child)
        return

    rows = []
    for k in args.mesh_sizes:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(k)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
        if out.returncode != 0:
            print(json.dumps({"devices": k, "error": out.stderr[-500:]}))
            continue
        line = out.stdout.strip().splitlines()[-1]
        row = json.loads(line)
        rows.append(row)
        print(line, flush=True)

    summary: dict = {}
    if rows:
        t1 = rows[0]["sec_per_transition"]
        # raw virtual-CPU weak scaling: K devices contend for the same
        # physical cores while total work grows by K, so this is only a
        # floor; partition_overhead_efficiency is the meaningful proxy
        summary["weak_scaling_time_ratio_cpu_floor"] = {
            str(r["devices"]): t1 / r["sec_per_transition"] for r in rows}
        summary["partition_overhead_efficiency"] = {
            str(r["devices"]): r["partition_overhead_efficiency"]
            for r in rows}
        summary["collectives_at_8dev"] = rows[-1]["collectives"]

    if not args.skip_tpu:
        try:
            pen = tpu_partition_penalty()
            if pen is not None:
                summary["tpu_partition_penalty"] = pen
        except Exception as e:  # tunnel flake — report, don't crash
            summary["tpu_partition_penalty_error"] = str(e)[:200]

    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
