"""Throughput of the multi-chip product surface (VERDICT.md r4 item 1).

Measures, at the headline config (102400 x 32, 16-step HMC), walker
transitions/s through:

  1. run_hmc kernel="auto"            — unpartitioned fused (the ceiling)
  2. sharded_run_hmc kernel="auto"    — shard_map(fused) on a 1-device mesh
                                        (the new multi-chip product default)
  3. sharded_run_hmc kernel="xla"     — GSPMD auto-partitioned XLA scan
                                        (the old multi-chip default)

On real pod hardware 2 runs per-chip at ~1x of 1 (the shard_map body IS
the unpartitioned kernel); on this dev environment's tunnel backend any
partitioned executable historically carried a large constant overhead
(BASELINE.md r1 note) — whatever this measures is recorded as environment.

Usage: python benchmarks/sharded_fused_bench.py [num_samples]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from physicsbasedbayesianinference_tpu.hmc import run_hmc
from physicsbasedbayesianinference_tpu.ops import potentials as pot
from physicsbasedbayesianinference_tpu.parallel import (
    make_walker_mesh, sharded_run_hmc)

W, D, L = 102_400, 32, 16
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def measure(fn, label, out):
    kw = dict(num_warmup=0, num_samples=N, num_steps=L,
              init_step_size=0.63, collect="none")
    fn(jax.random.key(1), kw)  # compile
    t0 = time.perf_counter()
    res = fn(jax.random.key(2), kw)
    wall = time.perf_counter() - t0
    tps = N * W / res.sampling_seconds
    out[label] = {
        "transitions_per_sec": round(tps),
        "sampling_seconds": round(res.sampling_seconds, 3),
        "wall_seconds": round(wall, 3),
        "kernel_used": res.kernel_used,
        "kernel_variant": res.kernel_variant,
        "accept_rate": round(float(res.accept_rate), 4),
    }
    print(f"# {label}: {tps/1e6:.1f}M t/s ({res.kernel_used})",
          file=sys.stderr, flush=True)
    return tps


def main():
    target = pot.make_standard_normal(D)
    q0 = jax.random.normal(jax.random.key(0), (W, D), jnp.float32)
    mesh = make_walker_mesh()
    out = {"config": {"walkers": W, "dims": D, "steps": L, "samples": N,
                      "mesh_devices": mesh.devices.size,
                      "device": str(jax.devices()[0])}}

    base = measure(lambda k, kw: run_hmc(k, target, q0, **kw),
                   "unpartitioned_fused", out)
    shard = measure(
        lambda k, kw: sharded_run_hmc(k, target, q0, mesh=mesh, **kw),
        "sharded_fused_shard_map", out)
    measure(
        lambda k, kw: sharded_run_hmc(k, target, q0, mesh=mesh,
                                      kernel="xla", **kw),
        "sharded_xla_gspmd", out)
    out["fused_sharded_over_unpartitioned"] = round(shard / base, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
