"""Block-size + sigmoid-formulation sweep for the logreg packed kernel.

VERDICT.md r4 item 2 target: logreg_32_n256 packed >= 60M transitions/s.
After affine-chain fusion + the lean custom-jvp softplus the loop body is
{forward matmul, logistic, backward matmul}; this sweeps the remaining
knobs: block rows and the sigmoid lowering.

    python benchmarks/logreg_tune.py [blocks...]

One JSON line per config.
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
TIMED = 128


def time_transition(trans, q, u, g, step_size):
    @jax.jit
    def runner(c, seeds):
        def body(c, seed):
            q, u, g = c
            q, u, g, acc, _, _ = trans(
                seed, q, u, g, step_size=step_size, p_std=1.0,
                inv_mass=1.0, beta=1.0)
            return (q, u, g), jnp.mean(acc)
        return jax.lax.scan(body, c, seeds)

    seeds = jax.random.randint(jax.random.key(1), (TIMED,), -2**31,
                               2**31 - 1, dtype=jnp.int32)
    c, accs = runner((q, u, g), seeds)
    float(jnp.mean(accs))
    t0 = time.time()
    c, accs = runner((q, u, g), seeds)
    acc = float(jnp.mean(accs))
    return NUM_WALKERS * TIMED / (time.time() - t0), acc


def main():
    from physicsbasedbayesianinference_tpu.models.examples import (
        logistic_regression)
    from physicsbasedbayesianinference_tpu.models.potential import (
        make_model_potential)
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_packed)
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        batched_value_and_grad)

    x = jax.random.normal(jax.random.key(7), (256, 31))
    w_true = jax.random.normal(jax.random.key(8), (31,))
    labels = (jax.random.uniform(jax.random.key(9), (256,))
              < jax.nn.sigmoid(x @ w_true)).astype(jnp.float32)
    mp = make_model_potential(logistic_regression, (x, labels), {})
    pot = mp.potential
    d = 32

    vg = batched_value_and_grad(pot, use_analytic=True)
    q = jax.random.normal(jax.random.key(0), (NUM_WALKERS, d), jnp.float32)
    q = 0.1 * q
    u, g = vg(q)
    step = jnp.float32(0.05)

    blocks = [int(b) for b in sys.argv[1:]] or [256, 512, 640]
    for br in blocks:
        try:
            trans = make_fused_hmc_packed(
                pot, num_dims=d, num_steps=NUM_STEPS, block_rows=br)
            tps, acc = time_transition(trans, q, u, g, step)
            print(json.dumps({"block_rows": br,
                              "transitions_per_sec": round(tps),
                              "accept": round(acc, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"block_rows": br,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
