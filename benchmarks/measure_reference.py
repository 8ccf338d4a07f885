"""Measure the reference implementation's sampling throughput (CPU).

The reference publishes no numbers (BASELINE.md), so this script creates the
baseline: it runs the reference's own HMC.getSamples
(/root/reference/src/HMC.py:123-183) on the benchmark target and reports
gradient evaluations per second and transitions per second.

Run:  python benchmarks/measure_reference.py [num_dims] [num_walkers] [num_samples]
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference/src")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

num_dims = int(sys.argv[1]) if len(sys.argv) > 1 else 32
num_walkers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
num_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 3
num_steps = 16
step_size = 0.1
simul_time = num_steps * step_size

from ensemble import Ensemble  # noqa: E402  (reference module)
from HMC import HMC  # noqa: E402  (reference module)
from scipy.constants import k as k_B  # noqa: E402


def density(x):
    # standard normal in num_dims dims (reference HMC.py:186-190 pattern)
    return jnp.exp(-0.5 * jnp.sum(x**2)) / jnp.sqrt((2 * jnp.pi) ** num_dims)


ens = Ensemble(num_dims, num_walkers)
hmc = HMC(ens, simul_time, step_size, density)

# warm one gradient call so tracing cost isn't billed to the loop
_ = hmc.gradient(np.zeros(num_dims))

t0 = time.time()
samples, momenta = hmc.getSamples(num_samples, 1.0 / k_B, 1.0)
dt = time.time() - t0

grad_evals = num_samples * num_walkers * (num_steps + 1)
result = {
    "impl": "reference",
    "num_dims": num_dims,
    "num_walkers": num_walkers,
    "num_samples": num_samples,
    "num_steps": num_steps,
    "wall_seconds": dt,
    "grad_evals_per_sec": grad_evals / dt,
    "walker_transitions_per_sec": num_samples * num_walkers / dt,
}
print(json.dumps(result))
