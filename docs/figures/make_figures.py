"""Regenerate the committed golden figures (the reference documents itself
with committed plots: src/tests/qErrorVsStepSize.png,
LeapfrogSolarSystem.png, Stormer-VerletSolarSystem.png). Same figure
types, produced by this framework's own integrators/samplers.

Run from the repo root:  python docs/figures/make_figures.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

import jax

# figures are tiny workloads — always CPU (and the env's JAX_PLATFORMS
# var is not honoured, see tests/conftest.py); x64 so the integrator
# convergence curves are not floored at f32 roundoff
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def solar_system_orbits() -> None:
    """Earth-Sun-Moon, one year, leapfrog and Stormer-Verlet (the
    reference's LeapfrogSolarSystem.png / Stormer-VerletSolarSystem.png,
    generator test_integrator_solar_system.py:22-82)."""
    from physicsbasedbayesianinference_tpu import physics
    from physicsbasedbayesianinference_tpu.utils import plotting

    system, const = physics.solar_system(units="astro")
    dt = 0.5  # days
    steps = int(365.25 / dt)
    for method in ("leapfrog", "stormer_verlet"):
        traj = physics.simulate(system, dt, num_steps=steps, method=method,
                                constants=const)
        fig = plotting.plot_trajectories(
            traj.x, body_names=["Earth", "Sun", "Moon"],
            save_path=os.path.join(HERE, f"{method}_solar_system.png"))
        fig.clf()


def error_vs_stepsize() -> None:
    """Harmonic-oscillator position error vs dt, log-log, for the
    integrator families (the reference's qErrorVsStepSize.png, generator
    test_integrator_harmonic.py:99-146)."""
    from physicsbasedbayesianinference_tpu.ops.integrators import (
        get_integrator)
    from physicsbasedbayesianinference_tpu.utils import plotting

    k = 1.0
    q0, p0, t_final = 1.0, 0.0, 2.0 * np.pi

    def vg(q):
        return 0.5 * k * jnp.sum(q * q, -1), k * q

    step_sizes = np.geomspace(1e-3, 0.5, 12)
    errors = {}
    for method in ("leapfrog", "stormer_verlet", "mclachlan", "yoshida4"):
        integ = get_integrator(method)
        errs = []
        for dt in step_sizes:
            n = max(1, round(t_final / dt))
            q = jnp.asarray([[q0]])
            p = jnp.asarray([[p0]])
            q, p, _, _ = integ(vg, q, p, step_size=t_final / n,
                               num_steps=n, inv_mass=1.0)
            errs.append(abs(float(q[0, 0]) - q0))  # exact: cos(2 pi) = 1
        errors[method] = errs
    fig = plotting.plot_error_vs_stepsize(
        step_sizes, errors,
        save_path=os.path.join(HERE, "q_error_vs_step_size.png"))
    fig.clf()


def posterior_scatter() -> None:
    """HMC samples against exact draws on a correlated Gaussian (the
    reference's test_HMC.py:131-175 visual check)."""
    from physicsbasedbayesianinference_tpu import run_hmc
    from physicsbasedbayesianinference_tpu.ops.potentials import (
        make_gaussian)
    from physicsbasedbayesianinference_tpu.utils import plotting

    mean = jnp.asarray([2.0, -1.0])
    cov = jnp.asarray([[1.0, 0.8], [0.8, 2.0]])
    res = run_hmc(jax.random.key(0), make_gaussian(mean, cov=cov),
                  jax.random.normal(jax.random.key(1), (512, 2)),
                  num_warmup=300, num_samples=100, num_steps=16)
    samples = np.asarray(res.samples[-1])
    exact = np.random.RandomState(0).multivariate_normal(
        np.asarray(mean), np.asarray(cov), size=512)
    fig = plotting.plot_samples(
        samples, reference_samples=exact,
        save_path=os.path.join(HERE, "hmc_vs_exact_gaussian.png"))
    fig.clf()


def main() -> None:
    solar_system_orbits()
    error_vs_stepsize()
    posterior_scatter()
    print("wrote figures under", HERE)


if __name__ == "__main__":
    main()
