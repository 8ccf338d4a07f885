"""Pallas kernel parity tests (interpret mode on CPU; the same code path
compiles to Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import physicsbasedbayesianinference_tpu as pbbi
from physicsbasedbayesianinference_tpu.ops import pallas_kernels as pk
from physicsbasedbayesianinference_tpu.ops import potentials as pot
from physicsbasedbayesianinference_tpu.ops.integrators import leapfrog
from physicsbasedbayesianinference_tpu.ops.potentials import (
    batched_value_and_grad,
    nbody_accelerations,
)


def test_pallas_leapfrog_matches_xla_scan():
    target = pot.make_standard_normal(8)
    vg = batched_value_and_grad(target)
    q = jax.random.normal(jax.random.key(0), (512, 8))
    p = jax.random.normal(jax.random.key(1), (512, 8))
    a = leapfrog(vg, q, p, step_size=jnp.float32(0.1), num_steps=10,
                 inv_mass=1.0)
    integ = pk.make_pallas_leapfrog(block_walkers=128)
    b = integ(vg, q, p, step_size=jnp.float32(0.1), num_steps=10,
              inv_mass=1.0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_leapfrog_autodiff_potential():
    """Potentials without analytic_grad trace value_and_grad into the
    kernel."""
    target = pot.make_funnel(4)
    vg = batched_value_and_grad(target)
    q = 0.3 * jax.random.normal(jax.random.key(2), (256, 4))
    p = jax.random.normal(jax.random.key(3), (256, 4))
    a = leapfrog(vg, q, p, step_size=jnp.float32(0.05), num_steps=5,
                 inv_mass=1.0)
    b = pk.make_pallas_leapfrog(128)(
        vg, q, p, step_size=jnp.float32(0.05), num_steps=5, inv_mass=1.0)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-4, atol=1e-4)


def test_hmc_with_pallas_integrator_end_to_end():
    res = pbbi.run_hmc(
        jax.random.key(0), pot.make_standard_normal(4),
        jax.random.normal(jax.random.key(1), (256, 4)),
        num_warmup=100, num_samples=100, num_steps=8,
        integrator="pallas_leapfrog", collect="moments")
    np.testing.assert_allclose(np.asarray(res.mean), 0.0, atol=0.1)
    np.testing.assert_allclose(np.asarray(res.var), 1.0, atol=0.15)
    assert float(res.accept_rate) > 0.6


@pytest.mark.parametrize("n", [100, 300, 512])
def test_pallas_nbody_matches_xla(n):
    x = jax.random.normal(jax.random.key(4), (n, 3))
    m = jax.random.uniform(jax.random.key(5), (n,), minval=0.5, maxval=2.0)
    a_ref = nbody_accelerations(x, m, softening=1e-8)
    a_pl = pk.nbody_accelerations_pallas(x, m, block=128)
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_kernel_cpu_fallback_matches_base():
    """Off-TPU, build_fused_hmc_kernel returns the composed kernel (the
    hardware PRNG has no interpret lowering) — statistics must hold."""
    from physicsbasedbayesianinference_tpu.hmc import build_fused_hmc_kernel
    target = pot.make_standard_normal(4)
    kernel = build_fused_hmc_kernel(target, num_steps=8)
    q0 = jax.random.normal(jax.random.key(0), (256, 4))
    state = kernel.init(q0)
    step = jax.jit(kernel.step)
    for i in range(40):
        state, info = step(jax.random.key(i), state, jnp.float32(0.7))
    assert float(jnp.mean(info.accept_prob)) > 0.7
    np.testing.assert_allclose(float(jnp.var(state.ensemble.q)), 1.0,
                               atol=0.15)


def test_packed_kernel_rejects_bad_dims():
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_diag_quadratic)
    trans = make_fused_hmc_diag_quadratic(num_steps=4)
    q = jnp.zeros((64, 33))  # 33 does not divide 128
    with pytest.raises(ValueError, match="D | 128"):
        trans(0, q, step_size=0.1, p_std=1.0, inv_mass=1.0, beta=1.0,
              k_diag=1.0, mean=0.0)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="packed kernel uses the TPU hardware PRNG")
def test_packed_kernel_statistics_tpu():
    from physicsbasedbayesianinference_tpu.ops.pallas_kernels import (
        make_fused_hmc_diag_quadratic)
    trans = make_fused_hmc_diag_quadratic(num_steps=16)
    q = jax.random.normal(jax.random.key(0), (4096, 32), dtype=jnp.float32)

    @jax.jit
    def run(q, seeds):
        def body(q, seed):
            q, g, u, acc, taken, derr = trans(
                seed, q, step_size=jnp.float32(0.64), p_std=1.0,
                inv_mass=1.0, beta=1.0, k_diag=1.0, mean=0.0)
            return q, jnp.mean(acc)
        return jax.lax.scan(body, q, seeds)

    seeds = jax.random.randint(jax.random.key(1), (64,), -2**31,
                               2**31 - 1, dtype=jnp.int32)
    q, acc = run(q, seeds)
    assert 0.6 < float(jnp.mean(acc)) < 0.95
    np.testing.assert_allclose(float(jnp.var(q)), 1.0, atol=0.05)
    np.testing.assert_allclose(float(jnp.mean(q)), 0.0, atol=0.05)
