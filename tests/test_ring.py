"""Ring-parallel N-body: sharded-vs-dense parity on the virtual 8-device
mesh (SURVEY.md §4 'multi-device tests via xla_force_host_platform_device_count')."""

import jax
import jax.numpy as jnp
import pytest

from physicsbasedbayesianinference_tpu.constants import NATURAL
from physicsbasedbayesianinference_tpu.ops.potentials import (
    nbody_accelerations,
    nbody_potential_energy,
)
from physicsbasedbayesianinference_tpu.parallel import ring
from physicsbasedbayesianinference_tpu.physics import nbody
from physicsbasedbayesianinference_tpu.physics.simulate import (
    simulate as dense_simulate,
)


@pytest.fixture(scope="module")
def mesh():
    return ring.make_body_mesh(jax.devices())


def _random_system(key, n, dtype=jnp.float32):
    kx, kv, km = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, 3), dtype) * 2.0
    v = jax.random.normal(kv, (n, 3), dtype) * 0.1
    mass = jax.random.uniform(km, (n,), dtype, minval=0.5, maxval=2.0)
    return x, v, mass


def test_ring_accelerations_match_dense(mesh):
    n = 8 * len(jax.devices())
    x, _, mass = _random_system(jax.random.key(0), n)
    dense = nbody_accelerations(x, mass, softening=1e-3)
    ringed = ring.ring_nbody_accelerations(
        x, mass, mesh=mesh, softening=1e-3)
    assert jnp.allclose(dense, ringed, atol=1e-5, rtol=1e-5)


def test_ring_potential_matches_dense(mesh):
    n = 8 * len(jax.devices())
    x, _, mass = _random_system(jax.random.key(1), n)
    dense = nbody_potential_energy(x, mass, softening=1e-3)
    ringed = ring.ring_nbody_potential_energy(
        x, mass, mesh=mesh, softening=1e-3)
    assert jnp.allclose(dense, ringed, atol=1e-4, rtol=1e-5)


def test_ring_rejects_indivisible(mesh):
    k = len(jax.devices())
    if k == 1:
        pytest.skip("needs >1 device for divisibility to matter")
    n = 8 * k + 1
    x, _, mass = _random_system(jax.random.key(2), n)
    with pytest.raises(ValueError, match="divide"):
        ring.ring_nbody_accelerations(x, mass, mesh=mesh)


def test_pad_bodies_zero_mass_sources_are_inert(mesh):
    k = len(jax.devices())
    n = 3 * k + 1  # not divisible
    x, _, mass = _random_system(jax.random.key(3), n)
    x_pad, m_pad, n_orig = ring.pad_bodies(x, mass, k)
    assert n_orig == n and x_pad.shape[0] % k == 0
    dense = nbody_accelerations(x, mass, softening=1e-3)
    ringed = ring.ring_nbody_accelerations(
        x_pad, m_pad, mesh=mesh, softening=1e-3)[:n]
    assert jnp.all(jnp.isfinite(ringed))
    assert jnp.allclose(dense, ringed, atol=1e-5, rtol=1e-5)


def test_ring_simulate_matches_dense_trajectory(mesh):
    n = 4 * len(jax.devices())
    x, v, mass = _random_system(jax.random.key(4), n)
    system = nbody.new_system(x, v, mass)
    num_steps, dt, soft = 20, 1e-3, 1e-2
    traj = dense_simulate(
        system, dt, num_steps, method="velocity_verlet",
        save_every=num_steps, softening=soft)
    xr, vr, es = ring.ring_simulate(
        x, v, mass, dt, num_steps=num_steps, mesh=mesh,
        save_every=num_steps, softening=soft)
    assert jnp.allclose(traj.final.x, xr, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(traj.final.v, vr, atol=1e-4, rtol=1e-4)
    assert jnp.allclose(traj.energy[-1], es[-1], rtol=1e-4)


def test_ring_simulate_conserves_energy(mesh):
    """Energy-drift oracle (reference NBody.py:68-77) on the sharded path."""
    n = 4 * len(jax.devices())
    x, v, mass = _random_system(jax.random.key(5), n)
    _, _, es = ring.ring_simulate(
        x, v, mass, 1e-4, num_steps=200, mesh=mesh, save_every=20,
        softening=0.1)
    drift = jnp.abs(es - es[0]) / jnp.abs(es[0])
    assert float(jnp.max(drift)) < 1e-5
