"""Ensemble state tests.

Mirrors the reference's CI-enforced test_ensemble.py (zero init, unit mass)
plus quantitative versions of its plot-based Maxwell-Boltzmann check
(reference src/tests/test_ensemble.py:68-92 eyeballs a histogram; here we
assert moments).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import physicsbasedbayesianinference_tpu as pbbi
from physicsbasedbayesianinference_tpu import ensemble as ens


def test_new_ensemble_zero_init():
    # Parity: reference test_ensemble.test_init (ensemble starts at zero
    # q/p/weights with unit mass).
    state = pbbi.new_ensemble(num_walkers=7, num_dims=3)
    assert state.q.shape == (7, 3)
    assert state.p.shape == (7, 3)
    np.testing.assert_array_equal(np.asarray(state.q), 0.0)
    np.testing.assert_array_equal(np.asarray(state.p), 0.0)
    np.testing.assert_array_equal(np.asarray(state.log_weight), 0.0)
    np.testing.assert_array_equal(np.asarray(state.mass), 1.0)
    assert state.num_walkers == 7
    assert state.num_dims == 3


def test_sample_positions_moments():
    state = pbbi.new_ensemble(num_walkers=50_000, num_dims=2)
    state = pbbi.sample_positions(jax.random.key(0), state, q_std=3.0)
    q = np.asarray(state.q)
    assert abs(q.mean()) < 0.05
    np.testing.assert_allclose(q.std(axis=0), 3.0, rtol=0.02)


def test_thermal_momenta_maxwell_boltzmann():
    # p ~ N(0, m k_B T) per component; with NATURAL constants and T=4, m=2
    # the std is sqrt(8). Quantitative version of reference
    # test_ensemble.py:68-92.
    state = pbbi.new_ensemble(num_walkers=100_000, num_dims=3, mass=2.0)
    state = pbbi.sample_momenta(jax.random.key(1), state, temperature=4.0)
    p = np.asarray(state.p)
    np.testing.assert_allclose(p.std(axis=0), np.sqrt(8.0), rtol=0.02)
    assert abs(p.mean()) < 0.05
    # speed^2 mean = D * k_B T / m * m^2... check kinetic energy instead:
    # <KE> = D/2 * k_B T
    ke = np.asarray(ens.kinetic_energy(state.p, state.mass))
    np.testing.assert_allclose(ke.mean(), 1.5 * 4.0, rtol=0.02)


def test_si_constants_momentum_scale():
    # Reference uses scipy k_B: pStd = sqrt(m k_B T) (ensemble.py:88). With
    # T = 1/k_B (reference test_HMC.py trick) std must be sqrt(m).
    state = pbbi.new_ensemble(num_walkers=40_000, num_dims=2, mass=4.0)
    state = pbbi.sample_momenta(
        jax.random.key(2), state, temperature=1.0 / pbbi.SI.k_B,
        constants=pbbi.SI)
    np.testing.assert_allclose(np.asarray(state.p).std(axis=0), 2.0, rtol=0.03)


def test_walker_accessor_bounds():
    # Parity: reference Ensemble.particle raises IndexError out of bounds
    # (ensemble.py:102-107, exercised by reference test_ensemble.py:61-66).
    state = pbbi.new_ensemble(num_walkers=5, num_dims=2)
    q, p, m, lw = ens.walker(state, 4)
    assert q.shape == (2,)
    assert m.shape == (2,)
    with pytest.raises(IndexError):
        ens.walker(state, 5)
    with pytest.raises(IndexError):
        ens.walker(state, -1)


def test_boltzmann_log_weights_normalised():
    # Log-space realisation of the reference's commented-out setWeights
    # (ensemble.py:52-61): normalised canonical weights.
    state = pbbi.new_ensemble(num_walkers=128, num_dims=2)
    state = pbbi.sample_positions(jax.random.key(3), state, q_std=1.0)
    state = pbbi.sample_momenta(jax.random.key(4), state, temperature=1.0)
    u = 0.5 * jnp.sum(state.q**2, axis=-1)
    lw = ens.boltzmann_log_weights(state, u, temperature=1.0)
    total = jax.scipy.special.logsumexp(lw)
    np.testing.assert_allclose(float(total), 0.0, atol=1e-5)


def test_mass_broadcasting_forms():
    # scalar, per-dim [D], per-walker [W,1], full [W,D]
    w, d = 6, 3
    for mass in (2.0, jnp.full((d,), 2.0), jnp.full((w, 1), 2.0),
                 jnp.full((w, d), 2.0)):
        state = pbbi.new_ensemble(w, d, mass=mass)
        state = pbbi.sample_momenta(jax.random.key(0), state, temperature=1.0)
        ke = ens.kinetic_energy(state.p, state.mass)
        assert ke.shape == (w,)
