"""Ring-streamed distributed resampling: exact parity with the dense
global systematic resampler on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsbasedbayesianinference_tpu import smc
from physicsbasedbayesianinference_tpu.parallel import (
    make_walker_mesh,
)
from physicsbasedbayesianinference_tpu.parallel.resample import (
    ring_systematic_resample,
)


@pytest.fixture(scope="module")
def mesh():
    return make_walker_mesh()


def _dense_systematic(u0, log_w, tree):
    """Dense oracle with the SAME uniform offset the ring version uses."""
    w = jnp.exp(smc.normalize_log_weights(log_w))
    cum = jnp.cumsum(w)
    n = log_w.shape[0]
    pos = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.clip(jnp.searchsorted(cum, pos, side="right"), 0, n - 1)
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, idx, axis=0), tree)


def test_ring_resample_matches_dense(mesh):
    k = len(jax.devices())
    n = 16 * k
    key = jax.random.key(0)
    kq, kw, ku = jax.random.split(key, 3)
    q = jax.random.normal(kq, (n, 5))
    log_w = 2.0 * jax.random.normal(kw, (n,))
    tree = {"q": q, "aux": jnp.arange(n, dtype=jnp.float32)}

    out, zlw = ring_systematic_resample(ku, tree, log_w, mesh=mesh)
    u0 = jax.random.uniform(ku, (), dtype=log_w.dtype)
    expect = _dense_systematic(u0, log_w, tree)
    np.testing.assert_allclose(np.asarray(out["q"]),
                               np.asarray(expect["q"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["aux"]),
                                  np.asarray(expect["aux"]))
    assert float(jnp.max(jnp.abs(zlw))) == 0.0


def test_ring_resample_concentrated_weight(mesh):
    """All weight on one walker of one shard: every output must be that
    walker (the worst-case cross-shard traffic pattern)."""
    k = len(jax.devices())
    n = 8 * k
    q = jnp.arange(n, dtype=jnp.float32)[:, None]
    log_w = jnp.full((n,), -1e9).at[n - 3].set(0.0)
    out, _ = ring_systematic_resample(
        jax.random.key(1), {"q": q}, log_w, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out["q"]),
                               float(n - 3) * np.ones((n, 1)))


def test_ring_resample_uniform_weights_is_near_identity(mesh):
    """Uniform weights + systematic positions reproduce each walker about
    once (low-variance property of systematic resampling)."""
    k = len(jax.devices())
    n = 8 * k
    q = jnp.arange(n, dtype=jnp.float32)[:, None]
    out, _ = ring_systematic_resample(
        jax.random.key(2), {"q": q}, jnp.zeros((n,)), mesh=mesh)
    # each index appears exactly once
    np.testing.assert_array_equal(
        np.sort(np.asarray(out["q"][:, 0])), np.arange(n, dtype=np.float32))


def test_ring_resample_statistical_mean(mesh):
    """Resampled ensemble mean approximates the weighted mean."""
    k = len(jax.devices())
    n = 128 * k
    kq, kw = jax.random.split(jax.random.key(3))
    q = jax.random.normal(kq, (n, 1)) + 2.0
    log_w = q[:, 0]  # upweight larger values
    out, _ = ring_systematic_resample(
        jax.random.key(4), {"q": q}, log_w, mesh=mesh)
    w = jnp.exp(smc.normalize_log_weights(log_w))
    target = float(jnp.sum(w * q[:, 0]))
    got = float(jnp.mean(out["q"]))
    assert abs(got - target) < 0.05, (got, target)


def test_ring_resample_rejects_indivisible(mesh):
    k = len(jax.devices())
    if k == 1:
        pytest.skip("needs >1 device")
    with pytest.raises(ValueError, match="divide"):
        ring_systematic_resample(
            jax.random.key(0), {"q": jnp.zeros((8 * k + 1, 2))},
            jnp.zeros((8 * k + 1,)), mesh=mesh)
