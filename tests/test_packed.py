"""Tests for the walker-packed layout transform (ops/packed.py).

The transform is pure jax->jax, so its parity with the natural-layout
oracle is fully CPU-testable; the Pallas kernel that consumes it
(make_fused_hmc_packed) is statistically validated on TPU (this file's
TPU-gated test + benchmarks/run_benchmarks.py).

Oracle: ops.potentials.batched_value_and_grad in the natural [W, D]
layout — the same potential evaluated both ways must agree to float32
reassociation tolerance for every target family the framework ships
(reference parity anchor: the models the reference fits,
samples/NumpyroExamples/eight_schools.py:5-10, CoinToss.py:5-22).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsbasedbayesianinference_tpu.ops.packed import (
    PackedUnsupported,
    next_packable_dim,
    pack_for,
    packed_value_and_grad,
    pad_potential,
)
from physicsbasedbayesianinference_tpu.ops.potentials import (
    batched_value_and_grad,
    make_banana,
    make_funnel,
    make_gaussian,
    make_gaussian_mixture,
    make_harmonic,
    make_standard_normal,
)
from physicsbasedbayesianinference_tpu.models.examples import (
    EIGHT_SCHOOLS_DATA,
    coin_toss,
    eight_schools,
    eight_schools_noncentered,
    logistic_regression,
)
from physicsbasedbayesianinference_tpu.models.potential import (
    make_model_potential,
)


def _assert_packed_parity(pot, d, *, use_analytic=True, rows=6, seed=0,
                          scale=0.7, tol=3e-5):
    pack = 128 // d
    w = rows * pack
    q = scale * jax.random.normal(jax.random.key(seed), (w, d))
    vg = batched_value_and_grad(pot, use_analytic=use_analytic)
    u_ref, g_ref = vg(q)
    pvg = packed_value_and_grad(pot, d, use_analytic=use_analytic)
    u_p, g_p = pvg(q.reshape(rows, pack * d))
    np.testing.assert_allclose(np.asarray(u_p).reshape(-1),
                               np.asarray(u_ref), rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(g_p).reshape(w, d),
                               np.asarray(g_ref), rtol=tol, atol=tol)


def test_std_normal_packed():
    _assert_packed_parity(make_standard_normal(32), 32)


def test_harmonic_packed_analytic_and_autodiff():
    pot = make_harmonic(jnp.linspace(0.5, 2.0, 16))
    _assert_packed_parity(pot, 16, use_analytic=True)
    _assert_packed_parity(pot, 16, use_analytic=False)


def test_full_covariance_gaussian_packed():
    cov = np.eye(8) * 1.5 + 0.3
    _assert_packed_parity(make_gaussian(np.arange(8.0), cov=cov), 8)


def test_banana_packed():
    # extreme pack factor: 64 walkers per lane row
    _assert_packed_parity(make_banana(), 2)


def test_funnel_packed():
    _assert_packed_parity(make_funnel(16), 16)


def test_mixture_packed_segment_max():
    # exercises the reduce_max lane-shift fold inside logsumexp
    means = jnp.asarray(np.random.RandomState(0).randn(4, 8) * 2.0)
    _assert_packed_parity(make_gaussian_mixture(means), 8)


def test_mixture_packed_nonpow2_components():
    # k=3 segment fold (non-power-of-two fold width)
    means = jnp.asarray(np.random.RandomState(1).randn(3, 8) * 2.0)
    _assert_packed_parity(make_gaussian_mixture(means), 8)


def test_eight_schools_noncentered_packed_padded():
    mp = make_model_potential(eight_schools_noncentered, (),
                              EIGHT_SCHOOLS_DATA)
    assert mp.num_dims == 10
    pot = pad_potential(mp.potential, mp.num_dims)
    assert pot.padded_dims == 16
    _assert_packed_parity(pot, 16)


def test_eight_schools_centered_packed_padded():
    mp = make_model_potential(eight_schools, (), EIGHT_SCHOOLS_DATA)
    _assert_packed_parity(pad_potential(mp.potential, mp.num_dims), 16)


def test_logistic_regression_packed():
    key = jax.random.key(0)
    x = jax.random.normal(key, (64, 31))
    w_true = jax.random.normal(jax.random.key(1), (31,))
    labels = (jax.random.uniform(jax.random.key(2), (64,))
              < jax.nn.sigmoid(x @ w_true)).astype(jnp.float32)
    mp = make_model_potential(logistic_regression, (x, labels), {})
    assert mp.num_dims == 32
    _assert_packed_parity(mp.potential, 32)


def test_coin_toss_packed():
    c1 = (jax.random.uniform(jax.random.key(4), (50,)) < 0.7).astype(
        jnp.float32)
    c2 = (jax.random.uniform(jax.random.key(5), (50,)) < 0.3).astype(
        jnp.float32)
    mp = make_model_potential(coin_toss, (c1, c2), {})
    _assert_packed_parity(mp.potential, mp.num_dims)


def test_packed_traces_clean_under_jit():
    """The replay must stage NO constant-construction ops: everything
    reaching the consuming Pallas kernel is either a jaxpr constant (2D)
    or an op on walker data. This is what makes the kernel compilable by
    Mosaic (kron/iota/eye reshapes are not lowerable there)."""
    pvg = packed_value_and_grad(make_funnel(16), 16)
    closed = jax.make_jaxpr(pvg)(
        jax.ShapeDtypeStruct((8, 128), jnp.float32))
    names = {e.primitive.name for e in closed.jaxpr.eqns}
    for banned in ("iota", "tile", "kron", "gather", "scatter"):
        assert banned not in names, f"{banned} staged into packed trace"
    for c in closed.consts:
        assert jnp.ndim(c) == 2, f"non-2D packed const {jnp.shape(c)}"
    # and jit equals eager
    qp = jax.random.normal(jax.random.key(0), (8, 128))
    u1, g1 = jax.jit(pvg)(qp)
    u2, g2 = pvg(qp)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_pack_for_and_next_packable():
    assert pack_for(32) == 4
    assert pack_for(128) == 1
    with pytest.raises(ValueError):
        pack_for(33)
    assert next_packable_dim(10) == 16
    assert next_packable_dim(32) == 32
    assert next_packable_dim(65) == 128
    with pytest.raises(ValueError):
        next_packable_dim(129)


def test_pad_potential_marginals_exact():
    """The padded target's first-D marginal is exactly the original:
    U'(q') = U(q[:D]) + 0.5|q'[D:]|^2 separates, so the analytic grad and
    energy decompose."""
    pot = make_funnel(10)
    padded = pad_potential(pot, 10)
    q = jax.random.normal(jax.random.key(0), (16,))
    u = padded(q)
    expected = pot(q[:10]) + 0.5 * jnp.sum(q[10:] ** 2)
    np.testing.assert_allclose(float(u), float(expected), rtol=1e-6)


def test_pad_potential_analytic_grad():
    pot = make_harmonic(jnp.arange(1.0, 11.0))
    padded = pad_potential(pot, 10)
    q = jax.random.normal(jax.random.key(1), (5, 16))
    g = padded.analytic_grad(q)
    g_ref = jax.vmap(jax.grad(lambda x: padded(x)))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-6)


def test_unsupported_primitive_raises_at_build():
    def weird(q):
        # cummax is not coverable by the affine/elementwise/seg rules
        return jnp.sum(jax.lax.cummax(q, axis=0) * q)

    with pytest.raises(PackedUnsupported):
        packed_value_and_grad(weird, 16, use_analytic=False)


def test_packed_kernel_interpret_mode_matches_reference_dynamics():
    """make_fused_hmc_packed cannot run off-TPU (hardware PRNG), but the
    hmc.build_fused_hmc_kernel wiring must silently fall back to the
    composed kernel on CPU and still sample correctly."""
    from physicsbasedbayesianinference_tpu.hmc import build_fused_hmc_kernel
    pot = make_funnel(16)
    kernel = build_fused_hmc_kernel(pot, num_steps=4)
    state = kernel.init(jax.random.normal(jax.random.key(0), (64, 16)))
    state2, info = kernel.step(jax.random.key(1), state, jnp.float32(0.1))
    assert bool(jnp.all(jnp.isfinite(info.accept_prob)))


def test_affine_fusion_collapses_logreg_grad_to_two_matmuls():
    """Regression lock on affine-chain fusion (VERDICT.md r4 item 2):
    the logistic-regression packed GRADIENT jaxpr must contain exactly
    TWO dot_generals — one fused forward map (q -> logits, the whole
    slice/X-matmul/bias-broadcast chain) and one fused backward map
    (residual -> grad) — and no transcendental other than the single
    tanh-form sigmoid. Pre-fusion this jaxpr carried 8 matmuls and ~30
    bookkeeping ops (22.4M t/s on TPU vs 56M fused)."""
    from physicsbasedbayesianinference_tpu.models.examples import (
        logistic_regression)
    from physicsbasedbayesianinference_tpu.models.potential import (
        make_model_potential)
    from physicsbasedbayesianinference_tpu.ops.packed import packed_grad

    x = jax.random.normal(jax.random.key(7), (64, 31))
    labels = (jax.random.uniform(jax.random.key(9), (64,))
              < 0.5).astype(jnp.float32)
    mp = make_model_potential(logistic_regression, (x, labels), {})
    pg = packed_grad(mp.potential, 32)
    closed = jax.make_jaxpr(pg)(jax.ShapeDtypeStruct((8, 128),
                                                     jnp.float32))
    prims = [e.primitive.name for e in closed.jaxpr.eqns]
    assert prims.count("dot_general") == 2, prims
    transcendental = {"exp", "log", "log1p", "logistic", "tanh", "erf"}
    assert sum(p in transcendental for p in prims) == 1, prims


def test_surrogate_substitution_grad_close_and_transcendental_free():
    """ops.packed.substitute_primitives replaces logistic/tanh with
    algebraic stand-ins: the substituted gradient stays within the
    approximation's error envelope of the exact one and its jaxpr has
    ZERO transcendentals (the opt-in surrogate-force mechanism)."""
    from physicsbasedbayesianinference_tpu.models.examples import (
        logistic_regression)
    from physicsbasedbayesianinference_tpu.models.potential import (
        make_model_potential)
    from physicsbasedbayesianinference_tpu.ops.packed import (
        FAST_TRANSCENDENTAL_SUBS, packed_grad)

    x = jax.random.normal(jax.random.key(7), (64, 31))
    labels = (jax.random.uniform(jax.random.key(9), (64,))
              < 0.5).astype(jnp.float32)
    mp = make_model_potential(logistic_regression, (x, labels), {})
    pg = packed_grad(mp.potential, 32)
    pg_fast = packed_grad(mp.potential, 32,
                          fast_subs=FAST_TRANSCENDENTAL_SUBS)
    qp = 0.3 * jax.random.normal(jax.random.key(1), (4, 128))
    ge, gf = pg(qp), pg_fast(qp)
    rel = float(jnp.abs(ge - gf).max() / jnp.abs(ge).max())
    assert rel < 0.3, rel  # sigma~ max error 0.047 x data-row norms
    closed = jax.make_jaxpr(pg_fast)(jax.ShapeDtypeStruct(
        (8, 128), jnp.float32))
    prims = {e.primitive.name for e in closed.jaxpr.eqns}
    assert not prims & {"exp", "log", "log1p", "logistic", "tanh"}, prims
