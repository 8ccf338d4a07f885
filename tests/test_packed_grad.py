"""Grad-only / value-only packed transforms (the fused-kernel loop body)."""

import jax
import jax.numpy as jnp
import numpy as np

from physicsbasedbayesianinference_tpu.ops.packed import (
    packed_grad,
    packed_value,
)
from physicsbasedbayesianinference_tpu.ops.potentials import (
    batched_value_and_grad,
    make_funnel,
    make_standard_normal,
)
from physicsbasedbayesianinference_tpu.models.examples import (
    EIGHT_SCHOOLS_DATA,
    eight_schools_noncentered,
)
from physicsbasedbayesianinference_tpu.models.potential import (
    make_model_potential,
)
from physicsbasedbayesianinference_tpu.ops.packed import pad_potential


def _check(pot, d, use_analytic=True):
    pack = 128 // d
    rows = 5
    q = 0.6 * jax.random.normal(jax.random.key(0), (rows * pack, d))
    qp = q.reshape(rows, pack * d)
    u_ref, g_ref = batched_value_and_grad(pot, use_analytic=use_analytic)(q)
    g = packed_grad(pot, d, use_analytic=use_analytic)(qp)
    u = packed_value(pot, d)(qp)
    np.testing.assert_allclose(np.asarray(g).reshape(q.shape),
                               np.asarray(g_ref), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(u).reshape(-1),
                               np.asarray(u_ref), rtol=3e-5, atol=3e-5)


def test_grad_only_std_normal():
    _check(make_standard_normal(32), 32)


def test_grad_only_funnel_autodiff():
    _check(make_funnel(16), 16, use_analytic=False)


def test_grad_only_eight_schools():
    mp = make_model_potential(eight_schools_noncentered, (),
                              EIGHT_SCHOOLS_DATA)
    _check(pad_potential(mp.potential, mp.num_dims), 16)


def test_grad_only_dces_value_reductions():
    """For an analytic-grad potential the grad-only jaxpr must contain NO
    dot_general at all (the value's segment-sum matmul is dead code)."""
    pg = packed_grad(make_standard_normal(32), 32)
    closed = jax.make_jaxpr(pg)(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    names = [e.primitive.name for e in closed.jaxpr.eqns]
    assert "dot_general" not in names, names
