"""Adapter for NumPyro-defined models (optional dependency).

The reference's model DSL *is* NumPyro (samples/NumpyroExamples/); this
framework's native DSL (models/core.py) covers environments without it.
When NumPyro is importable, :func:`from_numpyro` wraps any NumPyro model
into the same flat-unconstrained ``ModelPotential`` interface, using
NumPyro's own ``initialize_model`` machinery (potential fn in unconstrained
space + constrain/unconstrain transforms) — the exact contract the
reference demonstrates via ``numpyro.infer.util.log_density`` + ``jax.grad``
(CoinTossExample.py:75-107).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

try:  # pragma: no cover - exercised only when numpyro is installed
    import numpyro
    from numpyro.infer.util import initialize_model

    HAS_NUMPYRO = True
except ImportError:  # pragma: no cover
    numpyro = None
    initialize_model = None
    HAS_NUMPYRO = False

Array = jax.Array


class NumpyroModelPotential:
    """Duck-typed like models.potential.ModelPotential (potential /
    unflatten / init / num_dims) but backed by NumPyro's transforms."""

    def __init__(self, model: Callable, model_args: tuple,
                 model_kwargs: dict, key: Optional[Array] = None):
        if not HAS_NUMPYRO:
            raise ImportError(
                "numpyro is not installed; use the native DSL "
                "(physicsbasedbayesianinference_tpu.models) instead")
        key = key if key is not None else jax.random.PRNGKey(0)
        init, pot_fn, postprocess, _ = initialize_model(
            key, model, model_args=model_args, model_kwargs=model_kwargs,
            dynamic_args=False)
        params = init.z
        flat0, unravel = jax.flatten_util.ravel_pytree(params)
        self.num_dims = flat0.shape[0]
        self._unravel = unravel
        self._pot_fn = pot_fn
        self._postprocess = postprocess
        self._init_flat = flat0

        def potential(q: Array) -> Array:
            return pot_fn(unravel(q))

        potential.name = getattr(model, "__name__", "numpyro_model")
        potential.analytic_grad = None
        self.potential = potential

    def unflatten(self, q: Array) -> dict:
        """[..., D] unconstrained -> named constrained params.

        With ``dynamic_args=False`` NumPyro's ``postprocess_fn`` is the
        constrain function itself (``constrain_fn(params)``), not a
        factory."""
        unc = q.reshape(-1, self.num_dims)
        out = jax.vmap(lambda v: self._postprocess(self._unravel(v)))(unc)
        return jax.tree_util.tree_map(
            lambda x: x.reshape(q.shape[:-1] + x.shape[1:]), out)

    def init(self, key: Array, num_walkers: int, jitter: float = 1.0):
        """Initial positions: NumPyro init point + Gaussian jitter."""
        base = jnp.broadcast_to(self._init_flat,
                                (num_walkers, self.num_dims))
        return base + jitter * jax.random.normal(
            key, base.shape, dtype=base.dtype)


def from_numpyro(model: Callable, model_args: tuple = (),
                 model_kwargs: Optional[dict] = None,
                 key: Optional[Array] = None) -> NumpyroModelPotential:
    """Wrap a NumPyro model for this framework's HMC/NUTS/SMC samplers."""
    return NumpyroModelPotential(model, model_args, dict(model_kwargs or {}),
                                 key)
