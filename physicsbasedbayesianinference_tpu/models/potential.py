"""Model -> flat unconstrained potential: the sampler/model crossing point.

SURVEY.md §3.3: "NumPyro model -> flat unconstrained position vector q ->
U(q) = -log_density, grad U via jax.grad -> back to named samples" is the
contract the reference demonstrates (CoinTossExample.py:75-107) but never
wires into its sampler (HMC.py takes a raw density callable instead). This
module owns that wiring for the native DSL:

  mp = make_model_potential(model, model_args, model_kwargs)
  mp.potential(q)        # [D] -> scalar, includes log|Jacobian| terms
  mp.unflatten(q)        # -> {site: constrained value}
  mp.flatten(params)     # -> [D] unconstrained
  mp.init(key, walkers)  # prior-seeded init positions [W, D]

HMC then runs entirely in unconstrained R^D; constrained-support sites
(Uniform, HalfCauchy, ... — the hard part flagged in SURVEY.md §7 step 2)
are handled by the bijections in transforms.py with their Jacobian
corrections added to the log density, matching NumPyro's transform
semantics so posterior moments are comparable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import core
from .core import Site

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class _SiteSpec:
    name: str
    shape: tuple
    size: int
    offset: int
    transform: object  # transforms.Transform


@dataclasses.dataclass(frozen=True)
class ModelPotential:
    """Flat unconstrained potential for a traced model (see module doc)."""

    model: Callable
    model_args: tuple
    model_kwargs: dict
    specs: tuple  # of _SiteSpec, in site order
    num_dims: int
    potential: Callable[[Array], Array] = dataclasses.field(
        default=None, repr=False)

    # -- packing ------------------------------------------------------------

    def unflatten(self, q: Array) -> dict:
        """q: [..., D] unconstrained -> {name: constrained value}."""
        out = {}
        for spec in self.specs:
            x = q[..., spec.offset:spec.offset + spec.size]
            x = x.reshape(q.shape[:-1] + spec.shape)
            out[spec.name] = spec.transform.forward(x)
        return out

    def unflatten_unconstrained(self, q: Array) -> dict:
        out = {}
        for spec in self.specs:
            x = q[..., spec.offset:spec.offset + spec.size]
            out[spec.name] = x.reshape(q.shape[:-1] + spec.shape)
        return out

    def flatten(self, params: dict) -> Array:
        """{name: constrained value} -> [D] unconstrained."""
        parts = []
        for spec in self.specs:
            y = jnp.asarray(params[spec.name])
            x = spec.transform.inverse(y)
            parts.append(x.reshape(x.shape[:x.ndim - len(spec.shape)] + (-1,))
                         if spec.shape else jnp.atleast_1d(x))
        return jnp.concatenate(parts, axis=-1)

    # -- density ------------------------------------------------------------

    def log_density_unconstrained(self, q: Array) -> Array:
        """log pi(q) = log p(T(q), data) + sum log|dT/dq| for one q: [D]."""
        logdet = jnp.asarray(0.0, dtype=q.dtype)
        params = {}
        for spec in self.specs:
            x = q[spec.offset:spec.offset + spec.size].reshape(spec.shape)
            params[spec.name] = spec.transform.forward(x)
            logdet = logdet + jnp.sum(spec.transform.log_det_jacobian(x))
        logp, _ = core.log_density(
            self.model, self.model_args, self.model_kwargs, params)
        return logp + logdet

    # -- initialisation ------------------------------------------------------

    def init(self, key: Array, num_walkers: int, *,
             strategy: str = "uniform", jitter: float = 0.0) -> Array:
        """Initial positions [num_walkers, D] (unconstrained).

        ``strategy="uniform"`` (default) draws q ~ U(-2, 2)^D — the
        Stan/NumPyro convention, robust to heavy-tailed priors (a
        prior-seeded HalfCauchy init can strand walkers at tau ~ 1e4).
        ``strategy="prior"`` seeds each walker from a prior draw.
        """
        if strategy == "uniform":
            q = jax.random.uniform(
                key, (num_walkers, self.num_dims), minval=-2.0, maxval=2.0)
        elif strategy == "prior":
            def one(k):
                sites = core.trace_model(
                    self.model, self.model_args, self.model_kwargs, key=k)
                vals = {name: s.value for name, s in sites.items()
                        if not s.is_observed}
                return self.flatten(vals)

            q = jax.vmap(one)(jax.random.split(key, num_walkers))
        else:
            raise ValueError(f"unknown init strategy {strategy!r}")
        if jitter:
            q = q + jitter * jax.random.normal(
                jax.random.fold_in(key, 0x9e37), q.shape, dtype=q.dtype)
        return q

    def constrain_samples(self, samples: Array) -> dict:
        """[..., D] unconstrained samples -> named constrained arrays."""
        return self.unflatten(samples)

    def trace_values(self, q: Array) -> dict:
        """All non-observed site values at ``q: [D]`` (or batched
        ``[..., D]`` via vmap over the leading axes) — INCLUDING
        deterministic sites, so reparameterised models (``reparam=``)
        still report the original named quantities (e.g. centered
        eight-schools' ``theta`` when the latent space carries
        ``theta_decentered``)."""
        def one(qv):
            sites = core.trace_model(
                self.model, self.model_args, self.model_kwargs,
                params=self.unflatten(qv))
            return {name: s.value for name, s in sites.items()
                    if not s.is_observed}

        for _ in range(jnp.ndim(q) - 1):
            one = jax.vmap(one)
        return one(q)


def make_model_potential(
    model: Callable,
    model_args: tuple = (),
    model_kwargs: Optional[dict] = None,
    *,
    reparam=None,
) -> ModelPotential:
    """Trace the model once (prior seed) to discover latent sites, shapes,
    and supports; return a :class:`ModelPotential` whose ``potential`` is a
    per-walker ``q:[D] -> scalar`` negative log density, ready for
    :func:`~...hmc.build_hmc_kernel` (which vmaps + differentiates it).

    ``reparam``: ``"auto"``, a site-name collection, or a ``{name: bool}``
    dict — non-center the selected loc-scale sites (see
    :class:`..core.reparam`); the latent space then carries the
    ``*_decentered`` coordinates and the original names become
    deterministic sites (recover them with
    :meth:`ModelPotential.trace_values`)."""
    model_kwargs = dict(model_kwargs or {})
    if reparam is not None:
        model = core.reparametrized(model, reparam)
    sites = core.trace_model(model, model_args, model_kwargs,
                             key=jax.random.key(0))
    specs = []
    offset = 0
    for name, site in sites.items():
        if site.is_observed or site.is_deterministic:
            continue
        if site.dist.support is None:
            raise ValueError(
                f"latent site {name!r} has discrete distribution "
                f"{type(site.dist).__name__}; HMC requires continuous "
                f"latents (marginalise or condition it)")
        shape = tuple(jnp.shape(site.value))
        size = math.prod(shape) if shape else 1
        specs.append(_SiteSpec(
            name=name, shape=shape, size=size, offset=offset,
            transform=site.dist.support))
        offset += size
    if offset == 0:
        raise ValueError("model has no latent sites")

    mp = ModelPotential(
        model=model, model_args=model_args, model_kwargs=model_kwargs,
        specs=tuple(specs), num_dims=offset)

    def potential(q: Array) -> Array:
        return -mp.log_density_unconstrained(q)

    potential.name = getattr(model, "__name__", "model")  # type: ignore
    potential.analytic_grad = None  # type: ignore
    object.__setattr__(mp, "potential", potential)
    return mp
