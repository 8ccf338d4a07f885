"""Native probabilistic-model DSL: sample/plate statements + effect handlers.

The reference defines models the NumPyro way — a plain Python function with
``sample(name, dist, obs=...)`` statements, optionally inside ``plate``
blocks, consumed via ``numpyro.infer.util.log_density(model, args, kwargs,
params)`` (reference samples/NumpyroExamples/CoinToss/CoinToss.py:5-22,
CoinTossExample.py:75-107; eight_schools.py:5-10). NumPyro is not a
guaranteed dependency of this framework, so this module implements that
exact contract natively: a minimal effect-handler stack (seed / substitute /
trace) over ``sample`` statements. Models written for the reference port by
changing one import.

Everything here happens at JAX *trace* time — the model function is plain
Python that runs once per compilation, emitting jnp ops; there is no
runtime interpretation overhead inside jitted samplers.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .distributions import Distribution

Array = jax.Array

_HANDLER_STACK: list = []
_PLATE_STACK: list = []


@dataclasses.dataclass
class Site:
    """One recorded sample statement."""

    name: str
    dist: Distribution
    value: Any
    is_observed: bool
    log_prob: Optional[Array] = None


class _Handler:
    def process(self, name: str, dist: Distribution, obs) -> tuple:
        """Return (value, handled: bool)."""
        raise NotImplementedError

    def postprocess(self, site: Site) -> None:
        pass

    def __enter__(self):
        _HANDLER_STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert _HANDLER_STACK.pop() is self


class seed(_Handler):
    """Draw unobserved sites from their priors using a PRNG key."""

    def __init__(self, key: Array):
        self.key = key
        self._count = 0

    def process(self, name, dist, obs):
        if obs is not None:
            return obs, True
        self._count += 1
        subkey = jax.random.fold_in(self.key, self._count)
        shape = _plate_shape(dist)
        return dist.sample(subkey, shape), True


class substitute(_Handler):
    """Fix named latent sites to given values (constrained space)."""

    def __init__(self, params: dict):
        self.params = params

    def process(self, name, dist, obs):
        if obs is not None:
            return obs, True
        if name in self.params:
            return self.params[name], True
        return None, False


class trace(_Handler):
    """Record every site (value + log_prob) into ``self.sites``."""

    def __init__(self):
        self.sites: dict[str, Site] = {}

    def process(self, name, dist, obs):
        return None, False

    def postprocess(self, site):
        if site.name in self.sites:
            raise ValueError(f"duplicate sample site {site.name!r}")
        self.sites[site.name] = site


@dataclasses.dataclass
class _Plate:
    name: str
    size: int


@contextlib.contextmanager
def plate(name: str, size: int):
    """Conditionally-independent batch dimension (reference
    eight_schools.py:8: ``with plate("J", J):``). Sample statements inside
    draw ``size`` independent copies (broadcast into the batch shape)."""
    _PLATE_STACK.append(_Plate(name, int(size)))
    try:
        yield
    finally:
        _PLATE_STACK.pop()


def _plate_shape(dist: Distribution) -> tuple:
    sizes = tuple(p.size for p in _PLATE_STACK)
    return jnp.broadcast_shapes(sizes, dist.batch_shape)


def sample(name: str, dist: Distribution, obs=None):
    """A sample statement. Under no handler, requires ``obs``."""
    value = obs
    for handler in reversed(_HANDLER_STACK):
        v, handled = handler.process(name, dist, obs)
        if handled:
            value = v
            break
    if value is None:
        raise RuntimeError(
            f"latent site {name!r} reached bottom of handler stack; run the "
            f"model under seed(key) or substitute(params)")
    site = Site(name=name, dist=dist, value=value, is_observed=obs is not None)
    site.log_prob = dist.log_prob(value)
    for handler in reversed(_HANDLER_STACK):
        handler.postprocess(site)
    return value


def log_density(model: Callable, model_args: tuple, model_kwargs: dict,
                params: dict) -> tuple[Array, dict]:
    """Joint log density of the model at constrained ``params``.

    Signature-compatible with ``numpyro.infer.util.log_density`` as the
    reference uses it (CoinTossExample.py:75-81: returns ``(logp, trace)``);
    gradients via ``jax.grad(lambda p: log_density(model, args, kwargs,
    p)[0])`` work exactly as in CoinTossExample.py:96-107.
    """
    with trace() as tr, substitute(params):
        model(*model_args, **model_kwargs)
    total = jnp.asarray(0.0)
    for site in tr.sites.values():
        total = total + jnp.sum(site.log_prob)
    return total, tr.sites


def trace_model(model: Callable, model_args: tuple = (),
                model_kwargs: Optional[dict] = None, *,
                key: Optional[Array] = None,
                params: Optional[dict] = None) -> dict[str, Site]:
    """Run the model and return its site dict; latent sites come from
    ``params`` when given, else from prior draws with ``key``."""
    model_kwargs = model_kwargs or {}
    ctx: Any
    if params is not None:
        ctx = substitute(params)
    else:
        ctx = seed(key if key is not None else jax.random.key(0))
    with trace() as tr, ctx:
        model(*model_args, **model_kwargs)
    return tr.sites
