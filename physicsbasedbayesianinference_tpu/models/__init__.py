"""Native probabilistic-model DSL (the framework's NumPyro-contract layer).

Write models as plain functions of their data with ``sample``/``plate``
statements (the style of reference samples/NumpyroExamples/), turn them
into flat unconstrained potentials with :func:`make_model_potential`, and
hand ``mp.potential`` to the HMC/NUTS/SMC samplers. A gated adapter for
real NumPyro models lives in :mod:`.numpyro_adapter`.
"""

from . import distributions, examples, transforms
from .core import (
    Site,
    log_density,
    plate,
    reparam,
    reparametrized,
    sample,
    seed,
    substitute,
    trace,
    trace_model,
)
from .potential import ModelPotential, make_model_potential

__all__ = [
    "distributions",
    "examples",
    "transforms",
    "Site",
    "sample",
    "plate",
    "reparam",
    "reparametrized",
    "seed",
    "substitute",
    "trace",
    "trace_model",
    "log_density",
    "ModelPotential",
    "make_model_potential",
]
