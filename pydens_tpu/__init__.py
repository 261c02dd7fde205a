"""PyDEns-TPU: a TPU-native framework for solving ODEs & PDEs with neural
networks (physics-informed training), built in pure JAX with the full
capability set of the reference ``analysiscenter/pydens`` v1.0.2
(``/root/reference``): common ODEs/PDEs, parametric equation families, and
inverse problems with trainable coefficients.

Public surface mirrors the reference exports
(``/root/reference/pydens/__init__.py:4-5``): ``Solver``, tokens ``D``/``V``,
model classes, plus the sampler suite — and adds the TPU-era pieces: symbolic
math wrappers, device meshes for data-parallel training, and checkpointing.
"""

import os as _os

# Opt-in persistent XLA compilation cache, wired at the package boundary so
# production entrypoints get it without test-harness plumbing (the test
# conftest sets the same config for suite runs).  Deliberately opt-in: on
# jax 0.9's CPU backend the AOT loader logs machine-feature-mismatch
# errors on cache hits (see BENCHMARKS.md "Suite compile time / persistent
# compilation cache"); measure on your backend before enabling in anger.
if _os.environ.get("PYDENS_TPU_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["PYDENS_TPU_COMPILE_CACHE"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from .ops.tokens import D, V, Expr, lift
from .ops.fields import Field
from .ops.functional import grad, div, laplace, hessian_diag, dt, dn
from .ops.math import (sin, cos, tan, arcsin, arccos, arctan, arctan2, sinh,
                       cosh, tanh, exp, expm1, log, log1p, log2, log10, sqrt,
                       square, power, sign, maximum, minimum, where, clip,
                       sigmoid, softplus, erf)
from .models import (Model, ConvBlockModel, TorchModel, FlaxModel,
                     flax_model, SeparableModel)
from .solver import Solver
from .samplers import (Sampler, NumpySampler, NS, ConstantSampler,
                       HistoSampler, ScipySampler, ProductSampler,
                       MixtureSampler, GeometrySampler, BoundarySampler,
                       HaltonSampler)
from .parallel import make_mesh
from .utils.grids import cart_prod, uniform_grid
from .utils.export import load_exported

__version__ = "0.5.0"

__all__ = [
    "Solver", "D", "V", "Field", "Expr", "lift",
    "grad", "div", "laplace", "hessian_diag", "dt", "dn",
    "cart_prod", "uniform_grid",
    "Model", "ConvBlockModel", "TorchModel", "FlaxModel", "flax_model",
    "SeparableModel",
    "Sampler", "NumpySampler", "NS", "ConstantSampler", "HistoSampler",
    "ScipySampler", "ProductSampler", "MixtureSampler", "GeometrySampler",
    "BoundarySampler", "HaltonSampler",
    "make_mesh", "load_exported",
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arctan2", "sinh",
    "cosh", "tanh", "exp", "expm1", "log", "log1p", "log2", "log10", "sqrt",
    "square", "power", "sign", "maximum", "minimum", "where", "clip",
    "sigmoid", "softplus", "erf",
]
