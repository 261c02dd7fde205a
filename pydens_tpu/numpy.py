"""Drop-in ``jax.numpy`` namespace for equation callables.

The reference lets users write equations with plain ``torch.*`` math directly
on coordinate symbols (``/root/reference/pydens/model_torch.py:205-221``
docstring examples).  JAX >= 0.9 rejects duck-typed array conversion under
trace, so raw ``jax.numpy`` functions cannot consume the rebuild's lazy
:class:`~pydens_tpu.Expr` coordinate symbols.  This module restores the
reference's "plain math" UX verbatim::

    import pydens_tpu.numpy as jnp   # instead of: import jax.numpy as jnp

    def ode(f, x):
        return D(f, x) - 2 * np.pi * jnp.cos(2 * np.pi * x)

Every function in the namespace is the :func:`~pydens_tpu.lift`-wrapped twin
of its ``jax.numpy`` counterpart: on plain arrays/scalars it behaves exactly
like ``jax.numpy`` (same object semantics, zero overhead beyond one Python
call), and on :class:`Expr` arguments it stays *symbolic* — the result
remains differentiable, so ``D(jnp.cos(x) * f, x)`` applies the full product
rule instead of silently constant-folding the coefficient.

Non-callable attributes (``pi``, ``inf``, ``nan``, dtypes like ``float32``,
the ``ndarray`` alias, ...) and types pass through untouched; submodules
(``linalg``, ``fft``) pass through unwrapped — their functions operate on
materialized arrays, which is outside the per-point equation DSL anyway.
Attribute resolution is lazy and cached, so importing this module costs
nothing and only the functions a user actually touches get wrapped.
"""

import jax.numpy as _jnp

from .ops.tokens import lift as _lift

# The full public jnp surface: star-imports resolve each name through
# __getattr__ below (module-level __getattr__ is consulted for __all__
# entries), so `from pydens_tpu.numpy import *` works like jnp's.
__all__ = [_n for _n in dir(_jnp) if not _n.startswith("_")]


def __getattr__(name):
    obj = getattr(_jnp, name)  # AttributeError propagates, matching jnp
    if callable(obj) and not isinstance(obj, type):
        obj = _lift(obj)
    globals()[name] = obj  # cache: subsequent lookups skip __getattr__
    return obj


def __dir__():
    return sorted(set(dir(_jnp)) | set(globals()))
