"""Symbolic (Expr-aware) math functions.

The reference lets users write equation callables with raw ``torch.*`` math
(``/root/reference/pydens/model_torch.py:205-221`` docstring examples).  In
the rebuild, raw ``jnp.*`` functions REJECT coordinate expressions (JAX >= 0.9
removed duck-typed array conversion under trace, and silent materialization
would constant-fold coordinate-dependent coefficients inside ``D`` anyway).
Use either these wrappers or the full drop-in namespace
``import pydens_tpu.numpy as jnp``.  Both keep everything symbolic, so
``D(cos(x) * f, x)`` applies the full product rule, and fall through to
``jnp`` on plain arrays, so they are safe to use everywhere.
"""

import jax
import jax.numpy as jnp

from .tokens import lift

sin = lift(jnp.sin)
cos = lift(jnp.cos)
tan = lift(jnp.tan)
arcsin = lift(jnp.arcsin)
arccos = lift(jnp.arccos)
arctan = lift(jnp.arctan)
arctan2 = lift(jnp.arctan2)
sinh = lift(jnp.sinh)
cosh = lift(jnp.cosh)
tanh = lift(jnp.tanh)
exp = lift(jnp.exp)
expm1 = lift(jnp.expm1)
log = lift(jnp.log)
log1p = lift(jnp.log1p)
log2 = lift(jnp.log2)
log10 = lift(jnp.log10)
sqrt = lift(jnp.sqrt)
square = lift(jnp.square)
power = lift(jnp.power)
abs = lift(jnp.abs)  # pylint: disable=redefined-builtin
sign = lift(jnp.sign)
maximum = lift(jnp.maximum)
minimum = lift(jnp.minimum)
where = lift(jnp.where)
clip = lift(jnp.clip)
sigmoid = lift(jax.nn.sigmoid)
softplus = lift(jax.nn.softplus)
erf = lift(jax.scipy.special.erf)

__all__ = [
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arctan2",
    "sinh", "cosh", "tanh", "exp", "expm1", "log", "log1p", "log2", "log10",
    "sqrt", "square", "power", "abs", "sign", "maximum", "minimum", "where",
    "clip", "sigmoid", "softplus", "erf",
]
