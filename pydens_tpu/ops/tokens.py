"""Differentiation (`D`) and trainable-variable (`V`) tokens — the TPU-native
re-design of the reference's autograd bridge.

Reference semantics (``/root/reference/pydens/model_torch.py:174-188``):

* ``D(y, x)`` is ``torch.autograd.grad(y.sum(), x, retain_graph=True,
  create_graph=True)[0]`` — the per-point partial derivative of ``y`` with
  respect to the leaf coordinate column ``x``.  It relies on the dynamic torch
  graph: every coordinate is a separate ``(N, 1)`` leaf tensor and ``y.sum()``
  exploits the batch-diagonal Jacobian structure.
* ``V(name, ...)`` lazily creates an ``nn.Parameter`` on the model found via a
  ``ContextVar`` so trainable coefficients can be introduced from inside the
  user's equation callable.

JAX has no dynamic tape, so the rebuild re-expresses both tokens functionally:

* Every quantity inside an equation callable is a lazy :class:`Expr` node
  wrapping a *pure closure over the list of leaf columns*.  ``D(y, x)`` builds
  a new node whose closure is a ``jax.jvp`` tap of ``y``'s closure with a
  one-hot-column tangent — the forward-mode analogue of the reference's
  batch-diagonal trick (tangent = ones in column ``k`` extracts the per-point
  partial for row-wise functions).  Nested ``D`` composes ``jvp`` — i.e.
  higher-order *forward* mode, the efficient scheme for Laplacian taps on TPU
  (reverse-over-forward once the outer loss gradient is taken).
* ``V`` reads/creates entries of a ``variables`` sub-pytree of the parameter
  tree through a scoped registry (:func:`variable_scope`), mirroring the
  reference's init-time fake run that materializes all variables before the
  optimizer exists.

Everything here traces under ``jax.jit``: the whole residual, including all
derivative taps, compiles into a single XLA computation where common primal
subgraphs are CSE'd and elementwise ops fuse into the matmuls.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Expr", "D", "V", "variable_scope", "as_array", "lift",
           "PLAN_MAX_ORDER"]

# Highest derivative order the Taylor plan will schedule.  The per-order
# Faà di Bruno activation rule has Bell(n) terms (1, 2, 5, 15, 52, 203 for
# n = 1..6) and the ansatz substitution 2^n - 1 cross terms, so compile
# time grows steeply past this; deeper nesting falls back to nested jvp,
# which is always correct.
PLAN_MAX_ORDER = 6


class EvalContext:
    """Shared evaluation context: the current list of leaf columns.

    One context is created per equation evaluation (one per training step /
    predict call); every :class:`Expr` built during that evaluation references
    it so that lazy ``.value`` computation sees the right leaves.

    Derivative planning: during the Solver's init-time discovery run the
    context records which *pure field derivatives* (multi-indices of leaf
    coordinates applied directly to the field) the equation uses, and whether
    every ``D`` application is such a pure tap (``plan_ok``).  When the plan
    holds, the training step computes all taps in ONE Taylor-mode
    propagation and evaluation reads them from ``table`` instead of
    re-deriving the network with nested ``jvp``.
    """

    __slots__ = ("leaves", "derivs", "plan_ok", "table")

    def __init__(self, leaves, table=None):
        self.leaves = list(leaves)
        self.derivs = set()
        self.plan_ok = True
        self.table = table  # dict: multi-index tuple -> (N, k) array


class Expr:
    """A lazy, differentiable quantity inside an equation callable.

    Wraps ``fn(leaves) -> array``, a pure function of the leaf coordinate
    columns (network parameters are closed over as traced values).  Supports
    the full numeric operator protocol; mixing with plain arrays/scalars
    treats them as constants with respect to the leaves.

    Plain ``numpy`` ufunc math works directly (``np.cos(2 * np.pi * x)``
    stays symbolic via ``__array_ufunc__`` → :func:`lift`), matching the
    reference's free np/torch mixing.  Raw ``jax.numpy`` functions do NOT
    accept ``Expr`` objects (JAX >= 0.9 rejects duck-typed array conversion
    under trace) — use the drop-in namespace ``import pydens_tpu.numpy as
    jnp``, the symbolic math wrappers exported from ``pydens_tpu`` (``sin``,
    ``cos``, ``exp``, ...), or :func:`lift`; they behave identically on
    plain arrays and keep expressions differentiable, so
    ``D(cos(x) * f, x)`` applies the full product rule.  ``.value``
    materializes the current (traced) array when a non-differentiable
    escape hatch is needed.
    """

    __slots__ = ("fn", "ctx", "leaf_index", "deriv", "post", "_value",
                 "_has_value")

    def __init__(self, fn, ctx, leaf_index=None, deriv=None, post=None):
        self.fn = fn
        self.ctx = ctx
        self.leaf_index = leaf_index
        # Pure-field-derivative multi-index (sorted tuple of leaf indices;
        # () = the field itself).  None = not a pure field tap.
        self.deriv = deriv
        # Component selection applied after a table lookup (slicing commutes
        # with coordinate differentiation, so `f[:, 0:1]` stays a pure tap).
        self.post = post
        self._value = None
        self._has_value = False

    # -- evaluation ---------------------------------------------------------
    def _eval(self, ls):
        """Evaluate w.r.t. the given leaves; pure field taps read from the
        precomputed Taylor table when one is active."""
        if self.deriv is not None and self.ctx.table is not None:
            if self.deriv not in self.ctx.table:
                raise KeyError(
                    f"field derivative {self.deriv} was not planned at "
                    "Solver construction — the equation callable requested "
                    "different derivatives than it did during the init-time "
                    "discovery run.  Equation callables must be "
                    "deterministic (no randomness/branching that changes "
                    "which D taps are taken); as a workaround pass "
                    "fit(fast_taps=False).")
            v = self.ctx.table[self.deriv]
            return self.post(v) if self.post is not None else v
        return self.fn(ls)

    @property
    def value(self):
        if not self._has_value:
            self._value = self._eval(self.ctx.leaves)
            self._has_value = True
        return self._value

    @property
    def shape(self):
        return jnp.shape(self.value)

    @property
    def dtype(self):
        return jnp.result_type(self.value)

    def __repr__(self):
        # jnp.* functions reject Expr operands with "Argument <repr> ... is
        # not a valid JAX type"; make that repr carry the fix.
        return ("Expr(a pydens_tpu symbolic expression — raw jax.numpy math "
                "cannot consume it; write equations with "
                "`import pydens_tpu.numpy as jnp` (drop-in), use the "
                "symbolic twins exported from pydens_tpu (pydens_tpu.cos "
                "etc.), or wrap your function with pydens_tpu.lift)")

    # -- algebra ------------------------------------------------------------
    def _unary(self, op):
        return Expr(lambda ls: op(self._eval(ls)), self.ctx)

    def _binary(self, other, op, reflected=False):
        if isinstance(other, Expr):
            if reflected:
                return Expr(lambda ls: op(other._eval(ls), self._eval(ls)),
                            self.ctx)
            return Expr(lambda ls: op(self._eval(ls), other._eval(ls)),
                        self.ctx)
        # Constant w.r.t. the leaves (python number, np/jnp array, tracer).
        if reflected:
            return Expr(lambda ls: op(other, self._eval(ls)), self.ctx)
        return Expr(lambda ls: op(self._eval(ls), other), self.ctx)

    def __add__(self, o):
        return self._binary(o, jnp.add)

    def __radd__(self, o):
        return self._binary(o, jnp.add, reflected=True)

    def __sub__(self, o):
        return self._binary(o, jnp.subtract)

    def __rsub__(self, o):
        return self._binary(o, jnp.subtract, reflected=True)

    def __mul__(self, o):
        return self._binary(o, jnp.multiply)

    def __rmul__(self, o):
        return self._binary(o, jnp.multiply, reflected=True)

    def __truediv__(self, o):
        return self._binary(o, jnp.divide)

    def __rtruediv__(self, o):
        return self._binary(o, jnp.divide, reflected=True)

    def __pow__(self, o):
        return self._binary(o, jnp.power)

    def __rpow__(self, o):
        return self._binary(o, jnp.power, reflected=True)

    def __mod__(self, o):
        return self._binary(o, jnp.mod)

    def __matmul__(self, o):
        return self._binary(o, jnp.matmul)

    def __neg__(self):
        return self._unary(jnp.negative)

    def __pos__(self):
        return self

    def __abs__(self):
        return self._unary(jnp.abs)

    def __getitem__(self, idx):
        out = self._unary(lambda v: v[idx])
        if self.deriv is not None:
            # Component slicing of a pure field tap stays pure.
            out.deriv = self.deriv
            prev = self.post
            out.post = ((lambda v: prev(v)[idx]) if prev is not None
                        else (lambda v: v[idx]))
        return out

    # -- numpy interop ------------------------------------------------------
    # The reference mixes np and torch math freely inside equations
    # (`/root/reference/pydens/model_torch.py:207-221`, e.g.
    # ``D(f, x) - 2 * np.pi * torch.cos(2 * np.pi * x)``); routing numpy
    # ufuncs through :func:`lift` lets plain ``np.cos(x)`` on a coordinate
    # symbol stay symbolic and differentiable, so equations written with
    # ``np.*`` math only port unchanged.
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            raise TypeError(
                f"numpy ufunc method {ufunc.__name__}.{method} is not "
                "supported on symbolic expressions; use the pydens_tpu math "
                "functions (pydens_tpu.cos, ...) or pydens_tpu.lift")
        jfn = getattr(jnp, ufunc.__name__, None)
        if jfn is None:
            raise TypeError(
                f"numpy ufunc {ufunc.__name__!r} has no jax.numpy "
                "equivalent to apply symbolically; wrap a jnp-compatible "
                "function with pydens_tpu.lift instead")
        return lift(jfn)(*inputs, **kwargs)

    # -- torch interop ------------------------------------------------------
    # The reference's README/tutorial equations use torch math on the
    # coordinate symbols (``torch.sin(np.pi * (x + y))``,
    # `/root/reference/README.md:36`).  torch dispatches its functional API
    # on ANY argument type defining ``__torch_function__``, so routing the
    # call through the same :func:`lift` machinery lets those equations
    # port verbatim: the torch function is swapped for its jax.numpy twin
    # and stays symbolic/differentiable; torch.Tensor arguments are
    # constants in equation context and convert to arrays.
    _TORCH_TO_JNP = {
        "asin": "arcsin", "acos": "arccos", "atan": "arctan",
        "atan2": "arctan2", "asinh": "arcsinh", "acosh": "arccosh",
        "atanh": "arctanh", "clamp": "clip", "pow": "power",
        "mul": "multiply", "div": "divide", "sub": "subtract",
        "neg": "negative",
    }

    @classmethod
    def __torch_function__(cls, func, types, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        name = getattr(func, "__name__", "")
        jfn = {"sigmoid": jax.nn.sigmoid,
               "rsqrt": jax.lax.rsqrt,
               "relu": jax.nn.relu}.get(name)
        if jfn is None and name in ("max", "min", "maximum", "minimum"):
            # torch.max/min are arity-overloaded: two array arguments mean
            # ELEMENTWISE max/min (jnp.maximum/minimum — jnp.max's second
            # positional is an axis), one argument is a reduction.
            if len(args) >= 2 and not isinstance(
                    args[1], (int, np.integer)):
                jfn = jnp.maximum if name in ("max", "maximum") \
                    else jnp.minimum
            else:
                jfn = jnp.max if name in ("max", "maximum") else jnp.min
        if jfn is None:
            jfn = getattr(jnp, cls._TORCH_TO_JNP.get(name, name), None)
        if jfn is None or not callable(jfn):
            raise TypeError(
                f"torch.{name} has no jax.numpy equivalent to apply "
                "symbolically on a coordinate expression; use the "
                "pydens_tpu math functions (pydens_tpu.cos, ...) or wrap "
                "a jnp-compatible function with pydens_tpu.lift")

        def conv(a):
            if type(a).__module__.split(".")[0] == "torch" and \
                    hasattr(a, "detach"):
                return np.asarray(a.detach().cpu())
            return a

        args = tuple(conv(a) for a in args)
        kwargs = {k: conv(v) for k, v in kwargs.items()}
        return lift(jfn)(*args, **kwargs)

    # Comparisons materialize — they are not differentiable anyway.
    def __lt__(self, o):
        return self.value < _materialize(o)

    def __le__(self, o):
        return self.value <= _materialize(o)

    def __gt__(self, o):
        return self.value > _materialize(o)

    def __ge__(self, o):
        return self.value >= _materialize(o)

    # Equality must be elementwise like the four ordering comparisons —
    # the object.__eq__ identity fallback would make `where(x == 0, a, b)`
    # silently pick `b` everywhere.
    def __eq__(self, o):
        return self.value == _materialize(o)

    def __ne__(self, o):
        return self.value != _materialize(o)

    # Defining __eq__ clears __hash__; Exprs still hash by identity.
    __hash__ = object.__hash__


def _materialize(x):
    return x.value if isinstance(x, Expr) else x


def as_array(x):
    """Evaluate ``x`` to a concrete (traced) array: Expr -> value, else as-is."""
    return jnp.asarray(x.value) if isinstance(x, Expr) else jnp.asarray(x)


def lift(jfn):
    """Wrap any jnp-compatible function so it stays symbolic on :class:`Expr` args.

    ``lift(jnp.cos)(x)`` behaves like ``jnp.cos`` on arrays but returns a
    differentiable ``Expr`` when any positional argument is an ``Expr``.
    Keyword arguments are treated as constants.
    """

    def wrapped(*args, **kwargs):
        ctx = None
        for a in args:
            if isinstance(a, Expr):
                ctx = a.ctx
                break
        if ctx is None:
            return jfn(*args, **kwargs)

        def fn(ls):
            vals = [a._eval(ls) if isinstance(a, Expr) else a for a in args]
            return jfn(*vals, **kwargs)

        return Expr(fn, ctx)

    wrapped.__name__ = getattr(jfn, "__name__", "lifted")
    wrapped.__doc__ = f"Symbolic (Expr-aware) version of {wrapped.__name__}."
    return wrapped


# ---------------------------------------------------------------------------
# D token
# ---------------------------------------------------------------------------

def D(y, x):
    """Differentiation token: per-point partial derivative of ``y`` w.r.t. ``x``.

    Equivalent to the reference's
    ``grad(y.sum(), x, retain_graph=True, create_graph=True)[0]``
    (``/root/reference/pydens/model_torch.py:174-178``) but implemented as a
    forward-mode (``jax.jvp``) tap with a one-hot-column tangent, which is
    exact for batch-diagonal (row-wise) functions and composes to arbitrary
    order: ``D(D(f, x), x)`` is a second-order forward tap.

    Parameters
    ----------
    y : Expr
        Quantity built from the equation's field/coordinate symbols.
    x : Expr
        One of the coordinate symbols passed into the equation callable.
    """
    if not isinstance(x, Expr) or x.leaf_index is None:
        raise TypeError(
            "D(y, x): `x` must be one of the coordinate symbols passed into "
            "the equation callable (got {!r}). Differentiation is only defined "
            "w.r.t. the sampled coordinates/parameters.".format(type(x))
        )
    if not isinstance(y, Expr):
        raise TypeError(
            "D(y, x): `y` must be a differentiable expression built from the "
            "equation's field `f` and coordinate symbols (got {!r}). A raw "
            "array has lost its dependence on the coordinates — use the "
            "symbolic math functions from `pydens_tpu` (sin, cos, exp, ...) "
            "or `pydens_tpu.lift` to keep subexpressions "
            "differentiable.".format(type(y))
        )

    k = x.leaf_index
    fn = y.fn
    ctx = y.ctx

    def dfn(ls):
        ls = list(ls)
        tangents = [jnp.zeros_like(l) for l in ls]
        tangents[k] = jnp.ones_like(ls[k])
        return jax.jvp(fn, (ls,), (tangents,))[1]

    # Derivative planning: track pure field taps (the field or one of its
    # derivatives, differentiated directly).  Plannable multi-indices are
    # order <= PLAN_MAX_ORDER (pure AND mixed — Laplacians, heat/wave,
    # KdV/dispersion, biharmonic/plate bending, and beyond); deeper
    # nesting — and any D applied to a composite expression — voids the
    # plan for this context (the nested-jvp closure above remains the
    # universal fallback).
    deriv = None
    if y.deriv is not None:
        candidate = tuple(sorted(y.deriv + (k,)))
        if len(candidate) <= PLAN_MAX_ORDER:
            deriv = candidate
            ctx.derivs.add(candidate)
        else:
            ctx.plan_ok = False
    else:
        ctx.plan_ok = False

    return Expr(dfn, ctx, deriv=deriv, post=y.post if deriv else None)


# ---------------------------------------------------------------------------
# V token
# ---------------------------------------------------------------------------

_VAR_SCOPES = []  # stack of (mode, store)


@contextlib.contextmanager
def variable_scope(mode, store):
    """Scope under which ``V`` resolves.

    ``mode='create'``: first use of a name registers its initial value in
    ``store`` (a plain dict) — this is the rebuild's analogue of the
    reference's fake run (``model_torch.py:319-325``).
    ``mode='read'``: names resolve to the (traced) arrays in ``store``; unknown
    names are an error.
    """
    if mode not in ("create", "read"):
        raise ValueError(f"unknown variable scope mode {mode!r}")
    _VAR_SCOPES.append((mode, store))
    try:
        yield store
    finally:
        _VAR_SCOPES.pop()


def _to_initial_value(data):
    """Convert user-supplied initial data (number, list, np array, torch
    tensor) to a float32 numpy array."""
    if hasattr(data, "detach"):  # torch tensor — migration convenience
        data = data.detach().cpu().numpy()
    return np.asarray(data, dtype=np.float32)


def V(name, *args, **kwargs):
    """Trainable-variable token.

    Mirrors the reference (``model_torch.py:180-188``): on first use (during
    the Solver's init-time discovery run) creates the variable from the given
    initial data; afterwards returns the current (traced) value from the
    parameter pytree, so the optimizer trains it.

    Accepted signatures (all reference spellings):
    ``V('a', data=jnp.array([3.0]))``, ``V('a', 3.0)``,
    ``V('a', data=torch.Tensor([3.0]), requires_grad=True)``.
    """
    if not _VAR_SCOPES:
        raise RuntimeError(
            "V token used outside of a Solver context. V only works inside "
            "equation/constraint/initial-condition callables evaluated by a "
            "Solver."
        )
    mode, store = _VAR_SCOPES[-1]
    if mode == "create":
        if name not in store:
            data = kwargs.get("data", args[0] if args else None)
            if data is None:
                raise ValueError(
                    f"V({name!r}): an initial value is required on first use, "
                    "e.g. V({!r}, data=jnp.array([1.0]))".format(name)
                )
            store[name] = _to_initial_value(data)
        return jnp.asarray(store[name])
    # read
    if name not in store:
        raise KeyError(
            f"V({name!r}): variable was not created during Solver "
            "initialization. Variables must be reachable from the equation, "
            "constraints or initial condition at Solver construction time."
        )
    return store[name]
