"""Compute-path ops: tokens (D/V), symbolic math, derivative helpers."""

from .tokens import Expr, D, V, variable_scope, as_array, lift, EvalContext
from .functional import grad, div, laplace, hessian_diag, dt, dn
from . import math

__all__ = ["Expr", "D", "V", "variable_scope", "as_array", "lift",
           "EvalContext", "math", "grad", "div", "laplace", "hessian_diag",
           "dt", "dn"]
