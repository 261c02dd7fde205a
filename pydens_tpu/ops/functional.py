"""Vector-calculus convenience operators built on the ``D`` token.

The reference exposes only raw ``D`` (``model_torch.py:174-178``); residuals
like Laplacians are written as nested calls.  These helpers make the common
operators one-liners while compiling to exactly the same forward-mode taps:

    def pde(f, x, y):
        return laplace(f, x, y) - 5 * pdt.sin(np.pi * (x + y))
"""

from .tokens import D, Expr

__all__ = ["grad", "div", "laplace", "hessian_diag", "dt", "dn"]


def grad(f, *coords):
    """Tuple of first partials ``(D(f, x1), ..., D(f, xn))``."""
    return tuple(D(f, x) for x in coords)


def div(fs, *coords):
    """Divergence of a tuple of expressions: ``sum_k D(fs[k], x_k)``."""
    if len(fs) != len(coords):
        raise ValueError(f"divergence needs one component per coordinate, "
                         f"got {len(fs)} components and {len(coords)} coords")
    out = D(fs[0], coords[0])
    for fk, xk in zip(fs[1:], coords[1:]):
        out = out + D(fk, xk)
    return out


def laplace(f, *coords):
    """Laplacian ``sum_k d2f/dx_k2`` over the given coordinates."""
    out = D(D(f, coords[0]), coords[0])
    for x in coords[1:]:
        out = out + D(D(f, x), x)
    return out


def hessian_diag(f, *coords):
    """Tuple of pure second partials ``d2f/dx_k2``."""
    return tuple(D(D(f, x), x) for x in coords)


def dt(f, t):
    """First time derivative (alias of ``D`` for readability)."""
    return D(f, t)


def dn(f, x, order):
    """n-th derivative of ``f`` w.r.t. one coordinate."""
    out = f
    for _ in range(order):
        out = D(out, x)
    return out
