"""Optimizer registry: torch.optim names -> optax transforms.

The reference resolves ``optimizer`` by name from ``torch.optim``
(``model_torch.py:419-422``) with ``lr`` plus ctor kwargs.  This module maps
the common names (and their torch-style kwargs: ``betas``, ``eps``,
``momentum``, ``weight_decay``, ...) onto optax.
"""

import optax

__all__ = ["resolve_optimizer", "LMConfig"]


class LMConfig:
    """Matrix-free Levenberg–Marquardt (damped Gauss–Newton) configuration.

    Not an optax transform: LM needs the *residual vector* function, not a
    scalar loss/grad, so the Solver routes it through a dedicated update
    inside the compiled training loop (solver.py).  Per step it solves

        (JᵀJ + λI) d = Jᵀr,     θ ← θ − d  if ‖r(θ−d)‖² < ‖r(θ)‖²

    by matrix-free conjugate gradients (J·v and Jᵀ·u are one ``jax.jvp`` /
    transpose each — no Jacobian is ever materialized), with Nielsen's
    gain-ratio damping schedule: on accept λ shrinks by
    ``max(damping_down, 1-(2ρ-1)³)`` where ρ = actual/predicted decrease,
    on reject λ grows by a ν that doubles per consecutive reject (reset to
    ``damping_up`` on accept).  Since ``loss == ‖r‖²`` exactly (MSE
    criterion), a step is accepted iff it reduces the training loss, so the
    iteration can stall but never diverge.  The standard high-precision
    finishing phase for PINN least squares — typically reaches losses
    orders of magnitude below first-order methods (see BENCHMARKS.md
    "Gauss-Newton / Levenberg-Marquardt").
    """

    def __init__(self, cg_iters=50, cg_tol=1e-6, init_damping=1e-3,
                 damping_down=1.0 / 3.0, damping_up=2.0,
                 min_damping=1e-12, max_damping=1e12):
        if int(cg_iters) < 1:
            raise ValueError("cg_iters must be a positive int")
        if not (0 < damping_down < 1 < damping_up):
            raise ValueError("need 0 < damping_down < 1 < damping_up")
        self.cg_iters = int(cg_iters)
        self.cg_tol = float(cg_tol)
        self.init_damping = float(init_damping)
        self.damping_down = float(damping_down)
        self.damping_up = float(damping_up)
        self.min_damping = float(min_damping)
        self.max_damping = float(max_damping)


def _adam_family(factory):
    def build(lr, kwargs):
        b1, b2 = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        extra = {}
        if "weight_decay" in kwargs:
            extra["weight_decay"] = kwargs.pop("weight_decay")
        _warn_unused(kwargs)
        return factory(learning_rate=lr, b1=b1, b2=b2, eps=eps, **extra)
    return build


def _sgd(lr, kwargs):
    momentum = kwargs.pop("momentum", 0.0) or None
    nesterov = kwargs.pop("nesterov", False)
    _warn_unused(kwargs)
    return optax.sgd(learning_rate=lr, momentum=momentum, nesterov=nesterov)


def _rmsprop(lr, kwargs):
    alpha = kwargs.pop("alpha", 0.99)
    eps = kwargs.pop("eps", 1e-8)
    momentum = kwargs.pop("momentum", 0.0)
    centered = kwargs.pop("centered", False)
    _warn_unused(kwargs)
    return optax.rmsprop(learning_rate=lr, decay=alpha, eps=eps,
                         momentum=momentum, centered=centered)


def _adagrad(lr, kwargs):
    eps = kwargs.pop("eps", 1e-10)
    _warn_unused(kwargs)
    return optax.adagrad(learning_rate=lr, eps=eps)


def _adadelta(lr, kwargs):
    rho = kwargs.pop("rho", 0.9)
    eps = kwargs.pop("eps", 1e-6)
    _warn_unused(kwargs)
    return optax.adadelta(learning_rate=lr, rho=rho, eps=eps)


def _lion(lr, kwargs):
    b1, b2 = kwargs.pop("betas", (0.9, 0.99))
    _warn_unused(kwargs)
    return optax.lion(learning_rate=lr, b1=b1, b2=b2)


def _warn_unused(kwargs):
    if kwargs:
        import warnings
        warnings.warn(f"ignoring unsupported optimizer kwargs: "
                      f"{sorted(kwargs)}", stacklevel=3)


def _lbfgs(lr, kwargs):
    memory_size = kwargs.pop("memory_size", kwargs.pop("history_size", 10))
    _warn_unused(kwargs)
    # learning_rate=None lets the zoom linesearch pick the step size — the
    # standard full-batch L-BFGS finishing phase for PINNs.  A user-set lr
    # (anything but fit's 0.005 default) would be silently discarded, so
    # say so.
    if lr is not None and lr != 0.005:
        import warnings
        warnings.warn(
            "optimizer='LBFGS' picks its step size with a zoom linesearch; "
            "the lr argument is ignored", stacklevel=4)
    return optax.lbfgs(learning_rate=None, memory_size=memory_size)


def _lm(lr, kwargs):
    if lr is not None and lr != 0.005:
        import warnings
        warnings.warn(
            "optimizer='LM' (Gauss-Newton) solves for its own step from the "
            "damped normal equations; the lr argument is ignored",
            stacklevel=4)
    return LMConfig(**kwargs)


_OPTIMIZERS = {
    "adam": lambda lr, kw: _adam_family(optax.adam)(lr, kw),
    "adamw": lambda lr, kw: _adam_family(optax.adamw)(lr, kw),
    "adamax": lambda lr, kw: _adam_family(optax.adamax)(lr, kw),
    "nadam": lambda lr, kw: _adam_family(optax.nadam)(lr, kw),
    "radam": lambda lr, kw: _adam_family(optax.radam)(lr, kw),
    "sgd": _sgd,
    "rmsprop": _rmsprop,
    "adagrad": _adagrad,
    "adadelta": _adadelta,
    "lion": _lion,
    "lbfgs": _lbfgs,
    "lm": _lm,
    "gn": _lm,
    "gaussnewton": _lm,
    "gauss_newton": _lm,
    "gauss-newton": _lm,
    "levenbergmarquardt": _lm,
    "levenberg_marquardt": _lm,
    "levenberg-marquardt": _lm,
}

# Optimizers whose optax update() needs (value, grad, value_fn) — i.e. they
# run a linesearch and must be able to re-evaluate the loss.
_NEEDS_VALUE_FN = {"lbfgs"}


def resolve_optimizer(name, lr, kwargs):
    """Build an optax GradientTransformation from a torch-style optimizer
    name.  Returns ``(transform, needs_value_fn)``.

    Also accepts a ready optax ``GradientTransformation`` (passed through) or
    any callable ``f(learning_rate=...) -> GradientTransformation``.
    """
    if isinstance(name, LMConfig):
        return name, False
    if isinstance(name, optax.GradientTransformation):
        # ExtraArgs transforms (optax.lbfgs() and friends) need
        # value/grad/value_fn at update time — route them through the
        # linesearch path; their update ignores unused extra args, so the
        # broad test is safe.
        return name, isinstance(name, optax.GradientTransformationExtraArgs)
    if callable(name) and not isinstance(name, str):
        built = name(learning_rate=lr, **kwargs)
        return built, isinstance(built, optax.GradientTransformationExtraArgs)
    key = str(name).lower()
    if key not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; "
                         f"known: {sorted(_OPTIMIZERS)}")
    return _OPTIMIZERS[key](lr, dict(kwargs)), key in _NEEDS_VALUE_FN
