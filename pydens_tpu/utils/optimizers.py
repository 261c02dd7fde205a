"""Optimizer registry: torch.optim names -> optax transforms.

The reference resolves ``optimizer`` by name from ``torch.optim``
(``model_torch.py:419-422``) with ``lr`` plus ctor kwargs.  This module maps
the common names (and their torch-style kwargs: ``betas``, ``eps``,
``momentum``, ``weight_decay``, ...) onto optax.
"""

import optax

__all__ = ["resolve_optimizer"]


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
