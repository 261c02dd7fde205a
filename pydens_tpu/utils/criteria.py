"""Loss criteria registry.

The reference accepts any ``torch.nn`` criterion instance
(``model_torch.py:364-365,396-410``, default ``nn.MSELoss()``).  Here a
criterion is any jnp-compatible ``fn(pred, target) -> scalar``; string names
and torch criterion *instances* (matched by class name, for migration) resolve
through this registry.
"""

import jax.numpy as jnp

__all__ = ["resolve_criterion", "mse_loss", "l1_loss", "huber_loss"]


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def huber_loss(pred, target, delta=1.0):
    err = jnp.abs(pred - target)
    quad = jnp.minimum(err, delta)
    return jnp.mean(0.5 * quad ** 2 + delta * (err - quad))


def smooth_l1_loss(pred, target, beta=1.0):
    err = jnp.abs(pred - target)
    return jnp.mean(jnp.where(err < beta, 0.5 * err ** 2 / beta,
                              err - 0.5 * beta))


_CRITERIA = {
    "mseloss": mse_loss,
    "mse": mse_loss,
    "l1loss": l1_loss,
    "l1": l1_loss,
    "mae": l1_loss,
    "huberloss": huber_loss,
    "huber": huber_loss,
    "smoothl1loss": smooth_l1_loss,
    "smoothl1": smooth_l1_loss,
}


def resolve_criterion(criterion):
    """Resolve a criterion spec (str | torch criterion instance | callable)
    to a jnp callable and a cache key."""
    if isinstance(criterion, str):
        key = criterion.lower().replace("_", "")
        if key not in _CRITERIA:
            raise ValueError(f"unknown criterion {criterion!r}; "
                             f"known: {sorted(set(_CRITERIA))}")
        return _CRITERIA[key], key
    cls_name = type(criterion).__name__.lower()
    mod = type(criterion).__module__ or ""
    if mod.startswith("torch") and cls_name in _CRITERIA:
        # torch.nn.MSELoss() etc. from migrated code
        return _CRITERIA[cls_name], cls_name
    if callable(criterion):
        return criterion, id(criterion)
    raise ValueError(f"cannot interpret criterion {criterion!r}")
