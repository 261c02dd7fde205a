"""Adapter: use any Flax linen module as the network body of a PINN model.

The reference's custom-architecture path is subclassing ``TorchModel`` with
``torch.nn`` layers (examples notebook cell 5).  The JAX-ecosystem analogue
is bringing a Flax module; this adapter wraps it behind the :class:`Model`
interface (ansatz, freeze/unfreeze, Solver integration) without any change
to the training machinery:

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.tanh(nn.Dense(32)(x))
            return nn.Dense(1)(x)

    solver = Solver(pde, ndims=2, boundary_condition=0,
                    model=flax_model(Net()))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model

__all__ = ["FlaxModel", "flax_model"]


class FlaxModel(Model):
    """A :class:`Model` whose network body is a Flax linen module.

    The module must map ``(N, ndims+nparams) -> (N, n_out)``.  Its parameter
    pytree lives under ``params['net']``; top-level entries of the module's
    params (usually layer names like ``Dense_0``) are addressable by
    ``freeze_trainable(layers=[...])``.
    """

    def __init__(self, module, **kwargs):
        super().__init__(**kwargs)
        self.module = module

    def network_init(self, key):
        variables = self.module.init(
            key, jnp.zeros((1, self.total), self.dtype))
        if set(variables) - {"params"}:
            raise ValueError(
                "Flax modules with non-parameter collections (batch stats, "
                f"etc.) are not supported; got {sorted(set(variables))}")
        return variables["params"]

    def network_apply(self, net_params, xs):
        return self.module.apply({"params": net_params}, xs)


def flax_model(module):
    """Build a ``Solver``-compatible model class from a Flax module
    instance (the ``model=`` argument expects a class)."""

    class _Bound(FlaxModel):
        def __init__(self, **kwargs):
            super().__init__(module=module, **kwargs)

    _Bound.__name__ = f"FlaxModel({type(module).__name__})"
    return _Bound
