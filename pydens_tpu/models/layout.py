"""Layout-string network builder — the TPU-native equivalent of batchflow's
``Block`` (consumed by the reference at
``/root/reference/pydens/model_torch.py:12,164-168``).

Grammar (observed at ``model_torch.py:142-156`` and ``README.md:42-46``):

* ``f`` — fully connected (dense) layer
* ``c`` — convolutional layer; on ``(N, D)`` point clouds this degenerates to
  a dense (1x1) layer, which is how it is implemented here
* ``a`` — activation
* ``R`` — start of a skip connection (push current tensor)
* ``+`` — end of a skip connection via sum (pop and add)
* spaces are cosmetic

``features`` (or the ``units`` spelling, ``README.md:41-42``) gives the output
width of each dense layer in order; ``activation`` is a string name, a
callable, a class (resolved by name), or a sequence thereof matched to the
``a`` slots in order.

The builder is purely functional: ``init(key, in_dim) -> params`` (a dict of
``fc{i}`` layers, 1-based to match the reference's ``freeze_layers(['fc1',
...])`` usage in ``README.md:126``) and ``apply(params, x) -> y``.  Dense
matmuls run at ``Precision.HIGHEST`` — PINN residuals take second derivatives
through the network, and TPU's default bf16 matmul passes are too coarse for
that; these MLPs are tiny, so full-precision passes are free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["parse_layout", "make_layout_network", "ACTIVATIONS",
           "resolve_activation"]

ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leakyrelu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "celu": jax.nn.celu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "mish": jax.nn.mish,
    "hardtanh": jax.nn.hard_tanh,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}

_VALID_TOKENS = frozenset("fac R +".replace(" ", "") + "R+")


def resolve_activation(act):
    """Resolve an activation spec (str, callable, or class) to a jnp callable."""
    if isinstance(act, str):
        key = act.lower().replace("_", "")
        if key not in ACTIVATIONS:
            raise ValueError(
                f"unknown activation {act!r}; known: {sorted(ACTIVATIONS)} "
                "or pass any jnp-compatible callable"
            )
        return ACTIVATIONS[key]
    if isinstance(act, type):
        # e.g. a torch nn.Sigmoid class from migrated code — resolve by name.
        key = act.__name__.lower().replace("_", "")
        if key in ACTIVATIONS:
            return ACTIVATIONS[key]
        raise ValueError(
            f"cannot resolve activation class {act!r}; pass a jnp-compatible "
            "callable or a known name"
        )
    if callable(act):
        name = getattr(act, "__name__", "").lower()
        # torch.sin etc. resolve by name to the jnp twin; jnp callables pass.
        mod = getattr(act, "__module__", "") or ""
        if mod.startswith("torch") and name in ACTIVATIONS:
            return ACTIVATIONS[name]
        return act
    raise ValueError(f"cannot interpret activation spec {act!r}")


def parse_layout(layout):
    """Parse a layout string into a token list; validates characters."""
    tokens = [ch for ch in layout if ch != " "]
    for ch in tokens:
        if ch not in ("f", "c", "a", "R", "+"):
            raise ValueError(
                f"unknown layout token {ch!r} in layout {layout!r}; "
                "supported tokens: 'f' (dense), 'c' (conv, dense on point "
                "clouds), 'a' (activation), 'R' (skip start), '+' (skip sum)"
            )
    # Validate skip balance.
    depth = 0
    for ch in tokens:
        if ch == "R":
            depth += 1
        elif ch == "+":
            depth -= 1
            if depth < 0:
                raise ValueError(f"layout {layout!r}: '+' with no matching 'R'")
    if depth != 0:
        raise ValueError(f"layout {layout!r}: unmatched 'R' skip start")
    return tokens


def make_layout_network(layout, features, activation, in_dim,
                        dtype=jnp.float32):
    """Build ``(init, apply, layer_names)`` for a layout-string network.

    Parameters
    ----------
    layout : str
        Layout string, e.g. ``'fa fa fa f'`` or ``'faR fa fa+ f'``.
    features : sequence of int
        Output width per dense ('f'/'c') layer, in order.
    activation : str | callable | class | sequence
        Activation spec; a sequence is matched to 'a' slots in order.
    in_dim : int
        Input feature dimension (``ndims + nparams``).
    """
    tokens = parse_layout(layout)
    n_dense = sum(1 for t in tokens if t in ("f", "c"))
    n_act = sum(1 for t in tokens if t == "a")
    features = list(features)
    if len(features) != n_dense:
        raise ValueError(
            f"layout {layout!r} has {n_dense} dense layers but "
            f"features/units has {len(features)} entries"
        )

    if isinstance(activation, (list, tuple)):
        if len(activation) == n_act:
            acts = [resolve_activation(a) for a in activation]
        elif len(activation) == 1:
            acts = [resolve_activation(activation[0])] * n_act
        else:
            raise ValueError(
                f"layout {layout!r} has {n_act} activation slots but "
                f"activation sequence has {len(activation)} entries"
            )
    else:
        acts = [resolve_activation(activation)] * n_act

    layer_names = [f"fc{i + 1}" for i in range(n_dense)]

    # Infer per-layer input dims by a symbolic pass over the tokens.
    in_dims = []
    dims_stack = []
    cur = in_dim
    di = 0
    for tok in tokens:
        if tok in ("f", "c"):
            in_dims.append(cur)
            cur = features[di]
            di += 1
        elif tok == "R":
            dims_stack.append(cur)
        elif tok == "+":
            skip = dims_stack.pop()
            if skip != cur:
                raise ValueError(
                    f"layout {layout!r}: skip connection joins width {skip} "
                    f"with width {cur}; sum-skips require equal widths"
                )

    def init(key):
        """Initialize parameters: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
        weights and biases (the torch.nn.Linear default, for convergence
        parity with the reference)."""
        params = {}
        keys = jax.random.split(key, n_dense)
        for i, (name, fan_in, fan_out) in enumerate(
                zip(layer_names, in_dims, features)):
            wkey, bkey = jax.random.split(keys[i])
            bound = 1.0 / np.sqrt(fan_in)
            params[name] = {
                "w": jax.random.uniform(
                    wkey, (fan_in, fan_out), dtype, -bound, bound),
                "b": jax.random.uniform(
                    bkey, (fan_out,), dtype, -bound, bound),
            }
        return params

    def apply(params, x):
        """Apply the network to a ``(N, in_dim)`` batch of points."""
        h = x
        stack = []
        di_, ai_ = 0, 0
        for tok in tokens:
            if tok in ("f", "c"):
                layer = params[layer_names[di_]]
                h = jnp.dot(h, layer["w"],
                            precision=jax.lax.Precision.HIGHEST) + layer["b"]
                di_ += 1
            elif tok == "a":
                h = acts[ai_](h)
                ai_ += 1
            elif tok == "R":
                stack.append(h)
            elif tok == "+":
                h = h + stack.pop()
        return h

    # Expose the resolved structure for the fused Pallas inference kernel
    # (ops/pallas_mlp.py) without changing the 3-tuple return contract.
    apply.tokens = tokens
    apply.activations = acts
    apply.layer_names = layer_names

    return init, apply, layer_names
