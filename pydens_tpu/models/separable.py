"""Separable PINN model (SPINN, Cho et al. 2023-style factorization).

No reference counterpart (`/root/reference` trains pointwise MLPs only) —
this is the TPU-first scaling architecture for low-dimensional PDEs on
tensor-product domains: one small MLP PER INPUT AXIS maps its coordinate to
``rank * n_out`` features, and the solution on the full collocation grid is
the rank-contracted outer product

    u(x_1, ..., x_d)[o] = sum_r  prod_i  h_i(x_i)[r, o].

Training on an ``N^d``-point grid therefore costs ``d`` MLP evaluations of
``N`` rows each plus one einsum — ``O(N d)`` network work for ``N^d``
collocation points, vs ``O(N^d)`` for a pointwise model.  The einsum is a
chain of matmul contractions (MXU work), and every derivative the equation
takes rides the same factorization: a ``D(f, x_i)`` tap is a ``jax.jvp``
with tangent 1 on axis ``i``'s leaf, which differentiates ONLY the i-th
axis MLP (each grid point depends on exactly one row of each axis input,
so the batch-diagonal trick of `ops/tokens.py` carries over unchanged).

The same parameters evaluate POINTWISE too (``prod_i`` over per-point axis
features) — `predict`, `model(xs)`, `residual`, export and checkpointing
all work unchanged through the pointwise path.

Scope (v1): chain layouts (`'f'`/`'a'` tokens), multi-harmonic `periodic`
embedding (applied per axis), constant/callable boundary and initial
conditions, `initial_condition_t`, `nparams` (parameter columns become
extra grid axes — a parametric family trains on a parameter GRID).  Not
supported: `fourier_features` (use `periodic={dim: m}` — per-axis random
features measured no better than harmonics), `arch='modified'`, the
Taylor-plan fast path (derivatives ride per-axis jvp, already cheap).
"""

from __future__ import annotations

import string

import numpy as np
import jax
import jax.numpy as jnp

from .base import Model
from .layout import make_layout_network

__all__ = ["SeparableModel"]


class SeparableModel(Model):
    """Per-axis factorized model: ``sum_r prod_i h_i(x_i)[r, o]``.

    Parameters mirror :class:`ConvBlockModel` where they make sense:
    ``layout``/``features``/``activation`` describe EACH axis MLP (the last
    ``features`` entry is the factorization rank ``r``); ``n_out`` is the
    number of solution components (axis nets emit ``r * n_out`` features).
    """

    separable = True

    def __init__(self, ndims, initial_condition=None, boundary_condition=None,
                 domain=(0, 1), nparams=0, layout="fa fa f",
                 features=(32, 32, 32), activation="Tanh", units=None,
                 n_out=1, dtype=jnp.float32, periodic=None,
                 periodic_ic_decay=None, adaptive_activation=None, **kwargs):
        if "fourier_features" in kwargs:
            raise ValueError(
                "SeparableModel does not support fourier_features= — use "
                "periodic={dim: m} multi-harmonic embeddings (per-axis, "
                "separability-preserving) instead")
        if "arch" in kwargs:
            raise ValueError("SeparableModel builds per-axis chain MLPs; "
                             "arch= does not apply")
        if "branches" in kwargs or any(t in ("B", ".") for t in layout):
            # The factorization widens the LAST dense layer to rank*n_out;
            # a branch/concat join after it would silently break that
            # bookkeeping.  Width-preserving tokens (R/+/*/n) are fine.
            raise ValueError(
                "SeparableModel's per-axis factor nets are chain MLPs — "
                "'B' branch / '.' concat tokens and branches= do not apply "
                "(the factorization rank is the last features entry); "
                "multi-component solutions use n_out=")
        super().__init__(ndims=ndims, initial_condition=initial_condition,
                         boundary_condition=boundary_condition, domain=domain,
                         nparams=nparams, dtype=dtype, **kwargs)
        if periodic_ic_decay is not None:
            self._ic_decay = bool(periodic_ic_decay)
        if units is not None:
            features = units
        features = list(features)
        self.layout = layout
        self.features = features
        self.activation = activation
        self.n_out = int(n_out)
        self.rank = int(features[-1])
        if self.rank < 1 or self.n_out < 1:
            raise ValueError("need rank (last features entry) >= 1 and "
                             "n_out >= 1")
        if self.total > 24:
            raise ValueError("SeparableModel supports at most 24 input axes")

        if periodic is True:
            periodic = tuple(range(self.ndims_spatial))
        if isinstance(periodic, dict):
            self.periodic_harmonics = {int(d): int(m)
                                       for d, m in periodic.items()}
            periodic = tuple(self.periodic_harmonics)
        else:
            self.periodic_harmonics = {int(d): 1 for d in (periodic or ())}
        self.periodic_dims = tuple(sorted(periodic)) if periodic else ()
        for d, m in self.periodic_harmonics.items():
            if m < 1:
                raise ValueError(f"periodic dim {d} needs >= 1 harmonic")
        for d in self.periodic_dims:
            if d < 0 or d >= self.ndims_spatial:
                raise ValueError(
                    f"periodic dim {d} is not a spatial dimension "
                    f"(0 <= dim < ndims_spatial={self.ndims_spatial})")
        if (boundary_condition is not None and self.periodic_dims
                and len(self.periodic_dims) == self.ndims_spatial):
            raise ValueError(
                "boundary_condition has no effect when every spatial "
                "dimension is periodic — drop one of the two")
        if periodic_ic_decay and not (self.periodic_dims
                                      and self.initial_condition is not None):
            raise ValueError(
                "periodic_ic_decay=True needs periodic= dims and an "
                "initial_condition")

        # One (init, apply) pair per input axis; the output layer is
        # widened to rank * n_out and reshaped at combine time.
        out_features = features[:-1] + [self.rank * self.n_out]
        self._axis_nets = []
        for i in range(self.total):
            in_dim = (2 * self.periodic_harmonics[i]
                      if i in self.periodic_dims else 1)
            init, apply, _names = make_layout_network(
                layout, out_features, activation, in_dim=in_dim, dtype=dtype,
                adaptive_activation=adaptive_activation)
            self._axis_nets.append((init, apply))
        if (adaptive_activation is not None
                and not self._axis_nets[0][1].adaptive):
            raise ValueError(
                f"adaptive_activation= needs at least one 'a' slot in the "
                f"per-axis layout {layout!r} to attach a trainable slope "
                "to — it would be a silent no-op")
        self.network_apply_taylor = None  # derivatives ride per-axis jvp

    # -- per-axis input embedding -------------------------------------------
    def _embed_axis(self, i, x):
        """Axis input features: raw coordinate, or the exact-periodicity
        sin/cos harmonics for a periodic spatial dim (same embedding as
        ConvBlockModel._embed, restricted to one column)."""
        if i not in self.periodic_dims:
            return x
        lo, hi = self.domain[i]
        w = 2.0 * np.pi / (float(hi) - float(lo))
        phase = w * (x - float(lo))
        cols = []
        for k in range(1, self.periodic_harmonics[i] + 1):
            cols.append(jnp.sin(float(k) * phase))
            cols.append(jnp.cos(float(k) * phase))
        return jnp.concatenate(cols, axis=1)

    # -- network body --------------------------------------------------------
    def network_init(self, key):
        keys = jax.random.split(key, self.total)
        return {f"axis{i}": self._axis_nets[i][0](keys[i])
                for i in range(self.total)}

    def _axis_features(self, net_params, i, x):
        """(N_i, rank, n_out) features of axis ``i`` at column ``x``."""
        h = self._axis_nets[i][1](net_params[f"axis{i}"],
                                  self._embed_axis(i, x))
        return h.reshape(h.shape[0], self.rank, self.n_out)

    def network_apply(self, net_params, xs):
        """Pointwise forward on a stacked ``(N, total)`` batch: per-point
        product over axis features — same parameters, O(N) cost; used by
        predict/model(xs)/residual diagnostics."""
        out = None
        for i in range(self.total):
            h = self._axis_features(net_params, i, xs[:, i:i + 1])
            out = h if out is None else out * h
        return jnp.sum(out, axis=1)

    def network_apply_grid(self, net_params, leaves):
        """Grid forward: each leaf is axis ``i``'s sample broadcast-shaped
        ``(1, .., N_i, .., 1, 1)``; returns the ``(N_1, .., N_d, n_out)``
        solution on the tensor-product grid via one rank-contracted
        einsum (a chain of MXU matmul contractions under XLA)."""
        hs = [self._axis_features(net_params, i, leaf.reshape(-1, 1))
              for i, leaf in enumerate(leaves)]
        letters = string.ascii_lowercase[:len(hs)]  # a..x; z=rank, y=out
        sub = (",".join(f"{c}zy" for c in letters)
               + "->" + "".join(letters) + "y")
        return jnp.einsum(sub, *hs)

    # -- grid-path full forward ----------------------------------------------
    def apply_leaves(self, params, leaves):
        """Equation-path forward.  2-D leaves (the Solver's discovery run
        and pointwise diagnostics) take the stacked pointwise path;
        broadcast-shaped grid leaves take the factorized path + the
        grid ansatz."""
        if leaves[0].ndim == 2:
            return self.apply(params, jnp.concatenate(leaves, axis=1))
        u = self.network_apply_grid(params["net"], leaves)
        return self.anzatc_grid(u, leaves, params)

    def anzatc_grid(self, u, leaves, params):
        """Grid-shaped ansatz — the same condition-binding math as
        ``Model.anzatc`` (model_torch.py:107-128 port) expressed on
        broadcast-shaped axis leaves instead of stacked columns; every
        factor broadcasts against the ``(N_1..N_d, n_out)`` grid.  KEEP IN
        SYNC with Model.anzatc (tests/test_separable.py asserts pointwise
        == grid on the full forward, which pins the two together).

        Conditions must return arrays broadcastable against the grid:
        scalars, per-component ``(1, n_out)`` constants, and elementwise
        callables of the axis leaves all are.
        """
        nds = self.ndims_spatial
        t = leaves[self.ndims - 1]
        lower = [float(lims[0]) for lims in self.domain]
        upper = [float(lims[1]) for lims in self.domain]
        t0 = lower[-1]

        if self.boundary_condition is not None:
            shape_fn = jnp.ones_like(u)
            for i in range(nds):
                if i in self.periodic_dims:
                    continue
                xi = leaves[i]
                lo_i, hi_i = lower[i], upper[i]
                inv_span2 = 1.0 / ((hi_i - lo_i) * (hi_i - lo_i))
                shape_fn = shape_fn * ((xi - lo_i) * (hi_i - xi) * inv_span2)
            if callable(self.boundary_condition):
                bc = jnp.asarray(
                    self.boundary_condition(*[leaves[i] for i in range(nds)]),
                    self.dtype)
            else:
                bc = self.boundary_condition
            u = u * shape_fn + bc

        if self.initial_condition is not None:
            cols = [leaves[i] for i in range(nds)]
            ic = jnp.asarray(self.initial_condition(*cols), self.dtype)
            gate = (jax.nn.sigmoid((t - t0) / jnp.exp(params["log_scale"]))
                    - 0.5)
            ic_decay = 1.0
            if self.periodic_dims and self._ic_decay_engaged():
                t_lo, t_hi = self.domain[self.ndims - 1]
                tau = (t - t0) / (0.25 * (float(t_hi) - float(t_lo)))
                ic_decay = 2.0 - 2.0 * jax.nn.sigmoid(tau * tau)
            if self.initial_condition_t is None:
                u = gate * u + ic * ic_decay
            else:
                ic_t = jnp.asarray(self.initial_condition_t(*cols),
                                   self.dtype)
                u = gate * gate * u + (ic + (t - t0) * ic_t) * ic_decay
        return u
