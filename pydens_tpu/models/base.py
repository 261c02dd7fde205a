"""Model base class and the default layout-built model.

TPU-native re-design of ``TorchModel``/``ConvBlockModel``
(``/root/reference/pydens/model_torch.py:17-172``): the model object is a
*configuration + pure-function bundle*.  Parameters live in a pytree

``{'net': {'fc1': {'w','b'}, ...}, 'log_scale': scalar,
   'variables': {name: array, ...}}``

owned by the model instance (``model.params``) and threaded functionally
through jitted train/predict steps by the Solver.  The ansatz transform that
binds boundary/initial conditions by construction is reproduced exactly from
``model_torch.py:107-128``, including the trainable ``log_scale`` sharpness of
the sigmoid time-gate (``:50,126``).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .layout import make_layout_network
from ..ops.tokens import variable_scope

__all__ = ["Model", "ConvBlockModel", "TorchModel", "pad_to_bucket"]

# Inference inputs pad up to the next power-of-two row count (floor 1024)
# before hitting a jitted entry: XLA compiles per concrete shape, and on a
# real TPU each fresh compile costs tens of seconds — a user sweeping grid
# sizes (predict on 33 points after plotting at 100) must not pay one per
# distinct N.  log2-many buckets cover any sweep; the floor makes every
# small-N evaluation share ONE executable.  A 1024-row forward of a PINN
# MLP is microseconds on the MXU, so the padded FLOPs are free.
_MIN_BUCKET = 1024


def pad_to_bucket(xs):
    """Pad ``xs`` rows to the shape bucket by repeating the last row
    (domain-valid filler — safe under any ansatz/log).  Returns
    ``(padded, n)`` with ``n`` the true row count; slice the jitted
    output back with ``out[..., :n, :]``."""
    n = int(xs.shape[0])
    if n == 0:
        return xs, 0
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    if b == n:
        return xs, n
    lib = np if isinstance(xs, np.ndarray) else jnp
    filler = lib.broadcast_to(xs[-1:], (b - n,) + tuple(xs.shape[1:]))
    return lib.concatenate([xs, filler], axis=0), n


def _normalize_domain(domain, ndims):
    """Parse the ``domain`` argument exactly like the reference
    (``model_torch.py:37-46``): a ``(lo, hi)`` pair is tiled over all dims; a
    per-dim sequence of pairs passes through."""
    if isinstance(domain, (tuple, list)):
        if len(domain) > 0 and isinstance(domain[0], (float, int)):
            domain = [tuple(domain)] * ndims
        elif len(domain) > 0 and isinstance(domain[0], (tuple, list)):
            domain = [tuple(d) for d in domain]
        else:
            raise ValueError(
                "domain should be either 1d or 2d-sequence of float/ints.")
    else:
        raise ValueError(
            "domain should be either 1d or 2d-sequence of float/ints.")
    if len(domain) != ndims:
        raise ValueError(
            f"domain has {len(domain)} (lo, hi) pairs but ndims={ndims}")
    return domain


def _normalize_ic_shape(ic, n_points, n_out):
    """Normalize an initial-condition value to broadcast against the
    ``(n_points, n_out)`` network output.

    Accepted: scalar; ``(n_points,)`` per-point values (reference semantics
    — wins the ``n_points == n_out`` ambiguity); ``(n_out,)`` per-component
    values (systems); 2-D shapes already broadcast-compatible with
    ``(n_points, n_out)``.  Anything else raises with the fix spelled out
    (e.g. a ``(n_out, n_points)`` tuple-of-columns needs ``jnp.stack(...,
    axis=-1)``).
    """
    if ic.ndim == 0:
        return ic.reshape(1, 1)
    if ic.ndim == 1:
        if ic.shape[0] == n_points:
            return ic.reshape(-1, 1)  # per-point column (reference)
        if ic.shape[0] == n_out:
            return ic.reshape(1, -1)  # per-component row (systems)
        if ic.shape[0] == 1:
            return ic.reshape(1, 1)
        raise ValueError(
            f"initial_condition returned shape {ic.shape}, which matches "
            f"neither the batch ({n_points} points) nor the number of "
            f"solution components ({n_out})")
    if ic.ndim == 2:
        rows, cols = ic.shape
        if rows in (1, n_points) and cols in (1, n_out):
            return ic
        hint = ""
        if (rows, cols) == (n_out, n_points):
            hint = (" — this looks transposed (e.g. a tuple of per-point "
                    "columns); return jnp.stack(components, axis=-1) "
                    "instead")
        raise ValueError(
            f"initial_condition returned shape {ic.shape}, which cannot "
            f"broadcast against the ({n_points}, {n_out}) network "
            f"output{hint}")
    raise ValueError(
        f"initial_condition returned a rank-{ic.ndim} array; expected "
        "scalar, 1-D, or 2-D")


class Model:
    """Base model: problem dimensionality, condition parsing, and the ansatz.

    Subclasses implement the network body via :meth:`network_init` and
    :meth:`network_apply`.  Mirrors ``TorchModel.__init__``
    (``model_torch.py:19-50``): ``ndims_spatial = ndims - 1`` iff an initial
    condition is given; constant initial conditions are wrapped into a
    callable; ``log_scale`` is a trainable scalar.
    """

    def __init__(self, ndims, initial_condition=None, boundary_condition=None,
                 domain=(0, 1), nparams=0, dtype=jnp.float32,
                 initial_condition_t=None, **kwargs):
        if "periodic" in kwargs:
            # Only models that implement the Fourier embedding may accept
            # this; swallowing it would silently produce a non-periodic
            # solution the user believes is periodic by construction.
            raise ValueError(
                f"{type(self).__name__} does not support periodic= — "
                "use ConvBlockModel or implement the embedding in your "
                "model body")
        if kwargs:
            # A typo'd Solver kwarg (e.g. activaton=) would otherwise train
            # silently with the default setting.
            raise ValueError(
                f"{type(self).__name__} got unknown keyword argument(s) "
                f"{sorted(kwargs)} — check the spelling against the model's "
                "constructor (layout/features/units/activation/periodic/"
                "dtype/...)")
        self.ndims = ndims
        self.ndims_spatial = ndims if initial_condition is None else ndims - 1
        self.nparams = nparams
        self.total = ndims + nparams
        self.dtype = dtype

        if initial_condition is None:
            self.initial_condition = None
        elif callable(initial_condition):
            self.initial_condition = initial_condition
        else:
            # Constant IC: a scalar (reference semantics) or a 1-D vector
            # with one value per solution component (systems).
            ic_value = np.asarray(
                initial_condition.detach().cpu().numpy()
                if hasattr(initial_condition, "detach")
                else initial_condition, dtype=np.float32)
            if ic_value.ndim > 1:
                raise ValueError(
                    "a non-callable initial_condition must be a scalar or a "
                    f"1-D per-component vector; got shape {ic_value.shape}")
            if ic_value.ndim == 1 and ic_value.shape[0] > 1:
                # Constant vector = per-component by definition; pre-shape to
                # (1, k) so batch-size coincidences can't reinterpret it.
                ic_value = ic_value.reshape(1, -1)
            self.initial_condition = lambda *args: jnp.asarray(ic_value)

        # Optional second initial condition u_t(x, t0) for problems that are
        # second-order in time (wave equation) — no reference counterpart
        # (its sigmoid gate binds only u(x, t0)).  Requires
        # initial_condition to be given too.
        if initial_condition_t is None:
            self.initial_condition_t = None
        else:
            if initial_condition is None:
                raise ValueError("initial_condition_t requires "
                                 "initial_condition")
            if callable(initial_condition_t):
                self.initial_condition_t = initial_condition_t
            else:
                ict = np.asarray(initial_condition_t, dtype=np.float32)
                if ict.ndim == 1 and ict.shape[0] > 1:
                    ict = ict.reshape(1, -1)
                self.initial_condition_t = lambda *args: jnp.asarray(ict)
        self.boundary_condition = boundary_condition
        self.domain = _normalize_domain(domain, ndims)

        # Mutable training-time state, owned by the Solver but kept here so
        # `model(...)`, `model.freeze_trainable(...)` work like the reference.
        self.params = None
        self.ensemble_size = 1
        self.periodic_dims = ()  # set by models with periodic embeddings
        # Decaying-IC binding for periodic models: strictly opt-in
        # (periodic_ic_decay=True).  None = keep the persistent binding
        # and run a one-time wrap-compatibility probe that warns when the
        # IC is incompatible (see _ic_decay_engaged for the measured
        # verdict); False = persistent, silently.
        self._ic_decay = None
        # Frozen interpretation of 1-D callable condition outputs
        # ('per_point' | 'per_component'), decided at the Solver's discovery
        # run (batch size 1, which disambiguates) and reused afterwards so a
        # later batch size that happens to equal n_out can't flip it.
        self._cond_modes = {}
        self._frozen_layers = set()
        self._frozen_variables = set()
        self._apply_jit = jax.jit(self._apply_with_variables)
        self._apply_jit_fused = jax.jit(self._apply_with_variables_fused)
        self._apply_jit_ensemble = jax.jit(
            lambda params, xs: jax.vmap(
                self._apply_with_variables, in_axes=(0, None))(params, xs))
        self._fused_broken = False

    # -- network body (overridden by subclasses) ---------------------------
    def network_init(self, key):
        """Initialize the network-body parameter pytree."""
        raise NotImplementedError

    def network_apply(self, net_params, xs):
        """Apply the network body to a ``(N, total)`` batch."""
        raise NotImplementedError

    # -- parameter management ----------------------------------------------
    def init_params(self, key, variables=None):
        """Build the full parameter pytree."""
        return {
            "net": self.network_init(key),
            "log_scale": jnp.asarray(0.0, self.dtype),
            "variables": {k: jnp.asarray(v, self.dtype)
                          for k, v in (variables or {}).items()},
        }

    def trainable_mask(self, params):
        """Boolean pytree matching ``params``: True where trainable.

        Frozen layers are addressed by name (``fc1``..., or ``conv_block`` /
        ``net`` for the whole body); frozen variables by name (``log_scale``
        or any V-token variable).

        Names frozen before parameters existed are validated here (the lazy
        path promised by :meth:`_validate_freeze_names`) — a typo'd name
        must raise, not be silently ignored forever.
        """
        unknown_layers = (self._frozen_layers - set(params["net"])
                          - {"conv_block", "net"})
        if unknown_layers:
            raise AttributeError(
                f"unknown frozen layer(s) {sorted(unknown_layers)}; known "
                f"layers: {sorted(params['net'])} (or 'conv_block' for the "
                "whole network body)")
        known_vars = set(params["variables"]) | {"log_scale"}
        unknown_vars = {
            v for v in self._frozen_variables
            if v not in known_vars
            # a Field freezes by prefix: 'kappa' covers 'kappa.fc1.w', ...
            and not any(k.startswith(v + ".") for k in known_vars)}
        if unknown_vars:
            raise AttributeError(
                f"unknown frozen variable(s) {sorted(unknown_vars)}; known: "
                f"{sorted(known_vars)}")
        freeze_all_net = bool({"conv_block", "net"} & self._frozen_layers)

        def layer_mask(name, subtree):
            trainable = not (freeze_all_net or name in self._frozen_layers)
            return jax.tree.map(lambda _: trainable, subtree)

        return {
            "net": {name: layer_mask(name, sub)
                    for name, sub in params["net"].items()},
            "log_scale": "log_scale" not in self._frozen_variables,
            "variables": {
                name: (name not in self._frozen_variables
                       and not any(name.startswith(fz + ".")
                                   for fz in self._frozen_variables))
                for name in params["variables"]},
        }

    def _validate_freeze_names(self, layers, variables):
        """Unknown names are an error, as in the reference (its ``getattr``
        lookups raise AttributeError, ``model_torch.py:76,81``)."""
        if self.params is None:
            return  # pre-init freeze; validated lazily on the next mask build
        known_layers = set(self.params["net"]) | {"conv_block", "net"}
        for name in layers:
            if name not in known_layers:
                raise AttributeError(
                    f"unknown layer {name!r}; known layers: "
                    f"{sorted(self.params['net'])} (or 'conv_block' for the "
                    "whole network body)")
        known_vars = set(self.params["variables"]) | {"log_scale"}
        for name in variables:
            if (name not in known_vars
                    and not any(k.startswith(name + ".")
                                for k in known_vars)):
                raise AttributeError(
                    f"unknown trainable variable {name!r}; known: "
                    f"{sorted(known_vars)} (a Field freezes by prefix)")

    # -- freeze / unfreeze (reference API: model_torch.py:56-105) ----------
    def freeze_trainable(self, layers=None, variables=None):
        """Freeze layers (by name) and trainable variables, as in the
        reference's two-phase inverse-problem training."""
        layers = list(layers or [])
        variables = list(variables or [])
        self._validate_freeze_names(layers, variables)
        self._frozen_layers |= set(layers)
        self._frozen_variables |= set(variables)

    def unfreeze_trainable(self, layers=None, variables=None):
        """Reverse :meth:`freeze_trainable`."""
        layers = list(layers or [])
        variables = list(variables or [])
        self._validate_freeze_names(layers, variables)
        self._frozen_layers -= set(layers)
        self._frozen_variables -= set(variables)

    # README.md:126 / examples notebook use these names (a doc/code mismatch
    # in the reference — v1.0.2 ships freeze_trainable); support both.
    freeze_layers = freeze_trainable
    unfreeze_layers = unfreeze_trainable

    def _normalize_cond(self, key, val, n_points, n_out):
        """Shape-normalize a condition value with a sticky interpretation
        for 1-D callable outputs (see ``_cond_modes``)."""
        if val.ndim != 1:
            return _normalize_ic_shape(val, n_points, n_out)
        mode = self._cond_modes.get(key)
        if mode is None:
            out = _normalize_ic_shape(val, n_points, n_out)
            self._cond_modes[key] = ("per_point" if out.shape[1] == 1
                                     else "per_component")
            return out
        if mode == "per_component":
            if val.shape[0] != n_out:
                raise ValueError(
                    f"{key} returned shape {val.shape}; expected one value "
                    f"per solution component ({n_out})")
            return val.reshape(1, -1)
        if val.shape[0] not in (n_points, 1):
            raise ValueError(
                f"{key} returned shape {val.shape}; expected one value per "
                f"point ({n_points})")
        return val.reshape(-1, 1)

    def _ic_decay_engaged(self):
        """Whether the decaying-IC binding is active (opt-in).

        Measured verdict (BENCHMARKS.md "Allen-Cahn"): the persistent
        binding ``gate*NN + ic`` trains better than the decaying one at
        every budget tested — on Allen-Cahn itself (with and without
        causal weighting) AND on a linear periodic-heat control designed
        to isolate the wrap-kink mechanism.  A wrap-incompatible IC does
        carry its value/slope kink into the bound solution for all ``t``
        (the exactly-periodic network is smooth on the circle), but a kink
        is L2-approximable — a soft spectral penalty, not the hard error
        floor it was first believed to be; at realistic budgets the
        optimization error dominates either way, and the persistent term
        remains the better structural prior.  So the decay is strictly
        opt-in (``periodic_ic_decay=True``); with the default (None) a
        wrap-incompatible IC gets a one-time advisory warning so the
        trade-off is visible, and the persistent binding is kept.
        """
        if self._ic_decay is None:
            if self._probe_ic_wrap_incompatible():
                warnings.warn(
                    "the initial condition is incompatible with the "
                    "periodic wrap (value/slope/curvature mismatch across "
                    "the identified boundary): the exact-IC binding "
                    "carries that kink into the solution for all t. The "
                    "persistent binding is kept — it measured better than "
                    "the decaying alternative at every budget tested "
                    "(BENCHMARKS.md \"Allen-Cahn\"). Pass "
                    "periodic_ic_decay=True to opt into the decaying "
                    "binding, or periodic_ic_decay=False to silence this "
                    "warning.")
            self._ic_decay = False
        return self._ic_decay

    def _probe_ic_wrap_incompatible(self):
        """Host-side probe: does any IC break value/slope/curvature
        continuity across any periodic wrap?  In-domain one-sided
        stencils with an interior-calibrated truncation floor; global
        scale so decayed soliton tails stay compatible."""
        conds = [self.initial_condition]
        if self.initial_condition_t is not None:
            conds.append(self.initial_condition_t)
        try:
            # The first call usually happens inside a jit trace (the
            # Solver's discovery run); omnistaging would stage the IC's own
            # jnp ops into that trace, so force eager evaluation.
            with jax.ensure_compile_time_eval():
                return any(
                    self._wrap_mismatch(cond, d)
                    for cond in conds for d in self.periodic_dims)
        except Exception as exc:  # exotic IC (V tokens, torch, ...):
            warnings.warn(
                "could not probe the initial condition for periodic wrap "
                f"compatibility ({exc!r}); assuming compatible (pass "
                "periodic_ic_decay=True to force the decaying binding)")
            return False

    def _wrap_mismatch(self, cond, d):
        """True if ``cond`` (a spatial-columns callable) breaks value,
        slope or curvature continuity across periodic dim ``d``'s wrap.

        Every probe point stays INSIDE the domain (one-sided stencils at
        each wrap end): ICs that clamp or are undefined outside their
        domain — tabulated ``interp`` data, ``sqrt``, measured fields —
        must not be falsely flagged by out-of-domain samples.  All
        evaluations go through ONE batched ``cond`` call: on a real-TPU
        process each eager op is a tunnel round-trip (CLAUDE.md), so a
        13-call probe would tax every periodic Solver construction."""
        nds = self.ndims_spatial
        rng = np.random.default_rng(0)
        k = 4  # probe points for the other spatial coordinates
        cols = []
        for i in range(nds):
            lo_i, hi_i = (float(v) for v in self.domain[i])
            cols.append(rng.uniform(lo_i, hi_i, k).astype(np.float32))
        lo, hi = (float(v) for v in self.domain[d])
        span = hi - lo
        h = 0.05 * span
        # One-sided O(h^2) stencils carry odd-power truncation terms that
        # do NOT cancel between the forward (at lo) and backward (at hi)
        # side even for a perfectly periodic IC, and their size scales
        # with the IC's harmonic content — so the truncation floor is
        # CALIBRATED empirically: the same fwd-vs-bwd stencil mismatch is
        # measured at interior points (where the IC is surely smooth) and
        # the seam is only flagged when its mismatch clears a multiple of
        # that floor.  This keeps the probe h-robust for any band content
        # while biasing against false positives (a missed advisory is
        # cheap; a wrong scary warning is not).
        # 5 calibration points spread so that a single interior kink (its
        # +-3h stencil reach) can contaminate at most two of them — the
        # MEDIAN floor below then stays clean and a genuine seam mismatch
        # is still flagged (a kink placed exactly at one calibration point
        # must not silently raise the floor to its own magnitude).
        calib = [lo + frac * span for frac in (0.18, 0.34, 0.5, 0.66, 0.82)]
        interior = [lo + frac * span
                    for frac in (0.125, 0.25, 0.375, 0.5, 0.625, 0.75,
                                 0.875)]
        xd = np.asarray(
            interior
            + [c + i * h for c in calib for i in range(-3, 4)]
            + [lo + i * h for i in range(4)]     # forward stencil at lo
            + [hi - i * h for i in range(4)],    # backward stencil at hi
            np.float32)
        cs = [np.tile(c, xd.size) for c in cols]
        cs[d] = np.repeat(xd, k)
        n_rows = xd.size * k
        out = np.asarray(cond(*cs), np.float64)
        if out.ndim == 0:  # scalar constant IC broadcast
            out = np.full(n_rows, float(out))
        elif out.shape[0] != n_rows:
            # Constant (non-batch) output, e.g. a vector IC returning
            # (n_out,) or (1, n_out) regardless of the input batch.
            out = np.broadcast_to(out, (n_rows,) + out.shape)
        out = out.reshape(xd.size, k, -1)
        ncal = len(calib)
        cal = out[7:7 + 7 * ncal].reshape(ncal, 7, k, -1)
        flo = out[7 + 7 * ncal:11 + 7 * ncal]
        fhi = out[11 + 7 * ncal:15 + 7 * ncal]

        def fwd(p):  # p[i] = f(x + i*h), i = 0..3; normalized by span
            return ((-3 * p[0] + 4 * p[1] - p[2]) / (2 * h) * span,
                    (2 * p[0] - 5 * p[1] + 4 * p[2] - p[3])
                    / (h * h) * span * span)

        def bwd(p):  # p[i] = f(x - i*h)
            return ((3 * p[0] - 4 * p[1] + p[2]) / (2 * h) * span,
                    (2 * p[0] - 5 * p[1] + 4 * p[2] - p[3])
                    / (h * h) * span * span)

        # Truncation + float32-rounding floor from the interior points
        # (cal[:, 3] is the center; 3+i / 3-i step out either side).
        # MEDIAN over the calibration points: robust to up to two points
        # contaminated by an interior kink, while still tracking the
        # genuine truncation scale of high-harmonic smooth ICs.
        per_point = [[], []]
        for c in range(ncal):
            fq = fwd([cal[c, 3 + i] for i in range(4)])
            bq = bwd([cal[c, 3 - i] for i in range(4)])
            for j in range(2):
                per_point[j].append(float(np.max(np.abs(fq[j] - bq[j]))))
        floor = [float(np.median(p)) for p in per_point]

        # Value, slope and curvature in the normalized coordinate
        # (x - lo)/span, so all three share the value's scale ballpark.
        # The scale is GLOBAL (interior sweep included): a soliton-style IC
        # that has decayed to ~1e-7 at the wrap is compatible for every
        # practical purpose even though its tail is not literally periodic.
        value_scale = max(1e-6, float(np.max(np.abs(out))))
        quantities = [(flo[0],) + fwd(flo), (fhi[0],) + bwd(fhi)]
        # Tolerances: relative to the quantity's own magnitude or to the
        # IC's overall scale (whichever is larger — a periodic IC is often
        # exactly 0 AT the wrap), and never below 4x the calibrated
        # stencil floor (value has no truncation term: floor 0).
        for (a, b), rtol, flr in zip(zip(*quantities), (1e-3, 1e-3, 3e-3),
                                     [0.0] + floor):
            scale = max(float(np.max(np.abs(a))),
                        float(np.max(np.abs(b))), value_scale)
            if not np.all(np.isfinite(a - b)):
                return True
            if float(np.max(np.abs(a - b))) > max(rtol * scale, 4 * flr):
                return True
        return False

    # -- forward + ansatz ---------------------------------------------------
    def apply(self, params, xs):
        """Full forward: network body then ansatz. ``xs`` is ``(N, total)``."""
        u = self.network_apply(params["net"], xs)
        return self.anzatc(u, xs, params)

    def apply_leaves(self, params, leaves):
        """Equation-path forward on the Solver's per-coordinate leaf
        columns.  The base model stacks them back into the ``(N, total)``
        batch; SeparableModel overrides this with the factorized
        tensor-product-grid path (models/separable.py)."""
        return self.apply(params, jnp.concatenate(leaves, axis=1))

    def anzatc(self, u, xs, params):
        """Ansatz transform binding boundary/initial conditions exactly.

        Faithful port of ``model_torch.py:107-128``:

        * BC: ``u * prod((x-lo)/(hi-lo)) * prod((hi-x)/(hi-lo)) + bc`` over
          the spatial dims — the polynomial vanishes on the whole boundary,
          so the condition holds by construction.
        * IC: ``(sigmoid((t-t0)/exp(log_scale)) - 0.5) * u + ic(x_spatial)``
          where ``t`` is the last *variable* column and ``t0`` the lower end
          of the last domain interval; ``log_scale`` is trainable sharpness.

        Parameter columns (``nparams``) pass through the network but never
        enter the ansatz.
        """
        nds = self.ndims_spatial
        xs_spatial = xs[:, :nds]
        t = xs[:, self.ndims - 1:self.ndims]
        lower = [float(lims[0]) for lims in self.domain]
        upper = [float(lims[1]) for lims in self.domain]
        t0 = lower[-1]

        if self.boundary_condition is not None:
            # Per-dim scalar arithmetic (python-float literals) instead of a
            # (1, nds) constant array: identical math, XLA fuses it the same,
            # and it keeps the whole forward free of array constants so it
            # can be traced into a Pallas kernel body.  Periodic dims carry
            # no Dirichlet product — their boundary behavior comes from the
            # Fourier input embedding.
            shape_fn = jnp.ones_like(u)
            for i in range(nds):
                if i in self.periodic_dims:
                    continue
                xi = xs_spatial[:, i:i + 1]
                lo_i, hi_i = lower[i], upper[i]
                inv_span2 = 1.0 / ((hi_i - lo_i) * (hi_i - lo_i))
                shape_fn = shape_fn * ((xi - lo_i) * (hi_i - xi) * inv_span2)
            if callable(self.boundary_condition):
                # Non-constant Dirichlet data (superset of the reference's
                # constant-only bc): the callable is a smooth extension of
                # the boundary values into the domain, evaluated on the
                # spatial columns.
                bc_cols = [xs_spatial[:, i] for i in range(nds)]
                bc = jnp.asarray(self.boundary_condition(*bc_cols),
                                 self.dtype)
                bc = self._normalize_cond("boundary_condition", bc,
                                          u.shape[0], u.shape[1])
            else:
                bc = self.boundary_condition
            u = u * shape_fn + bc

        if self.initial_condition is not None:
            cols = [xs_spatial[:, i] for i in range(nds)]
            ic = jnp.asarray(self.initial_condition(*cols), self.dtype)
            ic = self._normalize_cond("initial_condition", ic,
                                      u.shape[0], u.shape[1])
            gate = jax.nn.sigmoid((t - t0) / jnp.exp(params["log_scale"])) - 0.5
            ic_decay = 1.0
            if self.periodic_dims and self._ic_decay_engaged():
                # OPT-IN decaying-IC binding for periodic models
                # (periodic_ic_decay=True; see _ic_decay_engaged for the
                # measured verdict that keeps the persistent form the
                # default).  Decaying the IC term keeps u(t0) exact while
                # making the solution asymptotically exactly periodic.
                # The timescale is FIXED at a quarter of the time span:
                # making it trainable opens a measured loophole — the
                # optimizer collapses the scale to ~0, the IC vanishes
                # from every sampled t > t0 sliver, and the PDE is then
                # 'solved' exactly along a wrong trajectory (loss 7e-7,
                # solution 40% off — BENCHMARKS.md "Allen-Cahn").  The
                # tau^2 form has zero slope at t0, so the
                # second-order-in-time binding below keeps u_t(t0) exact
                # too.
                t_lo, t_hi = self.domain[self.ndims - 1]
                tau = (t - t0) / (0.25 * (float(t_hi) - float(t_lo)))
                ic_decay = 2.0 - 2.0 * jax.nn.sigmoid(tau * tau)
            if self.initial_condition_t is None:
                u = gate * u + ic * ic_decay
            else:
                # Second-order-in-time binding: gate^2 vanishes to second
                # order at t0, so u(t0) = ic AND u_t(t0) = ic_t exactly.
                ic_t = jnp.asarray(self.initial_condition_t(*cols),
                                   self.dtype)
                ic_t = self._normalize_cond("initial_condition_t", ic_t,
                                            u.shape[0], u.shape[1])
                u = gate * gate * u + (ic + (t - t0) * ic_t) * ic_decay
        return u

    # -- fused-inference hooks (overridden by ConvBlockModel) ---------------
    def network_apply_fused(self, net_params, xs):
        """Fused (Pallas) network forward; base models have none."""
        raise NotImplementedError

    def _fusion_enabled(self, batch):
        return False

    # -- Taylor-mode derivative taps (planned fast path) ---------------------
    network_apply_taylor = None  # set by models that support it

    @staticmethod
    def plan_closure(derivs):
        """Downward-closed derivative set for one Taylor traversal: the
        sorted list of every sub-multi-index of every requested derivative
        (any order).  A higher-order tap needs every sub-multi-index below
        it for the activation chain rules; the traversal's stacked state
        has ``1 + len(closure)`` blocks.  Single source of truth for
        :meth:`full_taps` and the Solver's ``fast_taps='auto'`` cost
        heuristic."""
        closure = set()

        def add(mi):
            if not mi or mi in closure:
                return
            closure.add(mi)
            for i in range(len(mi)):
                add(mi[:i] + mi[i + 1:])

        for d in derivs:
            add(tuple(sorted(d)))
        return sorted(closure, key=lambda m: (len(m), m))

    @property
    def supports_taylor(self):
        return self.network_apply_taylor is not None

    def full_taps(self, params, xs, derivs):
        """All requested pure field taps of the FULL model (network body +
        ansatz) in one Taylor-mode network traversal, any order.

        ``derivs`` is a set of sorted multi-indices (pure or mixed) w.r.t.
        coordinate columns; it is closed downward first (a higher-order tap
        needs every sub-multi-index for the activation chain rules).  The
        network body propagates batched tangents (see
        ``layout.make_layout_network``'s ``taylor_taps``); the cheap ansatz
        composes exactly through a polarized scalar Taylor substitution:
        with one scalar per position of the multi-index ``p`` and the
        network's multilinear cross expansion

            ``net(s_0..s_{m-1}) = V + sum over nonempty position subsets B
            of (prod_{i in B} s_i) * tap[sorted(p[B])]``,

        the mixed partial ``d^m/(ds_0..ds_{m-1})`` of
        ``anzatc(net(s), xs + sum_i s_i e_{p_i})`` at 0 is exactly the
        composite's derivative: a mixed partial in DISTINCT scalars only
        ever reads the multilinear cross terms, and polarization covers
        repeated indices (``p_i == p_j``).

        Returns a dict: multi-index -> (N, n_out) array, always including
        ``()`` (the field value).
        """
        import itertools

        closure = self.plan_closure(derivs)
        V, taps = self.network_apply_taylor(params["net"], xs, closure)
        table = {(): self.anzatc(V, xs, params)}
        n_total = xs.shape[1]
        zero = jnp.zeros((), self.dtype)
        one = jnp.ones((), self.dtype)

        def basis(a):
            return jnp.zeros((n_total,), self.dtype).at[a].set(1.0)

        def nth(fn, m):
            """Mixed partial d^m/(ds_0..ds_{m-1}) fn(s_0..s_{m-1}) at 0."""
            if m == 0:
                return fn()

            def g(*rest):
                return jax.jvp(lambda s0: fn(s0, *rest), (zero,), (one,))[1]

            return nth(g, m - 1)

        for mi in sorted({tuple(sorted(d)) for d in derivs},
                         key=lambda m: (len(m), m)):
            m = len(mi)
            subsets = [B for r in range(1, m + 1)
                       for B in itertools.combinations(range(m), r)]
            tap_for = {B: taps[tuple(sorted(mi[i] for i in B))]
                       for B in subsets}
            es = [basis(mi[i]) for i in range(m)]

            def phi(*svec, tap_for=tap_for, es=es, subsets=subsets, m=m):
                net = V
                for B in subsets:
                    coef = svec[B[0]]
                    for i in B[1:]:
                        coef = coef * svec[i]
                    net = net + coef * tap_for[B]
                shift = xs
                for i in range(m):
                    shift = shift + svec[i] * es[i]
                return self.anzatc(net, shift, params)

            table[mi] = nth(phi, m)
        return table

    # -- stateful conveniences ----------------------------------------------
    def _apply_with_variables(self, params, xs):
        with variable_scope("read", params["variables"]):
            return self.apply(params, xs)

    def _apply_with_variables_fused(self, params, xs):
        with variable_scope("read", params["variables"]):
            u = self.network_apply_fused(params["net"], xs)
            return self.anzatc(u, xs, params)

    def predict_apply(self, params, xs):
        """Inference entry: pads the batch to a shape bucket (see
        :func:`pad_to_bucket`) so a sweep of grid sizes reuses ONE compiled
        executable instead of recompiling per distinct ``N``, runs the
        jitted forward, and returns a host ``numpy`` array sliced back to
        the true row count.  Padding and slicing happen host-side — eager
        device ops cost a round-trip each behind the TPU tunnel.  Ensembles
        return ``(K, N, 1)``; single models may route through the fused
        Pallas chain (opt-in) with transparent fallback."""
        if isinstance(xs, jax.Array):
            xs = np.asarray(xs)
        xs, n = pad_to_bucket(xs)
        if self.ensemble_size > 1:
            out = self._apply_jit_ensemble(params, xs)
        elif not self._fused_broken and self._fusion_enabled(xs.shape[0]):
            try:
                out = self._apply_jit_fused(params, xs)
            except Exception:  # Mosaic lowering/runtime issue — fall back
                self._fused_broken = True
                out = self._apply_jit(params, xs)
        else:
            out = self._apply_jit(params, xs)
        out = np.asarray(out)
        if out.shape[-2] != n:
            out = out[..., :n, :]
        return out

    def __call__(self, *xs):
        """Evaluate the trained model at host-supplied points (the reference's
        ``solver.model(xs)`` / ``solver.ctx.run(solver.model, xs)`` usage
        from the examples notebook).  Accepts the same mixed inputs as
        ``Solver.predict``, including one pre-stacked ``(N, ndims+nparams)``
        array — the form the reference's forward consumes directly."""
        from ..solver import Solver  # local import to avoid a cycle
        if self.params is None:
            raise RuntimeError("model has no parameters yet — build it "
                               "through a Solver")
        if (len(xs) == 1 and hasattr(xs[0], "ndim") and xs[0].ndim == 2
                and xs[0].shape[1] == self.total > 1):
            x = xs[0]
            if hasattr(x, "detach"):  # torch tensor
                x = x.detach().cpu().numpy()
            xs_concat = np.asarray(x)
        else:
            xs_concat = Solver.reshape_and_concat(xs)
        # Same dtype normalization as Solver._normalize_inputs — a float32
        # input to a non-f32 model would compile a second executable for
        # the same shape bucket and diverge numerically from predict().
        xs_concat = np.asarray(xs_concat,
                               jax.dtypes.canonicalize_dtype(self.dtype))
        out = self.predict_apply(self.params, xs_concat)
        if self.ensemble_size > 1:
            out = out.mean(axis=0)
        return out

    forward = __call__


class ConvBlockModel(Model):
    """Default model: network body built from the layout-string DSL.

    Mirrors ``ConvBlockModel`` (``model_torch.py:130-172``): defaults
    ``layout='fafaf'``, ``features=(20, 30, 1)``, ``activation='Sigmoid'``;
    accepts the ``units`` spelling for ``features`` (``README.md:41-42``).

    Superset: branch/join/norm layout tokens (``B``/``*``/``.``/``n``) with
    per-branch sub-networks via ``branches=`` — see
    ``models/layout.py``'s module docstring for the grammar and
    ``examples/30_branched_multihead.py`` for multi-head systems.
    """

    def __init__(self, ndims, initial_condition=None, boundary_condition=None,
                 domain=(0, 1), nparams=0, layout="fafaf",
                 features=(20, 30, 1), activation="Sigmoid", units=None,
                 dtype=jnp.float32, periodic=None, fourier_features=None,
                 arch="mlp", periodic_ic_decay=None, branches=None,
                 adaptive_activation=None, **kwargs):
        super().__init__(ndims=ndims, initial_condition=initial_condition,
                         boundary_condition=boundary_condition, domain=domain,
                         nparams=nparams, dtype=dtype, **kwargs)
        # periodic_ic_decay: True = opt into the decaying IC binding;
        # False = persistent, silently; None (default) = persistent, with
        # a one-time advisory warning when the wrap-compatibility probe
        # finds a mismatched IC (see Model._ic_decay_engaged).
        if periodic_ic_decay is not None:
            self._ic_decay = bool(periodic_ic_decay)
        if units is not None:
            features = units
        self.layout = layout
        self.features = list(features)
        self.activation = activation
        if arch in ("modified", "modified_mlp"):
            arch = "modified"
        elif arch != "mlp":
            raise ValueError(f"unknown arch {arch!r}; use 'mlp' (layout "
                             "chain, default) or 'modified' (gated "
                             "Wang-style modified MLP)")
        self.arch = arch

        # Periodic spatial dimensions: a Fourier input embedding
        # x_i -> (sin, cos)(k*2*pi*(x_i - lo)/(hi - lo)), k = 1..m, makes
        # the solution AND all its derivatives exactly periodic in those
        # dims (no reference counterpart; the standard exact-periodicity
        # device).  m=1 by default; a dict {dim: m} requests m harmonics —
        # sharp periodic features (Allen-Cahn kinks, shocks) train far
        # faster when the embedding already spans the needed band, the
        # periodic analogue of fourier_features.
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
                raise ValueError(f"periodic dim {d} needs >= 1 harmonic, "
                                 f"got {m}")
        for d in self.periodic_dims:
            if d < 0 or d >= self.ndims_spatial:
                raise ValueError(
                    f"periodic dim {d} is not a spatial dimension "
                    f"(expected 0 <= dim < ndims_spatial="
                    f"{self.ndims_spatial}; negative indices are not "
                    "supported)")
        if (boundary_condition is not None and self.periodic_dims
                and len(self.periodic_dims) == self.ndims_spatial):
            raise ValueError(
                "boundary_condition has no effect when every spatial "
                "dimension is periodic — drop one of the two")
        if periodic_ic_decay and not (self.periodic_dims
                                      and self.initial_condition is not None):
            raise ValueError(
                "periodic_ic_decay=True replaces the persistent exact-IC "
                "binding of a PERIODIC model — it needs both periodic= "
                "dims and an initial_condition (got "
                f"periodic_dims={self.periodic_dims}, initial_condition="
                f"{'set' if self.initial_condition is not None else 'None'})")
        # Random Fourier features (Tancik et al.-style): append
        # [sin(2 pi B v), cos(2 pi B v)] of the selected raw columns with a
        # FIXED Gaussian frequency matrix B ~ N(0, sigma^2) — the standard
        # cure for spectral bias (a tanh MLP on raw coordinates cannot
        # learn high-frequency solution content at trainable speed; the
        # measured case is advection at c >= 10, BENCHMARKS.md).  The raw
        # columns are kept alongside so low-frequency behavior is
        # unchanged.  Spelling: m, (m, sigma), or dict(m=, sigma=, dims=);
        # default sigma 10.0, default dims = every non-periodic input
        # column.  B is deterministic (seeded) so checkpoints reload
        # against an identical embedding.
        self._rff_b = None
        self._rff_dims = ()
        if fourier_features is not None:
            if isinstance(fourier_features, dict):
                m = int(fourier_features["m"])
                sigma = float(fourier_features.get("sigma", 10.0))
                dims = fourier_features.get("dims")
            elif isinstance(fourier_features, (tuple, list)):
                m, sigma = int(fourier_features[0]), float(fourier_features[1])
                dims = None
            else:
                m, sigma, dims = int(fourier_features), 10.0, None
            if dims is None:
                dims = tuple(i for i in range(self.total)
                             if i not in self.periodic_dims)
            dims = tuple(sorted(int(d) for d in dims))
            for d in dims:
                if not 0 <= d < self.total:
                    raise ValueError(f"fourier_features dim {d} out of "
                                     f"range for {self.total} input columns")
                if d in self.periodic_dims:
                    raise ValueError(
                        f"dim {d} is periodic — random Fourier features of "
                        "the raw value would break the exact periodicity; "
                        "drop it from fourier_features dims")
            if m < 1 or not dims:
                raise ValueError("fourier_features needs m >= 1 and at "
                                 "least one input dim")
            rng = np.random.default_rng(20240317)
            self._rff_b = np.asarray(rng.normal(0.0, sigma, (m, len(dims))),
                                     np.float32)
            self._rff_dims = dims
        in_dim = (self.total
                  + sum(2 * m - 1 for m in self.periodic_harmonics.values())
                  + (0 if self._rff_b is None else 2 * self._rff_b.shape[0]))

        if self.arch == "modified":
            # Gated modified MLP (layout.make_modified_mlp_network); the
            # layout string does not apply — reject an explicit non-default
            # one rather than silently ignoring it.
            if layout != "fafaf":
                raise ValueError(
                    "arch='modified' builds its own gated structure — "
                    "drop the layout= argument (depth comes from "
                    "len(features))")
            if branches is not None:
                raise ValueError(
                    "arch='modified' has no layout string — branches= only "
                    "applies to 'B' tokens in a layout chain")
            if adaptive_activation is not None:
                raise ValueError(
                    "adaptive_activation= (L-LAAF slopes) applies to layout-"
                    "chain activations; the gated modified MLP has its own "
                    "trainable gate structure — use arch='mlp'")
            from .layout import make_modified_mlp_network
            self._net_init, self._net_apply, self.layer_names = \
                make_modified_mlp_network(self.features, activation,
                                          in_dim=in_dim, dtype=dtype)
        else:
            self._net_init, self._net_apply, self.layer_names = \
                make_layout_network(layout, self.features, activation,
                                    in_dim=in_dim, dtype=dtype,
                                    branches=branches,
                                    adaptive_activation=adaptive_activation)
            if (adaptive_activation is not None
                    and not self._net_apply.adaptive):
                raise ValueError(
                    f"adaptive_activation= needs at least one 'a' slot in "
                    f"layout {layout!r} (or its branches) to attach a "
                    "trainable slope to — it would be a silent no-op")
        self._fused_apply = None
        self._fused_taylor_cache = {}
        if not self._net_apply.taylor_ok:
            # Non-elementwise activation: the Taylor fast path would be
            # silently wrong — disable it (shadows the class method, so
            # supports_taylor reports False and everything falls back).
            self.network_apply_taylor = None

    def _embed(self, xs):
        """Input embedding: periodic dims expand to (sin, cos) pairs;
        random Fourier features append after the raw columns."""
        if not self.periodic_dims and self._rff_b is None:
            return xs
        cols = []
        for i in range(self.total):
            xi = xs[:, i:i + 1]
            if i in self.periodic_dims:
                lo, hi = self.domain[i]
                w = 2.0 * np.pi / (float(hi) - float(lo))
                phase = w * (xi - float(lo))
                for k in range(1, self.periodic_harmonics[i] + 1):
                    cols.append(jnp.sin(float(k) * phase))
                    cols.append(jnp.cos(float(k) * phase))
            else:
                cols.append(xi)
        if self._rff_b is not None:
            v = jnp.concatenate([xs[:, d:d + 1] for d in self._rff_dims],
                                axis=1)
            proj = (2.0 * np.pi) * (v @ self._rff_b.T)
            cols.append(jnp.sin(proj))
            cols.append(jnp.cos(proj))
        return jnp.concatenate(cols, axis=1)

    def network_init(self, key):
        return self._net_init(key)

    def network_apply(self, net_params, xs):
        return self._net_apply(net_params, self._embed(xs))

    def network_apply_taylor(self, net_params, xs, closure):
        fused = self._fused_taylor_for(closure)
        if fused is not None:
            return fused(net_params, self._embed(xs))
        init = None
        if self.periodic_dims or self._rff_b is not None:
            # Taylor state of the embedding w.r.t. the original coordinates
            # (cheap smooth jvp taps, any order), fed into the network
            # traversal.
            def e(a):
                return jnp.zeros_like(xs).at[:, a].set(1.0)

            taps0 = {}
            for mi in closure:
                fn = self._embed
                for k in mi:
                    fn = (lambda f, kk: lambda z: jax.jvp(
                        f, (z,), (e(kk),))[1])(fn, k)
                taps0[tuple(mi)] = fn(xs)
            init = (self._embed(xs), taps0)
        return self._net_apply.taylor_taps(net_params, self._embed(xs),
                                           closure, init=init)

    def _fused_taylor_for(self, closure):
        """The fused Pallas Taylor forward+backward for this (layout, plan),
        or None.  Opt-in via ``PYDENS_TPU_FUSED_TAYLOR=always`` (see
        ops/pallas_taylor.py for the measured rationale); single model,
        float32, dense-chain, order-<=2 plans only."""
        import os
        mode = os.environ.get("PYDENS_TPU_FUSED_TAYLOR", "never")
        if mode != "always" or self.ensemble_size > 1:
            return None
        if (self.dtype != jnp.float32 or self.periodic_dims
                or self._rff_b is not None or self.arch != "mlp"
                or getattr(self._net_apply, "adaptive", False)):
            return None
        key = tuple(closure)
        if key not in self._fused_taylor_cache:
            from ..ops.pallas_taylor import make_fused_taylor, supports
            tokens = self._net_apply.tokens
            if not supports(tokens, closure, self.periodic_dims):
                self._fused_taylor_cache[key] = None
            else:
                self._fused_taylor_cache[key] = make_fused_taylor(
                    tokens, self._net_apply.activations, self.layer_names,
                    in_dim=self.total, closure=list(closure),
                    interpret=jax.default_backend() == "cpu")
        return self._fused_taylor_cache[key]

    def network_apply_fused(self, net_params, xs):
        if self._fused_apply is None:
            from ..ops.pallas_mlp import make_fused_mlp_forward
            self._fused_apply = make_fused_mlp_forward(
                self.layout, self._net_apply.activations, self.layer_names)
        return self._fused_apply(net_params, self._embed(xs))

    def _fusion_enabled(self, batch):
        """Whether inference should use the fused Pallas chain.

        Off by default: the measured XLA path wins on this workload (see
        ops/pallas_mlp.py docstring).  Set ``PYDENS_TPU_FUSED=always`` to
        opt in.  Chain layouts only — the gated modified MLP and the
        branch/join/norm superset tokens have no fused kernel.
        """
        import os
        return (self.arch == "mlp"
                and set(self._net_apply.tokens) <= set("fcaR+")
                and not getattr(self._net_apply, "adaptive", False)
                and os.environ.get("PYDENS_TPU_FUSED", "never") == "always")


# Migration alias: the reference exports `TorchModel` as the subclassing base
# (`/root/reference/pydens/__init__.py:4`).
TorchModel = Model
