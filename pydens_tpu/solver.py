"""Solver: trains a neural network to satisfy a differential equation.

TPU-native rebuild of ``Solver`` (``/root/reference/pydens/model_torch.py:
191-487``) with the same public surface (``__init__`` / ``fit`` / ``predict``
/ ``reshape_and_concat`` / ``.losses`` / ``.model``) and the same behavioral
quirks (documented inline), but a completely different execution model:

* The entire per-iteration body — collocation sampling, residual evaluation
  through nested derivative taps, loss, gradient, optimizer update — compiles
  into ONE jitted ``lax.scan`` over iterations.  Nothing leaves HBM during a
  fit chunk; per-iteration losses come back as a single device array.
* Collocation points are sampled device-side with ``jax.random`` (samplers
  that only implement the host protocol are pre-sampled once per chunk).
* Data parallelism over the collocation batch (the natural parallelism of the
  problem class — each batch point is i.i.d., SURVEY §2) rides a
  ``jax.sharding.Mesh``: the sampled batch gets a sharding constraint and XLA
  inserts the gradient ``psum`` over ICI automatically.
* ``V``-token variables live in a ``variables`` sub-pytree discovered by an
  init-time fake run, mirroring the reference (``model_torch.py:319-325``).
"""

from __future__ import annotations

import contextlib
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .models import ConvBlockModel
from .models.base import pad_to_bucket
from .parallel.distributed import (is_multi_process, to_global_replicated,
                                   global_batch)
from .ops.tokens import Expr, EvalContext, variable_scope, as_array, D
from .utils.criteria import resolve_criterion
from .utils.optimizers import resolve_optimizer, LMConfig

__all__ = ["Solver"]

# fast_taps='auto' uses the Taylor plan only while its stacked tap state
# (batch x taps x width f32 elements) stays below this; above it the
# training step is HBM-bandwidth-bound and the XLA-fused nested-jvp path
# accesses fewer bytes (measured crossover on v5e, BENCHMARKS.md).
_PLAN_AUTO_MAX_ELEMENTS = 2_000_000

# Iterations per guard check in the compiled training loop (stop_on_nan /
# until_loss path).  The guard's per-check cost is a scalar-core sync on the
# block's last losses (~measured 3-4 us on v5e behind the tunnel); blocks of
# 16 amortize it below the run-to-run noise floor while a snapshot+replay
# scheme keeps stopping semantics exact (see run_chunk's guard comment and
# BENCHMARKS.md "Divergence-guard cost").
GUARD_BLOCK = 16

# Rademacher probes per NTK-trace estimate (fit(loss_balancing='ntk')).
# Probes live in residual space (cotangents through one shared vjp
# pullback), where Hutchinson variance is the NTK's own off-diagonal mass
# — near zero for the diagonal-dominant kernels PINN residuals produce —
# and terms whose residual block has <= _NTK_PROBES entries (pointwise
# boundary constraints) enumerate the basis outright, making their traces
# exact.  4 probes keep the residual noise well below the 0.7/0.3 EMA
# smoothing across the 10-rebalance warmup window (pinned against exact
# Jacobian traces in tests/test_ntk_balancing.py).
_NTK_PROBES = 4


# Regime bound for the 4x body unroll: estimated per-iteration work
# (batch_size x parameter count) above which the step is large enough that
# XLA loop bookkeeping (~us, fixed) is noise while inlining the body 4x
# into BOTH loop sites multiplies the XLA compile time (measured on the
# Burgers example: adaptive-config compile 10 s -> 30 s, the r04 4x e2e
# wall regression — BENCHMARKS.md "Loop unrolling").  The README headline
# config (batch 100 x ~500 params = 5e4) sits comfortably inside; the
# large-batch/deep configs sit orders of magnitude outside.
_UNROLL_MAX_WORK = 200_000


def _loop_unroll(work=None, big_body=False):
    """Body-unroll factor for the compiled training loops.  Unrolling the
    (dynamic-trip) while loop's body 4x amortizes XLA loop bookkeeping —
    measured +10-12% sustained on the tiny-step headline config on v5e
    (BENCHMARKS.md "Loop unrolling").  The body runs in the same
    iteration order with the same guard snapshot/replay semantics
    (``converged_at``, iteration counts and stop indices match the plain
    loop exactly — pinned in tests/test_loop_unroll.py); floating-point
    results may differ at ULP level across unroll factors because XLA
    refuses the inlined bodies differently.

    Defaults: 4 on TPU in the tiny-step regime ONLY — ``work`` (batch x
    params) must be under ``_UNROLL_MAX_WORK`` and the body must not
    embed a linesearch/Gauss-Newton solve (``big_body``) — else 1; the
    win is a fixed ~us of loop bookkeeping per iteration, invisible
    outside that regime, while the compile cost of the 4x-inlined body
    is very visible (the r04 Burgers wall regression).  Always 1 on
    CPU — the CPU test suite is compile-time-bound.  Override:
    ``PYDENS_TPU_LOOP_UNROLL=n`` (applies everywhere, no regime gate)."""
    import os
    v = os.environ.get("PYDENS_TPU_LOOP_UNROLL")
    if v is not None:
        n = int(v)
        if n < 1:
            raise ValueError(f"PYDENS_TPU_LOOP_UNROLL={v!r} must be >= 1")
        return n
    if jax.default_backend() != "tpu" or big_body:
        return 1
    if work is not None and work > _UNROLL_MAX_WORK:
        return 1
    return 4


def _unrolled_fori(lo, hi, body_fn, state, k):
    """``fori_loop(lo, hi, body_fn, state)`` with the body unrolled
    ``k``-fold (from ``_loop_unroll``).  The trip count stays DYNAMIC (one
    compile serves every ``niters``): full unroll-blocks run in a while
    loop, the < unroll-size tail one-by-one.  Exactly the same body calls
    in exactly the same order as the plain fori."""
    if k == 1:
        return jax.lax.fori_loop(lo, hi, body_fn, state)
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    main_hi = lo + ((hi - lo) // k) * k

    def blk(st):
        i, s = st
        for j in range(k):
            s = body_fn(i + j, s)
        return (i + k, s)

    i, state = jax.lax.while_loop(lambda st: st[0] < main_hi, blk,
                                  (lo, state))
    return jax.lax.fori_loop(i, hi, body_fn, state)


def _leaf_fn(k):
    return lambda ls: ls[k]


def _as_residual_list(out):
    """Normalize an equation callable's return value: one residual or a
    tuple/list of coupled residuals (systems of equations)."""
    if isinstance(out, (tuple, list)):
        return list(out)
    if not isinstance(out, Expr) and hasattr(out, "__next__"):
        raise TypeError(
            "equation returned a generator; return a tuple/list of "
            "residuals instead")
    return [out]


def _mesh_axes(mesh, n_models):
    """Resolve (data_axes, model_axis) names for a mesh: an axis named
    'models' shards ensemble members (when n_models > 1); ALL other axes
    jointly shard the collocation batch (``data_axes`` is a tuple usable
    directly inside a ``PartitionSpec`` dim, so a 2-axis
    ``('dcn', 'data')`` mesh — slices over a slower interconnect times
    chips within a slice — shards the batch over the full device product
    instead of silently using only the first axis)."""
    names = list(mesh.axis_names)
    model_axis = "models" if ("models" in names and n_models > 1) else None
    data_axes = tuple(a for a in names if a != "models") or None
    return data_axes, model_axis


def _flatten_tree(tree):
    """Ravel-and-concatenate all leaves into one flat vector."""
    return jnp.concatenate([jnp.ravel(l) for l in jax.tree.leaves(tree)])


def _unflatten(spec, theta):
    """Rebuild the parameter pytree from a flat vector via static slices
    (free under XLA — they fold into the consuming ops)."""
    treedef, shapes, offsets = spec
    leaves = [theta[offsets[i]:offsets[i + 1]].reshape(shapes[i])
              for i in range(len(shapes))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _spec_from_tree(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = [tuple(l.shape) for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.cumsum([0] + sizes).tolist()
    return (treedef, shapes, offsets)


def _flatten_stacked(tree, K):
    """Flatten an ensemble-stacked pytree (every leaf has leading axis K)
    into a (K, P) matrix of per-model parameter vectors."""
    return jnp.concatenate([l.reshape(K, -1) for l in jax.tree.leaves(tree)],
                           axis=1)


def _unflatten_stacked(spec, thetas, K):
    treedef, shapes, offsets = spec
    leaves = [thetas[:, offsets[i]:offsets[i + 1]].reshape((K,) + shapes[i])
              for i in range(len(shapes))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _is_number(x):
    return isinstance(x, (int, float, np.integer, np.floating))


class _CtxShim:
    """``Solver.ctx`` compatibility object (see the property docstring)."""

    @staticmethod
    def run(fn, *args, **kwargs):
        return fn(*args, **kwargs)


class Solver:
    r"""Solver of differential equations with neural networks.

    Supports (i) common ODEs and PDEs, (ii) parametric families of equations
    and (iii) inverse problems with trainable coefficients — the full
    capability set of the reference ``Solver``
    (``/root/reference/pydens/model_torch.py:191-298`` docstring).

    Parameters
    ----------
    equation : callable
        Uses tokens ``D`` (differentiation), ``V`` (trainable variable) and
        jnp math to define the problem, e.g.::

            def pde(f, x, y):
                return D(D(f, x), x) + D(D(f, y), y) - 5 * jnp.sin(np.pi * (x + y))

    ndims : int
        Number of variables (including time, if any).
    initial_condition : callable or float, optional
        Initial condition over the spatial variables; enables the time-gate
        ansatz.  May use the ``V`` token for inverse problems.
    boundary_condition : float, optional
        Constant boundary condition, bound exactly by the ansatz.
    domain : tuple or list
        ``(lo, hi)`` for all dims or a per-dim list of pairs.
    nparams : int
        Number of sampled equation parameters (parametric families).
    model : class
        Model class (default :class:`ConvBlockModel`); receives all extra
        kwargs (``layout``, ``features``/``units``, ``activation``, ...).
    constraints : callable or sequence of callables, optional
        Extra loss terms ``constraint(f, *coords)`` where ``f`` is a forward
        closure evaluating the network at arbitrary points.
    seed : int, optional
        Seed for parameter init and device-side sampling (default 0).
    mesh : jax.sharding.Mesh, optional
        If given, the collocation batch is sharded over the mesh's first axis
        (data parallelism over ICI).  ``batch_size`` must divide the mesh
        size.
    n_models : int
        Train an ensemble of ``n_models`` independently-initialized networks
        simultaneously (one vmapped training step — small PINN nets leave
        the chip mostly idle, so the ensemble is nearly free).  ``predict``
        returns the ensemble mean; ``predict_std`` the pointwise epistemic
        uncertainty; ``predict_all`` every member.  V-token variables are
        per-model (coefficient uncertainty in inverse problems).
    formulation : str
        ``'residual'`` (default): the equation returns a strong-form
        residual, trained to zero in mean square.  ``'variational'``: the
        equation returns a Deep Ritz energy DENSITY whose Monte-Carlo mean
        is minimized directly — e.g. ``0.5 * D(f, x)**2 - source * f`` for
        ``-u'' = source``.  The exact-BC ansatz removes the boundary
        penalty the original method needs; only first-order derivatives
        appear for second-order PDEs.  Incompatible with ``fit(adaptive=)``
        and ``fit(causal=)`` (both rank strong-form residuals).
    """

    def __init__(self, equation, ndims, initial_condition=None,
                 boundary_condition=None, domain=(0, 1), nparams=0,
                 model=ConvBlockModel, constraints=None, seed=0, mesh=None,
                 n_models=1, formulation="residual", **kwargs):
        self.equation = equation
        self.n_models = int(n_models)
        if formulation not in ("residual", "variational"):
            raise ValueError(
                f"formulation must be 'residual' or 'variational', got "
                f"{formulation!r}")
        # 'variational' = Deep Ritz (E & Yu 2018): the equation callable
        # returns an ENERGY DENSITY e(f, x, ...) and training minimizes its
        # Monte-Carlo mean directly (no squaring) — for -Δu = f supply
        # e = 0.5*sum(D(f,xi)**2) - source*f, whose minimizer over the
        # exact-BC ansatz solves the PDE weakly.  Needs only first-order
        # taps for second-order problems and tolerates low-regularity
        # solutions the strong form cannot express.
        self.formulation = formulation
        if constraints is None:
            self.constraints = ()
        elif isinstance(constraints, (tuple, list)):
            self.constraints = tuple(constraints)
        else:
            self.constraints = (constraints,)
        self.losses = []
        self.history = []  # one record per fit call (observability superset
        #                    of the reference's bare `losses` list, SURVEY §5)
        self.last_balanced_weights = None  # set by load() from snapshots
        self.mesh = mesh
        # Multi-process (multi-host) mesh: the training step is already pure
        # SPMD, but host-side state must be assembled into global arrays —
        # see parallel/distributed.py.  Every process drives the Solver in
        # lockstep (the standard JAX multi-controller contract).
        self._mesh_mp = mesh is not None and is_multi_process(mesh)

        # Build the model (all kwargs forwarded, as in model_torch.py:312-313).
        self.model = model(**kwargs, ndims=ndims,
                           initial_condition=initial_condition,
                           boundary_condition=boundary_condition,
                           domain=domain, nparams=nparams)

        self._key = jax.random.key(0 if seed is None else seed)
        self._step_counter = 0
        self._opt = None
        self._opt_state = None
        self._pending_opt_state = None  # set by checkpoint load pre-fit
        self._opt_needs_value_fn = False
        self._opt_cache = {}
        self._step_cache = {}
        self._residual_jit = None
        self._grad_jit = None
        self._grid_eval_jit = None

        # Discover V-token variables with a fake run of model + equation +
        # constraints (superset of the reference, which only fake-runs the
        # equation: model_torch.py:319-325 — running constraints too means
        # variables used only there are still trained).  The fake run happens
        # under jax.eval_shape: it traces the whole residual abstractly (so
        # every V call executes and registers its variable) without compiling
        # or running a single op — including parameter INIT, which stays
        # abstract here; the real init below is ONE jitted executable
        # (per-layer eager init is a device round-trip per op, ~20 s of ctor
        # wall behind the TPU tunnel, measured round 5).
        init_key, self._key = jax.random.split(self._key)
        params = jax.eval_shape(self.model.init_params, init_key)
        registry = {}
        total = self.model.total
        dtype = self.model.dtype
        dummy = [jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(total)]

        plan_info = {}

        def _discover(params_, leaves):
            # Separate contexts: the equation's derivative-planning verdict
            # must not be poisoned by D-use inside constraints (which always
            # evaluate through the universal nested-jvp closures).
            ctx = EvalContext(leaves)
            f = Expr(lambda ls: self.model.apply_leaves(params_, ls),
                     ctx, deriv=())
            coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                      for k in range(total)]
            try:
                outs = [as_array(r)
                        for r in _as_residual_list(self.equation(f, *coords))]
            except TypeError as err:
                if "positional argument" in str(err):
                    raise TypeError(
                        f"equation callable must accept (f, *coords) with "
                        f"{total} coordinate argument(s) — one per variable "
                        f"and one per parameter (ndims={ndims} + "
                        f"nparams={nparams}): {err}") from None
                raise
            plan_info["ok"] = ctx.plan_ok
            plan_info["derivs"] = frozenset(ctx.derivs)
            ctx_c = EvalContext(leaves)
            coords_c = [Expr(_leaf_fn(k), ctx_c, leaf_index=k)
                        for k in range(total)]
            fwd = self._make_forward(params_, ctx_c)
            for constraint in self.constraints:
                outs.append(as_array(constraint(fwd, *coords_c)))
            return outs

        with variable_scope("create", registry):
            jax.eval_shape(_discover, params, dummy)
        # Derivative plan: valid when every D in the equation is a pure
        # field tap of order <= PLAN_MAX_ORDER and the model can
        # Taylor-propagate.
        self._plan_derivs = plan_info["derivs"]
        self._plan_ok = (plan_info["ok"] and bool(plan_info["derivs"])
                         and self.model.supports_taylor)
        params["variables"] = {
            name: jax.ShapeDtypeStruct(np.asarray(value).shape, dtype)
            for name, value in registry.items()}
        self._initial_variables = dict(registry)

        if getattr(self.model, "separable", False):
            # Grid-shape probe: trace the equation once on broadcast-shaped
            # axis leaves with DISTINCT sizes and reject any residual that
            # collapses a grid axis.  The classic trap is reference-style
            # component slicing `f[:, 0:1]` — axis 1 of a separable field is
            # a GRID axis, so that silently trains on a wrong slice; the
            # portable spelling `f[..., k:k+1]` works for both model kinds.
            sizes = tuple(2 + k for k in range(total))
            grid_dummy = [
                jax.ShapeDtypeStruct(
                    (1,) * k + (sizes[k],) + (1,) * (total - k), dtype)
                for k in range(total)]

            def _grid_probe(params_, leaves):
                ctx = EvalContext(leaves)
                f = Expr(lambda ls: self.model.apply_leaves(params_, ls),
                         ctx, deriv=())
                coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                          for k in range(total)]
                return [as_array(r)
                        for r in _as_residual_list(self.equation(f, *coords))]

            with variable_scope("read", registry):
                res_shapes = jax.eval_shape(_grid_probe, params, grid_dummy)
            for j, r in enumerate(res_shapes):
                if tuple(r.shape[:total]) != sizes:
                    raise ValueError(
                        f"residual {j} of the equation has shape {r.shape} "
                        f"on a {sizes} collocation grid — a grid axis was "
                        "collapsed.  On a separable model the field is "
                        "grid-shaped: slice solution components with "
                        "f[..., k:k+1] (not the pointwise f[:, k:k+1]) and "
                        "keep all math elementwise/broadcasting")

        # Single-model parameter template (defines the flatten spec and the
        # per-model structure even when training an ensemble).
        self._param_template = jax.eval_shape(lambda p: p, params)
        spec = _spec_from_tree(self._param_template)

        # Jitted param-management helpers: setup work (flatten/unflatten,
        # fresh init) must not run op-by-op eagerly — each eager dispatch is
        # a device round-trip, which dominates when the chip is remote.
        K = self.n_models
        if K > 1:
            # Ensemble: K independently-initialized models trained
            # simultaneously by vmapping the training step — small PINN nets
            # underutilize the chip, so an ensemble is nearly free and gives
            # epistemic uncertainty (no reference counterpart).
            def make_params(key, variables):
                keys = jax.random.split(key, K)
                return jax.vmap(
                    lambda k: self.model.init_params(k, variables))(keys)

            self._flatten_jit = jax.jit(functools.partial(
                _flatten_stacked, K=K))
            self._unflatten_jit = jax.jit(
                lambda th: _unflatten_stacked(spec, th, K))
        else:
            def make_params(key, variables):
                return self.model.init_params(key, variables)

            self._flatten_jit = jax.jit(_flatten_tree)
            self._unflatten_jit = jax.jit(lambda th: _unflatten(spec, th))
        self._init_params_jit = jax.jit(make_params)
        init2_key, self._key = jax.random.split(self._key)
        # Materialize the real parameters as ONE device dispatch (K == 1
        # reuses the discovery key, so values match what the old eager init
        # produced up to XLA fusion).
        self.model.params = self._init_params_jit(
            init2_key if K > 1 else init_key, self._initial_variables)
        self.model.ensemble_size = K

    # -- public state -------------------------------------------------------
    @property
    def params(self):
        """The full parameter pytree (net + log_scale + V variables)."""
        return self.model.params

    def reset(self, seed=None):
        """Re-initialize parameters and V variables, clear the loss history
        and optimizer state — but keep compiled step functions, so a
        subsequent ``fit`` with the same configuration runs without
        recompiling.  Useful for restarts and benchmarking."""
        if seed is not None:
            self._key = jax.random.key(seed)
        init_key, self._key = jax.random.split(self._key)
        self.model.params = self._init_params_jit(
            init_key, self._initial_variables)
        self.losses = []
        self.history = []
        self._opt_state = None
        self._pending_opt_state = None
        self._opt = None
        self._step_counter = 0
        return self

    @property
    def optimizer(self):
        return self._opt

    @property
    def ctx(self):
        """Migration shim for the reference's ``solver.ctx.run(fn, *args)``
        idiom (examples notebook; the reference snapshots a contextvars
        context so ``V`` resolves inside user calls,
        ``model_torch.py:316-317,486``).  The rebuild needs no ambient
        context — V variables live in the parameter pytree and the model
        reads them itself — so ``run`` simply invokes the callable:
        ``solver.ctx.run(solver.model, xs)`` ≡ ``solver.model(xs)``."""
        return _CtxShim()

    # ------------------------------------------------------------------
    # input normalization
    # ------------------------------------------------------------------
    @classmethod
    def reshape_and_concat(cls, tensors):
        """Cast, reshape and concatenate mixed inputs to an ``(N, D)`` float32
        array — behavioral port of ``model_torch.py:327-362`` including its
        quirks: batch size is the max element count; scalars are tiled;
        arrays whose size mismatches the batch are tiled *from their first
        element* (``:355-357``); lists become columns as-is.
        """
        xs = []
        torch_origin = []
        for x in tensors:
            was_torch = hasattr(x, "detach")  # torch tensor
            if was_torch:
                x = x.detach().cpu().numpy()
            elif isinstance(x, jax.Array):
                x = np.asarray(x)
            xs.append(x)
            torch_origin.append(was_torch)

        sizes = ([int(np.prod(x.shape)) for x in xs
                  if isinstance(x, np.ndarray)]
                 + [int(np.prod(np.asarray(x).shape)) for x in xs
                    if isinstance(x, (tuple, list))])
        batch_size = int(np.max(sizes)) if sizes else 1

        cols = []
        for x, was_torch in zip(xs, torch_origin):
            if _is_number(x):
                col = np.tile(np.float32(x), (batch_size, 1))
            elif isinstance(x, np.ndarray):
                if x.size != batch_size:
                    if was_torch:
                        # Quirk parity: the reference `view(-1, 1)`s torch
                        # tensors WITHOUT tiling, so torch.cat raises on a
                        # size mismatch (model_torch.py:352-362) — only
                        # numpy arrays get the first-element tiling quirk.
                        raise ValueError(
                            f"torch tensor with {x.size} elements cannot be "
                            f"concatenated with batch size {batch_size} "
                            "(sizes must match)")
                    x = np.tile(np.ravel(x)[0], (batch_size, 1))
                col = np.asarray(x, np.float32).reshape(batch_size, 1)
            elif isinstance(x, (list, tuple)):
                col = np.asarray(x, np.float32).reshape(-1, 1)
            else:
                raise TypeError(f"cannot interpret input of type {type(x)!r}")
            cols.append(col)
        return np.concatenate(cols, axis=1).astype(np.float32)

    def _concat_traced(self, vals):
        """Traced (jit-safe) analogue of :meth:`reshape_and_concat` used by
        constraint forward closures (``_forward``, ``model_torch.py:451-457``).
        Shapes are static under trace, so the same tiling rules apply."""
        dtype = self.model.dtype
        norm = []
        for x in vals:
            if hasattr(x, "detach"):
                x = np.asarray(x.detach().cpu().numpy())
            norm.append(x)
        counts = [int(np.prod(np.shape(x))) for x in norm
                  if not _is_number(x)]
        batch = max(counts, default=1)
        cols = []
        for x in norm:
            if _is_number(x):
                col = jnp.full((batch, 1), x, dtype)
            else:
                x = jnp.asarray(x, dtype)
                if x.size != batch:
                    col = jnp.broadcast_to(jnp.ravel(x)[0], (batch, 1))
                else:
                    col = x.reshape(batch, 1)
            cols.append(col.astype(dtype))
        return jnp.concatenate(cols, axis=1)

    def _make_forward(self, params, ctx):
        """Forward closure handed to constraints: evaluates the model at
        arbitrary points.  If any argument is a coordinate expression, the
        result is a differentiable :class:`Expr`, so ``D`` works inside
        constraints too.  ``fwd.grad(*pts, wrt=k)`` evaluates the solution's
        derivative w.r.t. coordinate column ``k`` at fixed points — the
        building block for Neumann/Robin boundary conditions (superset of
        the reference's ``_forward``, ``model_torch.py:451-457``).  ``wrt``
        also accepts a multi-index tuple, e.g. ``wrt=(0, 0)`` for the
        second derivative (bending-moment conditions ``u_xx = 0`` of
        simply-supported beams/plates)."""
        model = self.model

        def fwd(*pts):
            if any(isinstance(p, Expr) for p in pts):
                def fn(ls):
                    vals = [p.fn(ls) if isinstance(p, Expr) else p
                            for p in pts]
                    return model.apply(params, self._concat_traced(vals))
                return Expr(fn, ctx)
            return model.apply(params, self._concat_traced(list(pts)))

        def fwd_grad(*pts, wrt=0):
            xs_c = self._concat_traced(
                [p.value if isinstance(p, Expr) else p for p in pts])
            multi = ((wrt,) if isinstance(wrt, (int, np.integer))
                     else tuple(wrt))

            def tap(k, inner):
                def tapped(z):
                    tangent = jnp.zeros_like(z).at[:, k].set(1.0)
                    return jax.jvp(inner, (z,), (tangent,))[1]
                return tapped

            g = lambda z: model.apply(params, z)
            for k in multi:
                g = tap(k, g)
            return g(xs_c)

        fwd.grad = fwd_grad
        return fwd

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _build_loss_fn(self, loss_terms, criterion, use_plan=False,
                       causal=None):
        """Build the total-loss function.

        ``loss_terms`` is a tuple of ``(term_name, weight)`` pairs (weights
        default to 1.0 — the reference supports only unweighted term lists,
        ``model_torch.py:441-457``; dict-with-weights is a superset).

        ``use_plan=True`` activates the Taylor-mode fast path: all pure
        field taps the equation needs (collected at init) are computed in
        ONE batched-tangent network traversal instead of nested-jvp
        re-traversals — measured 1.25-1.6x faster per full training
        iteration in its (small-batch) regime, order 2 through 4
        (BENCHMARKS.md "Taylor-mode derivative planning").  It is
        exact (same jaxpr-level math, differential-tested) and only valid
        when ``self._plan_ok``.
        """
        equation = self.equation
        constraints = self.constraints
        model = self.model
        total = model.total
        dtype = model.dtype
        variational = self.formulation == "variational"
        plan_derivs = self._plan_derivs if use_plan else None
        eq_weight = dict(loss_terms).get("equation")
        import re
        nums = []
        for term, w in loss_terms:
            if "constraint" not in term:
                continue  # reference quirk: unknown non-constraint names
                #           in the list form are silently dropped
            m = re.fullmatch(r"constraint_?(\d+)", term)
            if m is None:
                raise ValueError(
                    f"malformed loss term {term!r}; expected "
                    "'constraint_<k>' (e.g. 'constraint_0')")
            nums.append((int(m.group(1)), w))
        for num, _ in nums:
            if num >= len(constraints):
                raise ValueError(
                    f"loss term 'constraint_{num}' requested but only "
                    f"{len(constraints)} constraints were supplied to Solver")

        def make_ctx(params, leaves):
            """Context for equation evaluation; under a plan the field-tap
            table is precomputed by one Taylor propagation."""
            table = None
            if plan_derivs is not None:
                table = model.full_taps(
                    params, jnp.concatenate(leaves, axis=1), plan_derivs)
            return EvalContext(leaves, table=table)

        def point_residual(params, leaves):
            """Per-point |equation residual| (summed over a system's
            components) — used by adaptive sampling and diagnostics.
            Under ``formulation='variational'`` the equation output is an
            energy density, so this is |density| (diagnostics only —
            adaptive sampling is rejected in that mode)."""
            with variable_scope("read", params["variables"]):
                ctx = make_ctx(params, leaves)
                f = Expr(lambda ls: model.apply_leaves(params, ls),
                         ctx, deriv=())
                coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                          for k in range(total)]
                acc = jnp.zeros_like(leaves[0])
                for res in _as_residual_list(equation(f, *coords)):
                    acc = acc + jnp.sum(jnp.abs(as_array(res)), axis=1,
                                        keepdims=True)
            return acc

        # Static term order (and default weights): equation first, then the
        # requested constraints — shared by the weighted sum and the
        # grad-norm loss balancer.
        term_order = (([("equation", eq_weight)]
                       if eq_weight is not None else [])
                      + [(f"constraint_{num}", w) for num, w in nums])

        def loss_fn(params, leaves, point_weight=None, term_weights=None,
                    causal_eps=None):
            """Total loss; ``term_weights`` (a traced ``(n_terms,)`` vector)
            overrides the static per-term weights — the hook the grad-norm
            loss balancer uses (a one-hot vector isolates one term's
            gradient).  ``causal_eps`` is the (traced, runtime) causal
            temperature — dynamic so annealing eps across fit calls never
            recompiles."""
            with variable_scope("read", params["variables"]):
                ctx = make_ctx(params, leaves)
                f = Expr(lambda ls: model.apply_leaves(params, ls),
                         ctx, deriv=())
                coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                          for k in range(total)]
                terms = []
                if (eq_weight is not None and causal is not None
                        and leaves[0].ndim > 2):
                    # Causal weighting on a separable grid: the time axis is
                    # an explicit grid axis, so instead of the pointwise
                    # 32-bin histogram each time SAMPLE gets its exact
                    # slice-mean residual; weights follow the same
                    # exp(-eps * normalized cumulative earlier-residual)
                    # schedule (time samples sorted by value — they arrive
                    # unsorted from the axis sampler), stop_gradient'ed and
                    # self-normalized exactly like the pointwise form, so
                    # eps=0 is plain MSE and eps anneals without recompiles.
                    t_idx, t_lo, t_hi = causal
                    eps = causal_eps
                    sq = jnp.asarray(0.0, dtype)
                    for res in _as_residual_list(equation(f, *coords)):
                        res = as_array(res)
                        if res.ndim == total:  # component axis already gone
                            res = res[..., None]
                        sq = sq + jnp.mean(res * res, axis=-1)
                    other = tuple(a for a in range(total) if a != t_idx)
                    L = jnp.mean(sq, axis=other)  # (N_t,) slice means
                    tvals = leaves[t_idx].reshape(-1)
                    order = jnp.argsort(tvals)
                    cum = jnp.concatenate([jnp.zeros((1,), dtype),
                                           jnp.cumsum(L[order])[:-1]])
                    cum = cum / jnp.maximum(cum[-1] + L[order][-1], 1e-30)
                    w_sorted = jnp.exp(-eps * cum)
                    w = jnp.zeros_like(w_sorted).at[order].set(w_sorted)
                    w = jax.lax.stop_gradient(w)
                    w_b = w.reshape((1,) * t_idx + (-1,)
                                    + (1,) * (total - 1 - t_idx))
                    n_other = sq.size // w.size  # static grid cross-section
                    terms.append(jnp.sum(w_b * sq)
                                 / jnp.maximum(jnp.sum(w) * n_other, 1e-30))
                elif eq_weight is not None and causal is not None:
                    # Causal weighting (Wang/Sankaran/Perdikaris-style):
                    # partition the batch into M time bins; bin i's mean
                    # squared residual L_i is down-weighted by
                    # ``w_i = exp(-eps * sum_{j<i} L_j)`` so the optimizer
                    # cannot satisfy late times before earlier ones are
                    # solved — the classic failure mode of
                    # advection-dominated PINNs.  Binning (vs per-point
                    # cumsum) matches the literature and keeps the weights
                    # smooth under minibatch noise.  The weights are
                    # stop_gradient'ed (they schedule, not differentiate)
                    # and the loss self-normalizes so its scale stays
                    # comparable to plain MSE; eps=0 reduces exactly to the
                    # MSE over bin means.  The exact-IC ansatz anchors t0,
                    # which the scheme assumes.
                    t_idx, t_lo, t_hi = causal
                    eps = causal_eps
                    n_bins = 32
                    n_pts = leaves[0].shape[0]
                    sq = jnp.zeros((n_pts,), dtype)
                    for res in _as_residual_list(equation(f, *coords)):
                        res = as_array(res)
                        # Per-component MEAN (not sum): keeps eps=0 equal
                        # to the plain MSE path for vector-valued
                        # residuals too (the criterion averages over
                        # elements, so a sum here would scale the loss by
                        # n_out and silently change the effective lr when
                        # toggling causal).
                        sq = sq + jnp.mean(res * res, axis=1)
                    tcol = (leaves[t_idx][:, 0] - t_lo) / (t_hi - t_lo)
                    bins = jnp.clip((tcol * n_bins).astype(jnp.int32),
                                    0, n_bins - 1)
                    sums = jax.ops.segment_sum(sq, bins, n_bins)
                    counts = jax.ops.segment_sum(
                        jnp.ones_like(sq), bins, n_bins)
                    L = sums / jnp.maximum(counts, 1.0)
                    cum = jnp.concatenate([jnp.zeros((1,), dtype),
                                           jnp.cumsum(L)[:-1]])
                    # Scale-free temperature: normalize the cumulative
                    # residual by its total, so ``w`` spans ~[exp(-eps), 1]
                    # regardless of the equation's raw residual magnitude
                    # (raw-scale eps collapses all but the first bin when
                    # residuals are O(100) — measured).  As early bins
                    # converge their share of the total shrinks, so the
                    # causal front advances automatically.
                    cum = cum / jnp.maximum(cum[-1] + L[-1], 1e-30)
                    w = jax.lax.stop_gradient(jnp.exp(-eps * cum))
                    # Apply the bin weight per point and self-normalize:
                    # keeps per-point SGD semantics and reduces EXACTLY to
                    # the plain MSE at eps=0 (w == 1), so eps can be
                    # annealed against an MSE-comparable loss scale.
                    w_pt = w[bins]
                    terms.append(jnp.sum(w_pt * sq)
                                 / jnp.maximum(jnp.sum(w_pt), 1e-30))
                elif eq_weight is not None and variational:
                    # Deep Ritz: the equation output is an energy density;
                    # the term is its plain Monte-Carlo mean (it may be
                    # negative — the energy minimum generally is).  Systems
                    # sum their densities.  fit() rejects adaptive/causal in
                    # this formulation, so point_weight is never set here.
                    acc = jnp.asarray(0.0, dtype)
                    for res in _as_residual_list(equation(f, *coords)):
                        acc = acc + jnp.mean(as_array(res))
                    terms.append(acc)
                elif eq_weight is not None:
                    # The equation may return one residual or a tuple/list of
                    # coupled residuals (systems of equations — a superset of
                    # the scalar-only reference).
                    acc = jnp.asarray(0.0, dtype)
                    for res in _as_residual_list(equation(f, *coords)):
                        res = as_array(res)
                        if point_weight is not None:
                            # Importance weights from adaptive sampling:
                            # scaling by sqrt(w) keeps the (MSE) loss an
                            # unbiased estimate of the uniform residual loss.
                            res = res * jnp.sqrt(point_weight)[:, None]
                        acc = acc + criterion(res, jnp.zeros_like(leaves[0]))
                    terms.append(acc)
                if nums:
                    fwd = self._make_forward(params, ctx)
                    for num, _ in nums:
                        c = as_array(constraints[num](fwd, *coords))
                        terms.append(criterion(c, jnp.zeros((1,), dtype)))
                loss = jnp.asarray(0.0, dtype)
                for j, t in enumerate(terms):
                    w = (term_order[j][1] if term_weights is None
                         else term_weights[j])
                    loss = loss + w * t
            return loss

        def resvec_fn(params, leaves):
            """Stacked scaled residual vector r with ``loss_fn == sum(r**2)``
            exactly (MSE criterion, plain weighting): each term's residual
            block is flattened and scaled by ``sqrt(weight / block.size)``,
            so the Gauss-Newton normal equations target the same objective
            the first-order phase minimized.  Used only by the LM optimizer
            (fit rejects causal/adaptive/rba/variational there)."""
            with variable_scope("read", params["variables"]):
                ctx = make_ctx(params, leaves)
                f = Expr(lambda ls: model.apply_leaves(params, ls),
                         ctx, deriv=())
                coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                          for k in range(total)]
                blocks = []
                if eq_weight is not None:
                    for res in _as_residual_list(equation(f, *coords)):
                        res = as_array(res)
                        blocks.append(res.reshape(-1)
                                      * (eq_weight / res.size) ** 0.5)
                if nums:
                    fwd = self._make_forward(params, ctx)
                    for num, w in nums:
                        c = as_array(constraints[num](fwd, *coords))
                        blocks.append(c.reshape(-1) * (w / c.size) ** 0.5)
            if not blocks:
                return jnp.zeros((1,), dtype)
            return jnp.concatenate(blocks)

        def term_blocks_fn(params, leaves):
            """Per-term flattened residual blocks, each scaled by
            ``1/sqrt(size)`` (MSE normalization; static term weights NOT
            applied), ordered exactly like ``term_order``.  For term j,
            ``sum(block_j**2)`` equals its unweighted MSE, so the squared
            Frobenius norm of ``d block_j / d theta`` is the (size-
            normalized) NTK trace ``tr(K_j)`` that
            ``fit(loss_balancing='ntk')`` estimates with Rademacher
            probes.  A system's coupled equation residuals concatenate
            into ONE equation block — they are one loss term."""
            with variable_scope("read", params["variables"]):
                ctx = make_ctx(params, leaves)
                f = Expr(lambda ls: model.apply_leaves(params, ls),
                         ctx, deriv=())
                coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                          for k in range(total)]
                blocks = []
                if eq_weight is not None:
                    # Per-residual 1/sqrt(size) scaling, matching loss_fn's
                    # sum of per-residual MEANS for coupled systems (a
                    # whole-block 1/sqrt(total) would make sum(block**2)
                    # 1/k of the actual k-residual equation term and bias
                    # the NTK traces low by k).  Same template as resvec_fn.
                    eq = [as_array(r).reshape(-1)
                          for r in _as_residual_list(equation(f, *coords))]
                    eq = [r * (1.0 / r.size) ** 0.5 for r in eq]
                    blocks.append(jnp.concatenate(eq) if len(eq) > 1
                                  else eq[0])
                if nums:
                    fwd = self._make_forward(params, ctx)
                    for num, _ in nums:
                        c = as_array(
                            constraints[num](fwd, *coords)).reshape(-1)
                        blocks.append(c * (1.0 / c.size) ** 0.5)
            return tuple(blocks)

        loss_fn.term_order = term_order
        resvec_fn.term_blocks = term_blocks_fn
        return loss_fn, point_residual, resvec_fn

    def _flatten_spec(self):
        """Single-model flatten spec (ensemble stacking sits outside it)."""
        return _spec_from_tree(self._param_template)

    def _auto_use_plan(self, batch_size):
        """``fast_taps='auto'`` batch-regime decision (measured,
        BENCHMARKS.md "Taylor plan batch regime"): the plan's stacked tap
        state streams through HBM, so at large batch the XLA-fused
        nested-jvp chains win (the step is bandwidth-bound there); at small
        batch the plan's single traversal wins (per-op overhead dominates).
        Crossover measured at ~2M stacked f32 elements on v5e; the ensemble
        vmaps the traversal, scaling the state ``n_models``-fold."""
        n_blocks = 1 + len(self.model.plan_closure(self._plan_derivs))
        width = max(getattr(self.model, "features", None)
                    or [self.model.total])
        return (self.n_models * int(batch_size) * n_blocks * width
                <= _PLAN_AUTO_MAX_ELEMENTS)

    def _build_step_fn(self, cfg):
        """Build (and cache) the jitted chunk runner.

        The runner is a ``fori_loop`` with a *traced* trip count and a
        fixed-size per-iteration loss buffer, so one XLA compilation serves
        every ``niters``/chunk-remainder combination — on a real TPU, where a
        compile costs tens of seconds, each training configuration compiles
        exactly once.
        """
        import os
        # Effective unroll for THIS config (tiny-step regime only; see
        # _loop_unroll): work = collocation points per iteration x params
        # x ensemble members; adaptive refinement evaluates residuals on
        # r x batch CANDIDATE points per iteration, so the multiplier
        # enters the estimate too; linesearch/Gauss-Newton bodies never
        # unroll.
        _sep = getattr(self.model, "separable", False)
        _pts = (int(cfg["batch_size"]) ** self.model.total if _sep
                else int(cfg["batch_size"]))
        _pts *= int(cfg["adaptive"] or 1)
        unroll = _loop_unroll(
            work=_pts * int(self._flatten_spec()[2][-1]) * self.n_models,
            big_body=bool(cfg["needs_value_fn"])
            or isinstance(cfg["opt"], LMConfig))
        key = (cfg["batch_size"], cfg["chunk"], cfg["loss_terms"],
               cfg["criterion_key"], id(cfg["opt"]), cfg["mask_key"],
               cfg["sampler_key"], cfg["resample"], cfg["adaptive"],
               cfg["use_plan"], cfg["balance_every"],
               cfg.get("balance_mode", "grad"), cfg["stop_on_nan"],
               cfg["causal"], cfg["rba"],
               # The fused-Taylor decision happens at trace time inside the
               # model; key the EFFECTIVE toggle (reachable only on the plan
               # path, and only the exact value 'always' turns it on —
               # models/base.py:_fused_taylor_for) so equivalent-off spellings
               # or toggles on non-plan fits don't force spurious recompiles.
               cfg["use_plan"] and
               os.environ.get("PYDENS_TPU_FUSED_TAYLOR") == "always",
               # ... and the kernel's stacked/per-stream layout knob, read
               # at trace time inside it (ops/pallas_taylor.py) — keyed so
               # an A/B toggle between fits re-traces instead of silently
               # reusing the other layout's executable.
               (os.environ.get("PYDENS_TPU_TAYLOR_STACKED")
                if cfg["use_plan"] and
                os.environ.get("PYDENS_TPU_FUSED_TAYLOR") == "always"
                else None),
               # Trace-time loop-unroll factor (env/backend/regime-
               # dependent): keyed so changing it between fits recompiles
               # instead of silently reusing the other factor's executable.
               unroll,
               id(self.mesh) if self.mesh is not None else None)
        if key in self._step_cache:
            return self._step_cache[key]

        loss_fn, point_residual, resvec_fn = self._build_loss_fn(
            cfg["loss_terms"], cfg["criterion"], use_plan=cfg["use_plan"],
            causal=cfg["causal"])
        balance_every = cfg["balance_every"]
        n_terms = len(loss_fn.term_order)
        static_weights = np.asarray([w for _, w in loss_fn.term_order],
                                    np.float32)
        # Anchor for grad-norm balancing: the equation term when present
        # (its weight stays at the user's value; the others adapt to it).
        anchor_idx = 0
        adaptive = cfg["adaptive"]
        rba = cfg["rba"]
        opt = cfg["opt"]
        mask = cfg["mask"]
        all_trainable = all(jax.tree.leaves(mask))
        batch_size = cfg["batch_size"]
        chunk = cfg["chunk"]
        total = self.model.total
        dtype = self.model.dtype
        sampler = cfg["sampler"]
        # Separable models train on the tensor-product grid of per-axis
        # samples: column c of the (batch, total) sample becomes axis c's
        # points (batch_size = points PER AXIS; batch_size**total effective
        # collocation points per iteration).  The default sampler draws
        # U(domain) per axis — the reference's ignore-domain quirk is a
        # pointwise-parity behavior; SeparableModel has no reference
        # counterpart, so it samples the declared domain (parameter columns
        # stay U(0, 1)).
        separable = getattr(self.model, "separable", False)
        if separable:
            dom = (list(self.model.domain)
                   + [(0.0, 1.0)] * self.model.nparams)
            sep_lo = np.asarray([d[0] for d in dom], np.float32)
            sep_span = np.asarray([d[1] - d[0] for d in dom], np.float32)
        device_sampling = cfg["sampler_key"] != "host"
        resample = cfg["resample"]
        needs_value_fn = cfg["needs_value_fn"]
        mesh = self.mesh
        data_axes = model_axis = None
        if mesh is not None:
            data_axes, model_axis = _mesh_axes(mesh, self.n_models)
            # All non-model axes jointly shard the batch dim (a tuple in
            # one PartitionSpec slot) — on a multi-slice ('dcn', 'data')
            # mesh the per-step all-reduce then rides ICI within slices
            # and crosses DCN once, which XLA composes automatically.
            batch_sharding = (NamedSharding(mesh, P(data_axes, None))
                              if data_axes else None)
            theta_sharding = (NamedSharding(mesh, P(model_axis, None))
                              if model_axis else None)

        # The training state is ONE flat parameter vector: the while-loop
        # carry shrinks from ~3 buffers per leaf to 3 total and the optimizer
        # update becomes a handful of fused vector ops — at PINN sizes,
        # per-buffer/per-op overhead inside the compiled loop dominates, and
        # this layout measured ~3x faster than the per-leaf pytree carry on
        # a v5e chip.  `unflatten` uses static slices, which XLA folds away.
        flatten_spec = self._flatten_spec()
        n_models = self.n_models

        def flat_loss(theta, leaves, point_weight=None, term_weights=None,
                      ceps=None):
            return loss_fn(_unflatten(flatten_spec, theta), leaves,
                           point_weight, term_weights, ceps)

        def flat_residual(theta, leaves):
            return point_residual(_unflatten(flatten_spec, theta), leaves)

        def flat_resvec(theta, leaves):
            return resvec_fn(_unflatten(flatten_spec, theta), leaves)

        balance_mode = cfg.get("balance_mode", "grad")
        term_blocks_fn = resvec_fn.term_blocks

        def flat_term_blocks(theta, leaves):
            return term_blocks_fn(_unflatten(flatten_spec, theta), leaves)

        # Levenberg-Marquardt routes around optax entirely: its update needs
        # the residual VECTOR function (for matrix-free JᵀJ products), not a
        # scalar loss/grad, and its only state is the damping scalar (which
        # rides in the carry's opt_state slot).
        gn = opt if isinstance(opt, LMConfig) else None

        stop_on_nan = cfg["stop_on_nan"]

        def run_chunk(carry, base_key, start, fit_start, n, host_pts,
                      causal_eps, tol):
            """Run ``n <= chunk`` training steps; returns the new carry, a
            ``(chunk,)`` loss buffer and the number of iterations actually
            run (< ``n`` only when the guard tripped: the loss went
            non-finite, or dropped to ``tol`` or below — ``fit(until_loss=)``
            convergence-targeted training.  ``tol`` is a traced runtime
            scalar (-inf when unused), so changing it never recompiles; the
            triggering loss is included in the valid prefix as evidence)."""
            n_batches = 1 if (adaptive or not resample) else chunk
            if device_sampling:
                # Sample the whole chunk's collocation points in one RNG op
                # (one big fused kernel beats `chunk` tiny per-step ones —
                # per-HLO-op overhead dominates at PINN batch sizes).  With
                # resample=False a single batch is drawn and reused every
                # iteration (full-batch training, e.g. for L-BFGS).
                chunk_key = jax.random.fold_in(base_key, 0 if not resample
                                               else start)
                if sampler is None:
                    # Reference parity quirk: the default sampler is U(0,1)
                    # per dim and IGNORES `domain` (model_torch.py:431).
                    pts_all = jax.random.uniform(
                        chunk_key, (n_batches, batch_size, total), dtype)
                    if separable:  # no quirk to keep: sample the domain
                        pts_all = sep_lo + sep_span * pts_all
                else:
                    pts_all = jnp.asarray(
                        sampler.sample_device(chunk_key,
                                              n_batches * batch_size),
                        dtype).reshape(n_batches, batch_size, total)
            else:
                pts_all = host_pts  # pre-sampled (n_batches, batch, total)

            if not all_trainable:
                mask_vec = _flatten_tree(
                    jax.tree.map(
                        lambda m, t: jnp.full(t.shape, m, dtype),
                        mask, self._param_template))

            def _anchored_ema(stat, wts):
                """Shared tail of both balancing modes ("differ only in the
                per-term scale statistic" is structural, not aspirational):
                inverse-statistic weights anchored at the equation term's
                static weight, clipped to two decades around the anchor (a
                nearly-satisfied term's statistic collapses and the raw
                inverse ratio would amplify that term's stochastic noise
                until it dominates — measured: weight 1900x, solution
                destroyed), anchor re-pinned, then EMA-smoothed.  The cast
                back matters: stat x np.float32 weights promote to f32, and
                lax.cond requires both branches to return identical avals
                (non-f32 models would crash at trace time)."""
                lam = (stat[anchor_idx] / (stat + 1e-12)
                       * static_weights[anchor_idx])
                lam = jnp.clip(lam, 0.01 * static_weights[anchor_idx],
                               100.0 * static_weights[anchor_idx])
                lam = lam.at[anchor_idx].set(static_weights[anchor_idx])
                return (0.7 * wts + 0.3 * lam).astype(wts.dtype)

            def rebalance(theta, leaves, point_weight, wts):
                """Grad-norm loss balancing (Wang/Teng/Perdikaris-style):
                per-term mean |grad| via one-hot term weights, constraint
                weights pulled toward anchor_norm/term_norm x anchor_weight,
                EMA-smoothed.  Runs every ``balance_every`` iterations —
                n_terms extra backward passes, amortized to noise."""
                norms = []
                for j in range(n_terms):
                    one_hot = jnp.zeros((n_terms,), dtype).at[j].set(1.0)
                    if n_models > 1:
                        g = jax.vmap(jax.grad(flat_loss),
                                     in_axes=(0, None, None, None, None))(
                            theta, leaves, point_weight, one_hot, causal_eps)
                    else:
                        g = jax.grad(flat_loss)(theta, leaves, point_weight,
                                                one_hot, causal_eps)
                    if not all_trainable:
                        g = g * mask_vec
                    norms.append(jnp.mean(jnp.abs(g)))
                return _anchored_ema(jnp.stack(norms), wts)

            def rebalance_ntk(theta, key, leaves, wts):
                """NTK-trace loss balancing (Wang/Yu/Perdikaris, arXiv
                2007.14527 §4: lambda_j ∝ 1/tr(K_j)): each term's NTK trace
                ``tr(K_j) = ||d r_j / d theta||_F^2`` is computed matrix-
                free through ONE vjp pullback of the stacked per-term
                residual blocks.  Probes live in RESIDUAL space
                (``E_u ||J_j^T u||^2 == tr(K_j)`` for Rademacher ``u``),
                where the Hutchinson variance is the OFF-diagonal mass of
                the NTK itself — near zero for the diagonal-dominant
                kernels PINN nets have — instead of the off-diagonal mass
                of the (P x P, never diagonal) parameter-space Gram matrix;
                terms whose residual block is small (pointwise boundary
                constraints) enumerate the standard basis outright, making
                their traces EXACT.  Weights are anchored at the equation
                term's static weight, decade-clipped and EMA-smoothed
                exactly like the grad-norm mode, so the two modes differ
                only in the per-term scale statistic (squared Jacobian
                Frobenius norms vs mean gradient magnitudes)."""
                def blocks(th):
                    return flat_term_blocks(th, leaves)

                def traces_one(th, k):
                    res, pull = jax.vjp(blocks, th)

                    def sq_pullback(ct_list):
                        g, = pull(tuple(ct_list))
                        if not all_trainable:
                            # Frozen coordinates do not move, so they are
                            # not part of the kernel the training dynamics
                            # see — drop their components.
                            g = g * mask_vec
                        return jnp.sum(g * g)

                    traces = []
                    for j, r in enumerate(res):
                        zeros = [jnp.zeros_like(x) for x in res]
                        if r.size <= _NTK_PROBES:
                            # Exact: tr(K_j) = sum_i ||J_j^T e_i||^2.
                            acc = jnp.asarray(0.0, dtype)
                            for i in range(r.size):
                                ct = list(zeros)
                                ct[j] = jnp.zeros_like(r).at[i].set(1.0)
                                acc = acc + sq_pullback(ct)
                            traces.append(acc)
                        else:
                            acc = jnp.asarray(0.0, dtype)
                            for p in range(_NTK_PROBES):
                                u = jax.random.rademacher(
                                    jax.random.fold_in(k, j * _NTK_PROBES
                                                       + p),
                                    r.shape, dtype)
                                ct = list(zeros)
                                ct[j] = u
                                acc = acc + sq_pullback(ct)
                            traces.append(acc / _NTK_PROBES)
                    return jnp.stack(traces)

                if n_models > 1:
                    keys = jax.random.split(key, n_models)
                    traces = jax.vmap(traces_one)(theta, keys).mean(axis=0)
                else:
                    traces = traces_one(theta, key)
                return _anchored_ema(traces, wts)

            def body(i, state):
                # Carry layout: (theta, opt_state[, wts][, rba_w]) — the
                # optional tails keyed by the static balance_every/rba cfg.
                carry_t, losses = state
                theta, opt_state = carry_t[0], carry_t[1]
                wts = carry_t[2] if balance_every else None
                rba_w = carry_t[-1] if rba else None
                if adaptive:
                    # Residual-based adaptive refinement: draw `adaptive` x
                    # batch candidates and build a hybrid batch — half
                    # uniform (coverage) and half the highest-|residual|
                    # candidates (refinement).  Pure top-k exploitation
                    # collapses coverage and diverges (measured).
                    ck = jax.random.fold_in(base_key, start + i)
                    n_cand = adaptive * batch_size
                    if sampler is None:
                        cand = jax.random.uniform(ck, (n_cand, total), dtype)
                    else:
                        cand = jnp.asarray(
                            sampler.sample_device(ck, n_cand), dtype)
                    n_top = batch_size // 2
                    n_uni = batch_size - n_top
                    m_pool = n_cand - n_uni
                    # Residuals are only needed for the ranking pool — the
                    # trailing n_uni candidates join the batch unranked, so
                    # running the (full derivative-traversal) residual over
                    # them would be pure waste.
                    cand_leaves = [cand[:m_pool, c:c + 1]
                                   for c in range(total)]
                    if n_models > 1:
                        res = jax.vmap(flat_residual, in_axes=(0, None))(
                            theta, cand_leaves).mean(axis=0)
                    else:
                        res = flat_residual(theta, cand_leaves)
                    # Proportional importance sampling: draw the refinement
                    # half from a categorical ∝ |residual| over the candidate
                    # pool and weight each picked point by w = 1/(M·p), so
                    # the training loss remains an unbiased estimate of the
                    # uniform residual MSE with reduced variance.  A uniform
                    # half keeps raw coverage.  (Hard top-k without weights
                    # let the stiff region dominate the gradient and made
                    # convergence worse — measured.)
                    r = res[:, 0]
                    probs = r / (jnp.sum(r) + 1e-30)
                    sel_key = jax.random.fold_in(ck, 1)
                    idx = jax.random.categorical(
                        sel_key, jnp.log(probs + 1e-30), shape=(n_top,))
                    w_sel = 1.0 / (m_pool * probs[idx] + 1e-30)
                    pts = jnp.concatenate(
                        [cand[m_pool:], cand[idx]], axis=0)
                    point_weight = jnp.concatenate(
                        [jnp.ones((n_uni,), dtype), w_sel.astype(dtype)])
                else:
                    pts = pts_all[i] if resample else pts_all[0]
                    point_weight = None
                if (mesh is not None and batch_sharding is not None
                        and not separable):
                    pts = jax.lax.with_sharding_constraint(
                        pts, batch_sharding)
                if mesh is not None and theta_sharding is not None:
                    # Ensemble members shard across the 'models' mesh axis;
                    # each device trains its members on the (data-sharded)
                    # batch — composed ensemble x data parallelism.
                    theta = jax.lax.with_sharding_constraint(
                        theta, theta_sharding)
                if separable:
                    # Broadcast-shaped axis leaves: axis c's points live on
                    # grid axis c (trailing size-1 channel axis), so plain
                    # elementwise equation math broadcasts to the full
                    # tensor-product grid and a D(f, x_c) jvp tap
                    # differentiates only axis c's MLP.
                    leaves = [pts[:, c].reshape(
                        (1,) * c + (batch_size,) + (1,) * (total - c))
                        for c in range(total)]
                    if mesh is not None and data_axes:
                        # Grid data parallelism: shard GRID AXIS 0 (axis 0's
                        # sample rows).  Every downstream tensor — axis-0
                        # features, the einsum'd residual grid — inherits a
                        # leading sharded axis, and XLA inserts one psum for
                        # the loss mean; the other axes' tiny MLP evals
                        # replicate.
                        leaves[0] = jax.lax.with_sharding_constraint(
                            leaves[0], NamedSharding(
                                mesh, P(data_axes, *(None,) * total)))
                else:
                    leaves = [pts[:, c:c + 1] for c in range(total)]
                if rba:
                    # Residual-based attention: EMA the normalized CURRENT
                    # residual magnitude into per-point weights; the loss
                    # path multiplies the residual by sqrt(point_weight),
                    # so passing w^2 realizes the mean((w*r)^2) objective.
                    eta, gamma = rba
                    if n_models > 1:
                        r = jax.vmap(flat_residual, in_axes=(0, None))(
                            theta, leaves).mean(axis=0)[:, 0]
                    else:
                        r = flat_residual(theta, leaves)[:, 0]
                    rba_w = jax.lax.stop_gradient(
                        gamma * rba_w + eta * r / (jnp.max(r) + 1e-30))
                    point_weight = rba_w * rba_w
                if balance_every:
                    # Warmup-only rebalancing (10 EMA updates): the
                    # term-scale mismatch this corrects is visible from the
                    # first steps; measuring forever instead boosts
                    # already-satisfied constraints (vanishing gradients)
                    # until their noise dominates — measured to destroy a
                    # converged well-scaled run.  The window is counted in
                    # FIT-LOCAL iterations (`start` is the solver-lifetime
                    # step, used for RNG folding) so balancing a warm solver
                    # — the documented balance-then-polish flow — works.
                    local = start + i - fit_start
                    if balance_mode == "ntk":
                        # Probe RNG: independent of the sampling stream
                        # (distinct fold tag) and fresh per iteration so the
                        # 10-rebalance EMA averages over probe draws too.
                        bkey = jax.random.fold_in(
                            jax.random.fold_in(base_key, 0x4E544B),
                            start + i)
                        branch = lambda w: rebalance_ntk(theta, bkey,
                                                         leaves, w)
                    else:
                        branch = lambda w: rebalance(theta, leaves,
                                                     point_weight, w)
                    wts = jax.lax.cond(
                        (local % balance_every == 0)
                        & (local < 10 * balance_every),
                        branch, lambda w: w, wts)
                if gn is not None:
                    # Levenberg-Marquardt (damped Gauss-Newton): solve
                    # (JᵀJ + λI) d = Jᵀr matrix-free — J·v is one jvp of the
                    # residual vector, Jᵀ·u its linear transpose; CG never
                    # materializes the Jacobian.  ``loss == r·r`` equals the
                    # MSE objective exactly (resvec_fn scaling), so the
                    # accept test is a true loss decrease: accept ⇒ shrink
                    # λ toward pure Gauss-Newton, reject ⇒ grow λ toward
                    # (scaled) gradient descent and keep θ.  Frozen
                    # parameters stay fixed by restricting CG to the masked
                    # subspace (b and J·v are masked; x0 = 0 keeps the
                    # complement at exactly zero).
                    def gn_update(th, state):
                        lam, nu = state[0], state[1]

                        def resfn(t):
                            return flat_resvec(t, leaves)
                        r, jvp_fn = jax.linearize(resfn, th)
                        loss = jnp.vdot(r, r)
                        jt = jax.linear_transpose(jvp_fn, th)

                        def matvec(v):
                            if not all_trainable:
                                v = v * mask_vec
                            u = jt(jvp_fn(v))[0]
                            if not all_trainable:
                                u = u * mask_vec
                            return u + lam.astype(v.dtype) * v

                        b = jt(r)[0]
                        if not all_trainable:
                            b = b * mask_vec
                        d, _ = jax.scipy.sparse.linalg.cg(
                            matvec, b, tol=gn.cg_tol, maxiter=gn.cg_iters)
                        trial = th - d
                        r_t = resfn(trial)
                        loss_t = jnp.vdot(r_t, r_t)
                        # Nielsen damping: λ adapts by the gain ratio ρ =
                        # actual / predicted loss decrease (predicted =
                        # dᵀ(λd + Jᵀr) ≥ 0 for the PSD normal equations) —
                        # near-Gauss-Newton steps (ρ≈1) slash λ, poor model
                        # agreement grows it geometrically (ν doubles per
                        # consecutive reject).  Measured to remove the
                        # multi-iteration reject stalls of the plain
                        # up/down schedule.
                        actual = loss - loss_t
                        pred = jnp.vdot(d, lam.astype(d.dtype) * d + b)
                        rho = actual / jnp.maximum(pred, 1e-30)
                        accept = jnp.isfinite(loss_t) & (actual > 0)
                        th = jnp.where(accept, trial, th)
                        shrink = jnp.maximum(
                            jnp.float32(gn.damping_down),
                            1.0 - (2.0 * rho.astype(jnp.float32) - 1.0) ** 3)
                        lam = jnp.where(
                            accept,
                            jnp.maximum(lam * shrink, gn.min_damping),
                            jnp.minimum(lam * nu, gn.max_damping))
                        nu = jnp.where(accept, jnp.float32(gn.damping_up),
                                       jnp.minimum(nu * 2.0, 1e6))
                        return th, jnp.stack([lam, nu]), loss

                    if n_models > 1:
                        # Per-member LM: damping, CG solve and accept test
                        # all vmap over the ensemble axis.
                        theta, opt_state, loss_k = jax.vmap(gn_update)(
                            theta, opt_state)
                        loss = jnp.mean(loss_k)
                    else:
                        theta, opt_state, loss = gn_update(theta, opt_state)
                    return ((theta, opt_state),
                            losses.at[i].set(loss)), loss
                if n_models > 1:
                    # One vmapped step trains the whole ensemble; the loss
                    # recorded is the ensemble mean.
                    loss_k, grad = jax.vmap(
                        jax.value_and_grad(flat_loss),
                        in_axes=(0, None, None, None, None))(
                        theta, leaves, point_weight, wts, causal_eps)
                    loss = jnp.mean(loss_k)
                else:
                    loss, grad = jax.value_and_grad(flat_loss)(
                        theta, leaves, point_weight, wts, causal_eps)
                if not all_trainable:
                    grad = grad * mask_vec
                if needs_value_fn:
                    # Linesearch optimizers (L-BFGS) re-evaluate the loss at
                    # trial points along the search direction.
                    if n_models > 1:
                        # Per-model linesearch: the whole update (zoom
                        # linesearch included) vmaps over the ensemble
                        # axis, so each member picks its own step size.
                        def upd(th_k, g_k, os_k, v_k):
                            # wts is always None here today (fit rejects
                            # loss_balancing with linesearch optimizers),
                            # but the value_fn must evaluate the SAME
                            # objective as the seeding value/grad if that
                            # guard is ever lifted.
                            return opt.update(
                                g_k, os_k, th_k, value=v_k, grad=g_k,
                                value_fn=lambda th: flat_loss(
                                    th, leaves, point_weight, wts,
                                    ceps=causal_eps))
                        updates, opt_state = jax.vmap(upd)(
                            theta, grad, opt_state, loss_k)
                    else:
                        updates, opt_state = opt.update(
                            grad, opt_state, theta, value=loss, grad=grad,
                            value_fn=lambda th: flat_loss(th, leaves,
                                                          point_weight, wts,
                                                          ceps=causal_eps))
                else:
                    updates, opt_state = opt.update(grad, opt_state, theta)
                theta = optax.apply_updates(theta, updates)
                new_carry = (theta, opt_state)
                if balance_every:
                    new_carry += (wts,)
                if rba:
                    new_carry += (rba_w,)
                return (new_carry, losses.at[i].set(loss)), loss

            # run_chunk returns (carry, losses, verdict): verdict is ONE
            # int32 packing the iteration count and the guard flag —
            # ``done`` when the guard never tripped, ``-done - 1`` when it
            # did.  One scalar instead of a (count, ok) pair halves the
            # blocking host reads per chunk; behind a network tunnel each
            # read is a full round-trip (measured: this was most of
            # BENCH_r03's best-of-5 wall doubling).
            losses = jnp.zeros((chunk,), dtype)
            if not stop_on_nan:
                out_carry, losses = _unrolled_fori(
                    jnp.int32(0), jnp.int32(n),
                    lambda i, s: body(i, s)[0], (carry, losses), unroll)
                return out_carry, losses, jnp.int32(n)

            # Divergence/convergence guard, device-side and AMORTIZED.  A
            # while-loop predicate that reads each freshly-computed loss
            # serializes the scalar core on every step's vector result and
            # costs ~22% sustained throughput (measured, BENCHMARKS.md
            # "Divergence-guard cost").  Instead the chunk runs counter-only
            # blocks of GUARD_BLOCK iterations — the inner fori's trip test
            # never touches a loss, so it pipelines exactly like the
            # unguarded loop — and the outer predicate consumes one
            # per-block verdict.  One predicate serves both guards:
            # non-finite losses fail isfinite (divergence) and a loss at or
            # below ``tol`` stops a convergence-targeted fit (tol = -inf
            # when until_loss is unset, so every finite loss passes).
            #
            # Exact stop-at-the-bad-step semantics are preserved by
            # snapshot + replay: each block snapshots the carry on entry;
            # a tripped block rewinds to the snapshot, shrinks the loop
            # bound to trig+1, and (now disarmed) replays deterministically
            # up to the offending iteration — batches are pure functions of
            # the iteration index (fold_in), so the returned params, losses
            # and ``done`` match the per-iteration guard bit-for-bit at
            # <= one extra block of work per tripped chunk and one carry
            # copy-on-write per block.
            # Static slice width for the per-block loss check (chunks
            # shorter than a block read the whole buffer).
            kk = min(GUARD_BLOCK, chunk)

            def wcond(state):
                i, _, _, stop_at = state
                return i < stop_at

            def wbody(state):
                i, s, armed, stop_at = state
                snap = s[0]
                m = jnp.minimum(jnp.int32(GUARD_BLOCK), stop_at - i)
                s_new = _unrolled_fori(
                    i, i + m, lambda idx, s2: body(idx, s2)[0], s, unroll)
                # Block verdict from the loss buffer, one vectorized check
                # per block — tracking it in the inner carry instead costs
                # a vector->scalar sync every iteration.  dynamic_slice
                # clamps the start, so near the buffer end the window
                # shifts back and the iota mask restricts it to [i, i+m).
                st = jnp.minimum(i, jnp.int32(chunk - kk))
                lb = jax.lax.dynamic_slice(s_new[1], (st,), (kk,))
                pos = st + jnp.arange(kk, dtype=jnp.int32)
                bad = ((pos >= i) & (pos < i + m)
                       & ~(jnp.isfinite(lb) & (lb > tol)))
                ok_blk = ~jnp.any(bad)
                trig = st + jnp.argmax(bad).astype(jnp.int32)
                tripped = armed & ~ok_blk
                carry_out = jax.tree.map(
                    lambda a, b: jnp.where(tripped, a, b), snap, s_new[0])
                return (jnp.where(tripped, i, i + m),
                        (carry_out, s_new[1]), armed & ~tripped,
                        jnp.where(tripped, trig + jnp.int32(1), stop_at))

            # `ok` (= still armed) must be encoded too: a guard trip on
            # the chunk's LAST iteration exits with done == n,
            # indistinguishable from clean completion by the count alone.
            done, (out_carry, losses), ok, _ = jax.lax.while_loop(
                wcond, wbody,
                (jnp.int32(0), (carry, losses), jnp.bool_(True),
                 jnp.int32(n)))
            verdict = jnp.where(ok, done, -done - jnp.int32(1))
            return out_carry, losses, verdict

        def prep(params):
            """Flatten params and build optimizer state in one jitted call —
            per-fit setup must not run eagerly (each eager op is a
            round-trip when the device sits behind a tunnel)."""
            theta = (_flatten_stacked(params, n_models) if n_models > 1
                     else _flatten_tree(params))
            if gn is not None:
                # The whole LM state is (damping λ, reject multiplier ν) —
                # per-member for ensembles (each accepts independently).
                s0 = jnp.asarray([gn.init_damping, gn.damping_up],
                                 jnp.float32)
                return theta, (jnp.tile(s0, (n_models, 1))
                               if n_models > 1 else s0)
            if needs_value_fn and n_models > 1:
                # Linesearch state (history buffers, step counts) must be
                # per-model — the update vmaps over the ensemble axis.
                return theta, jax.vmap(opt.init)(theta)
            return theta, opt.init(theta)

        compiled = (jax.jit(run_chunk, donate_argnums=(0,)), jax.jit(prep))
        self._step_cache[key] = compiled
        return compiled

    def fit(self, niters, batch_size, sampler=None, loss_terms="equation",
            optimizer="Adam", criterion="MSELoss", lr=0.005, losses=None,
            progress="auto", chunk_size=500, profile_dir=None, resample=True,
            adaptive=None, fast_taps="auto", callback=None,
            loss_balancing=None, checkpoint_path=None, checkpoint_every=None,
            stop_on_nan=True, causal=None, causal_axis=None, rba=None,
            until_loss=None, **kwargs):
        """Train the model for ``niters`` iterations of ``batch_size``
        collocation points per iteration.

        Parameters mirror the reference ``fit``
        (``model_torch.py:364-422``): ``sampler`` follows the
        ``.sample(size)`` protocol (device-side ``sample_device(key, size)``
        is used when available); ``loss_terms`` is ``'equation'`` and/or
        ``'constraint_k'`` entries — or a ``{term: weight}`` dict for
        weighted composite losses; ``optimizer`` is a torch-style name
        (``None`` reuses the existing optimizer *and its state*, the
        reference's warm-restart idiom, ``:391-393,419``); ``criterion`` is a
        name or jnp callable; extra kwargs go to the optimizer.

        ``losses=`` is accepted as a legacy alias for ``loss_terms`` (used in
        the reference's examples notebook).  ``progress`` shows a tqdm bar
        over scan chunks; ``chunk_size`` controls how many iterations run per
        device dispatch (larger = less host overhead); ``profile_dir``
        captures a ``jax.profiler`` trace of the whole fit (view with
        TensorBoard / xprof); ``resample=False`` draws ONE collocation batch
        and reuses it every iteration — full-batch training, the standard
        companion to ``optimizer='LBFGS'`` for a high-precision finishing
        phase; ``adaptive=r`` (int >= 2) enables residual-based adaptive
        refinement — each iteration draws ``r * batch_size`` candidate
        points and trains on the ``batch_size`` with the largest
        |equation residual| (device-side; requires the 'equation' loss term
        and a device-capable sampler); ``fast_taps`` controls the
        Taylor-mode derivative fast path (``'auto'`` uses it whenever the
        equation's derivative structure allows — pure field taps of order
        <= 6 on a layout-built network — AND the batch is small enough
        that the step is not HBM-bandwidth-bound, the regime where the
        plan wins; ``True``/``'always'`` forces the plan at any batch;
        ``False`` forces the nested-jvp path, e.g. for debugging);
        ``callback(iteration, chunk_losses)``
        fires after every compiled chunk (forces a device sync — for
        logging/early-stopping hooks, keep ``chunk_size`` coarse);
        ``loss_balancing=True`` (or an int interval, default 100) enables
        grad-norm loss balancing for multi-term losses: during a warmup
        window (10 rebalances, one every interval iterations) the per-term
        mean |gradient| is measured (one extra backward pass per term) and
        constraint weights are EMA-pulled toward
        ``|grad_equation| / |grad_term|`` (clipped to two decades), then
        frozen — the cure for mis-scaled equations drowning their
        constraints, without hand-tuning weights.  Warmup-only is
        deliberate: continuous rebalancing boosts already-satisfied
        constraints whose gradients vanish (measured in BENCHMARKS.md).
        The starting weights are the ``loss_terms`` values; the learned
        weights land in ``history[-1]['balanced_weights']``.
        ``loss_balancing='ntk'`` (or ``('ntk', interval)``) swaps the
        per-term statistic for the NTK trace (Wang/Yu/Perdikaris): each
        term's ``tr(K_j) = ||d r_j/d theta||_F^2`` is Hutchinson-estimated
        with 4 residual-space Rademacher probes through one shared vjp
        (exact basis enumeration for small constraint blocks), and weights
        are pulled toward ``tr(K_eq)/tr(K_j)`` with the same anchor/clip/
        EMA policy — prefer it when terms differ in per-POINT gradient
        stiffness (the trace weighs every residual row, where the 'grad'
        statistic reads only the batch-summed gradient, in which
        oscillating per-point gradients can cancel; it requires the MSE
        criterion and the plain residual objective, i.e. no adaptive/
        causal/rba).  ``('grad', interval)`` spells the default mode
        explicitly.

        ``causal=eps`` (float > 0) enables causal training for stiff
        time-dependent problems: within each batch, a point's squared
        residual is down-weighted by ``exp(-eps * cumulative mean residual
        at earlier times)``, so the optimizer must satisfy the PDE near
        ``t0`` (where the ansatz binds the initial condition exactly)
        before later times — the standard cure for advection-dominated
        problems where plain MSE converges to a trivial late-time
        solution.  Requires an ``initial_condition`` (the time axis is the
        last variable column, as in the ansatz), the ``'equation'`` loss
        term with the MSE criterion, and is exclusive with ``adaptive``.
        ``causal=0.0`` is exactly plain MSE (tested), so ``eps`` can be
        annealed across fit calls.

        ``rba=True`` (or ``eta``, or ``(eta, gamma)``; defaults
        ``eta=0.01, gamma=0.999``) enables residual-based attention
        (Anagnostopoulos et al. 2023-style): per-collocation-point
        multiplicative weights updated every iteration as
        ``w_i <- gamma * w_i + eta * |r_i| / max_j |r_j|`` from the
        current residual field, loss ``mean((w_i * r_i)^2)`` — stubborn
        points (sharp fronts, stiff layers) accumulate attention instead
        of being averaged away.  The weights track FIXED collocation
        points, so ``resample=False`` is required (one batch per fit);
        each iteration pays one extra forward residual evaluation.
        Exclusive with ``adaptive``/``causal`` (competing per-point
        schemes), MSE criterion only, Adam-phase only (linesearch
        optimizers assume a fixed objective).

        ``stop_on_nan=True`` (the default) arms a divergence guard: the
        compiled loop checks each iteration's loss device-side and exits at
        the first non-finite value (a too-high ``lr`` or a bad geometry
        batch no longer burns the rest of a long compiled dispatch); the
        fit then stops cleanly with a warning naming the iteration, the
        partial loss history (including the offending value) is kept, and
        ``history[-1]['stopped_on_nan']`` records the index.  The guard
        reads one scalar per chunk on the host, which serializes chunk
        dispatches — pass ``stop_on_nan=False`` to pipeline many small
        chunks with no host sync (the compiled-loop early exit is
        disabled too, restoring the exact pre-guard step).

        ``until_loss=tol`` enables convergence-targeted training:
        ``niters`` becomes a budget CAP and the compiled loop exits
        device-side at the first iteration whose recorded loss (the
        minibatch training loss; the ensemble mean for ``n_models > 1``)
        is at or below ``tol`` — "train to tolerance", the stopping rule
        classical solvers use, at zero recompile cost (``tol`` is a
        traced runtime scalar, so sweeping it reuses one executable).
        The minibatch loss is stochastic under ``resample=True``, so a
        single lucky batch can trigger a modest ``tol``; for strict
        semantics pair it with a fixed batch (``resample=False``) — with
        ``optimizer='LM'`` the fixed-batch loss is monotone by
        construction, making ``until_loss`` an exact target for the
        polish phase.  ``history[-1]['converged_at']`` records the
        triggering iteration; if the budget runs out first the fit just
        completes ``niters`` iterations.  Implies ``stop_on_nan``.

        ``checkpoint_path=`` enables auto-checkpointing for long runs:
        the full training state (params, optimizer state, losses, step
        counter) is atomically snapshotted to that path at chunk
        boundaries, every ``checkpoint_every`` iterations (default: every
        chunk).  After a crash, a fresh solver with the same config
        ``load``s the file and continues from the last snapshot (the RNG
        stream restarts from the fit's key, so the continuation is a
        valid—but not bit-identical—completion of the interrupted fit;
        an end-of-fit ``save`` remains bit-exact for resume).
        """
        fit_t0 = time.perf_counter()
        if int(niters) <= 0:
            return self
        if until_loss is not None:
            until_loss = float(until_loss)
            # A fit that must inspect each iteration's loss device-side gets
            # the divergence check for free (same predicate) — and stopping a
            # convergence-targeted run at a NaN is the only sane behavior.
            stop_on_nan = True
        if losses is not None:
            loss_terms = losses
        # Normalize loss_terms to ((name, weight), ...): accepts a single
        # name, a list of names (reference surface), or a {name: weight}
        # dict (weighted superset).
        if isinstance(loss_terms, dict):
            # The {name: weight} dict is a superset surface with no parity
            # obligation — typo'd names raise instead of silently building a
            # constant-zero loss.  (The list form keeps the reference's
            # silent-drop quirk for non-'constraint' unknowns,
            # model_torch.py:447-449.)
            import re
            for k in loss_terms:
                if (str(k) != "equation"
                        and not re.fullmatch(r"constraint_?\d+", str(k))):
                    raise ValueError(
                        f"unknown loss term {str(k)!r}; expected 'equation' "
                        "or 'constraint_<k>'")
            loss_terms = tuple((str(k), float(v))
                               for k, v in loss_terms.items())
        else:
            if not isinstance(loss_terms, (tuple, list)):
                loss_terms = (loss_terms,)
            loss_terms = tuple((str(t), 1.0) for t in loss_terms)
        criterion_fn, criterion_key = resolve_criterion(criterion)

        # Optimizer: fresh per fit call unless optimizer=None (reuse).  The
        # optimizer operates on the flat parameter vector (see
        # _build_step_fn), so its state is a couple of flat arrays.
        fresh_optimizer = optimizer is not None
        if fresh_optimizer:
            # lr may be an optax schedule (callable) — key by identity then.
            lr_token = float(lr) if isinstance(lr, (int, float)) else id(lr)
            opt_token = (str(optimizer) if isinstance(optimizer, str)
                         else id(optimizer),
                         lr_token, tuple(sorted(kwargs.items())))
            if opt_token not in self._opt_cache:
                self._opt_cache[opt_token] = resolve_optimizer(
                    optimizer, lr, kwargs)
            self._opt, self._opt_needs_value_fn = self._opt_cache[opt_token]
        elif self._opt is None:
            raise ValueError("fit(optimizer=None) requires a previous fit "
                             "call that created an optimizer")
        if isinstance(self._opt, LMConfig):
            # Gauss-Newton linearizes the least-squares residual vector —
            # it is only defined for the plain (unweighted-in-time/space)
            # MSE objective.
            if self.formulation == "variational":
                raise ValueError(
                    "optimizer='LM' (Gauss-Newton) minimizes a sum of "
                    "squared residuals; a variational (Deep Ritz) energy "
                    "is not a least-squares objective — use "
                    "formulation='residual'")
            if (isinstance(criterion_key, str)
                    and criterion_key not in ("mseloss", "mse")):
                raise ValueError(
                    "optimizer='LM' (Gauss-Newton) is defined for the MSE "
                    "criterion (loss == ||residual||^2)")
            if adaptive is not None or causal is not None or (
                    rba is not None and rba is not False):
                raise ValueError(
                    "optimizer='LM' (Gauss-Newton) targets the plain MSE "
                    "residual; per-point/causal reweighting (adaptive/"
                    "causal/rba) changes the objective every iteration — "
                    "run those during the Adam phase, then polish with LM")
            if loss_balancing:
                raise ValueError(
                    "optimizer='LM' (Gauss-Newton) already solves the "
                    "coupled normal equations across all loss terms; "
                    "grad-norm loss_balancing does not apply — bake fixed "
                    "weights into loss_terms instead")
        # Sampler path.
        if sampler is None or getattr(sampler, "supports_device", False):
            sampler_key = id(sampler) if sampler is not None else "default"
        else:
            sampler_key = "host"
        if self.mesh is not None:
            data_axes, model_axis = _mesh_axes(self.mesh, self.n_models)
            if data_axes:
                n_data = int(np.prod([self.mesh.shape[a] for a in data_axes]))
                if batch_size % n_data != 0:
                    raise ValueError(
                        f"batch_size={batch_size} must be divisible by the "
                        f"data mesh axes {data_axes} total size {n_data} "
                        "for data-parallel training")
            if model_axis and self.n_models % self.mesh.shape[model_axis]:
                raise ValueError(
                    f"n_models={self.n_models} must be divisible by the "
                    f"'{model_axis}' mesh axis size "
                    f"{self.mesh.shape[model_axis]}")
        if adaptive is not None:
            adaptive = int(adaptive)
            if self.formulation == "variational":
                raise ValueError(
                    "adaptive sampling ranks points by the strong-form "
                    "residual, which a variational (Deep Ritz) solver does "
                    "not compute — use formulation='residual'")
            if adaptive < 2:
                raise ValueError("adaptive must be an int >= 2 (candidate "
                                 "oversampling factor)")
            if sampler_key == "host":
                raise ValueError(
                    "adaptive sampling runs device-side; the supplied "
                    "sampler has no sample_device path")
            if "equation" not in dict(loss_terms):
                raise ValueError("adaptive sampling ranks points by the "
                                 "equation residual; include 'equation' in "
                                 "loss_terms")
            if (isinstance(criterion_key, str)
                    and criterion_key not in ("mseloss", "mse")):
                raise ValueError(
                    "adaptive importance weights scale the residual by "
                    "sqrt(w), which keeps only the MSE criterion unbiased; "
                    "use criterion='MSELoss' (or a custom callable you "
                    "know composes with sqrt-weighting)")

        rba_cfg = None
        if rba is not None and rba is not False:
            # Residual-based attention (Anagnostopoulos et al.-style):
            # per-collocation-point multiplicative weights
            # ``w_i <- gamma*w_i + eta*|r_i|/max_j |r_j|`` updated every
            # iteration from the CURRENT residual field, loss
            # ``mean((w_i r_i)^2)`` — stubborn points accumulate attention.
            # Spellings: True (eta=0.01, gamma=0.999), eta, (eta, gamma).
            if rba is True:
                eta, gamma = 0.01, 0.999
            elif isinstance(rba, (tuple, list)) and len(rba) == 2:
                eta, gamma = float(rba[0]), float(rba[1])
            elif isinstance(rba, (int, float)):
                eta, gamma = float(rba), 0.999
            else:
                raise ValueError(
                    f"rba={rba!r} not understood; use True, eta, or "
                    "(eta, gamma)")
            if not (eta > 0 and 0 <= gamma < 1):
                raise ValueError("rba needs eta > 0 and 0 <= gamma < 1")
            if resample:
                raise ValueError(
                    "rba weights track FIXED collocation points across "
                    "iterations; pass resample=False (one batch for the "
                    "whole fit)")
            if adaptive is not None:
                raise ValueError("rba and adaptive are both per-point "
                                 "residual reweighting schemes — use one")
            if causal is not None:
                raise ValueError(
                    "rba point weights are not applied inside the causal "
                    "bin weighting — use one of the two")
            if self.formulation == "variational":
                raise ValueError(
                    "rba weights the strong-form residual; it is undefined "
                    "for a variational (Deep Ritz) energy")
            if "equation" not in dict(loss_terms):
                raise ValueError("rba weights the equation residual; "
                                 "include 'equation' in loss_terms")
            if (isinstance(criterion_key, str)
                    and criterion_key not in ("mseloss", "mse")):
                raise ValueError("rba is defined for the MSE criterion "
                                 "(loss mean((w*r)^2))")
            if self._opt_needs_value_fn:
                raise ValueError(
                    "rba changes the objective every iteration; linesearch "
                    "optimizers (LBFGS) assume a fixed one — run rba during "
                    "the Adam phase, then polish without it")
            rba_cfg = (eta, gamma)

        if getattr(self.model, "separable", False):
            # Tensor-product-grid training: per-POINT machinery (adaptive
            # refinement, causal bins, RBA weights) assumes a flat batch of
            # independent points; the mesh batch-sharding layout assumes a
            # (batch, total) point matrix.  All are rejected explicitly
            # rather than silently mis-weighting the grid.
            if adaptive is not None:
                raise ValueError("adaptive collocation is per-point; a "
                                 "separable model trains on a tensor-product "
                                 "grid — drop adaptive=")
            if rba_cfg is not None:
                raise ValueError("rba weights are per flat batch point; not "
                                 "supported for separable grid training")

        causal_eps = 0.0
        if causal is None and causal_axis is not None:
            raise ValueError(
                "causal_axis names the time column FOR causal training — "
                "it does nothing on its own; pass fit(causal=eps, "
                "causal_axis=k)")
        if causal is not None:
            causal_eps = float(causal)
            if self.formulation == "variational":
                raise ValueError(
                    "causal training weights strong-form residuals over "
                    "time; it is undefined for a variational (Deep Ritz) "
                    "energy — use formulation='residual'")
            if causal_eps < 0:
                raise ValueError("causal must be a float >= 0 (the "
                                 "causal-weighting temperature eps)")
            if self.model.initial_condition is None and causal_axis is None:
                raise ValueError(
                    "causal training needs a time axis — construct the "
                    "Solver with an initial_condition (time is the last "
                    "variable column, as in the ansatz), or pass "
                    "fit(causal_axis=k) to name the time column explicitly "
                    "(penalty-IC workflows, e.g. a non-periodic-compatible "
                    "initial state bound by a constraint)")
            if "equation" not in dict(loss_terms):
                raise ValueError("causal training weights the equation "
                                 "residual; include 'equation' in "
                                 "loss_terms")
            if criterion_key not in ("mseloss", "mse"):
                raise ValueError("causal training is defined for the MSE "
                                 "criterion")
            if adaptive is not None:
                raise ValueError("causal and adaptive sampling both "
                                 "reweight the equation residual — use one")
            t_axis = (self.model.ndims - 1 if causal_axis is None
                      else int(causal_axis))
            if not 0 <= t_axis < self.model.ndims:
                raise ValueError(
                    f"causal_axis={causal_axis} out of range for "
                    f"{self.model.ndims} variable columns")
            t_lo, t_hi = self.model.domain[t_axis]
            # Static part (bin axis + bounds) keys the compile; eps itself
            # is a runtime scalar so annealing it never recompiles.
            causal = (t_axis, float(t_lo), float(t_hi))

        balance_every = 0
        balance_mode = "grad"
        if loss_balancing:
            if isinstance(loss_balancing, (tuple, list)):
                if len(loss_balancing) != 2:
                    raise ValueError(
                        "loss_balancing=(mode, interval) takes exactly two "
                        "elements, e.g. ('ntk', 100)")
                balance_mode = str(loss_balancing[0])
                balance_every = int(loss_balancing[1])
            elif isinstance(loss_balancing, str):
                balance_mode, balance_every = loss_balancing, 100
            else:
                balance_every = (100 if loss_balancing is True
                                 else int(loss_balancing))
            if balance_mode not in ("grad", "ntk"):
                raise ValueError(
                    f"loss_balancing mode {balance_mode!r} is not "
                    "recognized; use 'grad' (per-term mean gradient "
                    "magnitudes) or 'ntk' (per-term NTK traces)")
            if balance_every < 1:
                raise ValueError("loss_balancing must be True or a positive "
                                 "rebalance interval in iterations")
            if balance_mode == "ntk":
                # The NTK traces are Jacobian Frobenius norms of the plain
                # per-term residual blocks; reweighted/transformed
                # objectives have no such block decomposition.  Unlike the
                # LM/adaptive/rba guards (which let a knowingly-composable
                # custom callable through, since those only reweight the
                # residual), a callable criterion here would be silently
                # balanced against the WRONG kernel — the traces would
                # describe an MSE the fit never minimizes — so only the MSE
                # criterion itself is accepted.
                if not (isinstance(criterion_key, str)
                        and criterion_key in ("mseloss", "mse")):
                    raise ValueError(
                        "loss_balancing='ntk' estimates residual-Jacobian "
                        "traces, which represent the loss only for the MSE "
                        "criterion (custom callables included — the traces "
                        "would balance an objective the fit does not "
                        "minimize) — use the 'grad' mode otherwise")
                if self.formulation == "variational":
                    raise ValueError(
                        "loss_balancing='ntk' needs per-term residual "
                        "vectors; a variational (Deep Ritz) energy has "
                        "none — use the 'grad' mode")
                if (adaptive is not None or causal is not None
                        or rba_cfg is not None):
                    raise ValueError(
                        "loss_balancing='ntk' traces the PLAIN residual "
                        "operator; per-point/causal reweighting (adaptive/"
                        "causal/rba) changes the objective it would "
                        "balance — use the 'grad' mode with those")
            if len(loss_terms) < 2:
                raise ValueError(
                    "loss_balancing needs at least two loss terms (an "
                    "equation plus constraints) — a single term has nothing "
                    "to balance against")
            if self._opt_needs_value_fn:
                raise ValueError(
                    "loss_balancing is not supported with linesearch "
                    "optimizers (LBFGS) — balance during the Adam phase, "
                    "then polish with fixed weights")

        niters = int(niters)
        chunk = max(1, min(niters, int(chunk_size)))
        if fast_taps not in (True, False, "auto", "never", "always"):
            raise ValueError(
                f"fast_taps={fast_taps!r} is not a recognized value; use "
                "'auto' (batch-regime heuristic, default), True/'always' "
                "(force the Taylor plan), or False/'never' (nested jvp)")
        use_plan = bool(self._plan_ok) and fast_taps not in (False, "never")
        if use_plan and fast_taps == "auto":
            # Adaptive sampling runs the planned residual over the FULL
            # candidate pool each iteration, so the bandwidth-regime
            # decision must size by the oversampled batch.
            use_plan = self._auto_use_plan(
                int(batch_size) * (adaptive if adaptive else 1))
        mask = self.model.trainable_mask(self.model.params)
        cfg = dict(batch_size=int(batch_size), chunk=chunk,
                   loss_terms=loss_terms, use_plan=use_plan,
                   criterion=criterion_fn, criterion_key=criterion_key,
                   opt=self._opt, mask=mask,
                   mask_key=(frozenset(self.model._frozen_layers),
                             frozenset(self.model._frozen_variables)),
                   sampler=sampler, sampler_key=sampler_key,
                   resample=bool(resample), adaptive=adaptive,
                   balance_every=balance_every, balance_mode=balance_mode,
                   stop_on_nan=bool(stop_on_nan),
                   causal=causal, rba=rba_cfg,
                   needs_value_fn=self._opt_needs_value_fn)
        run_chunk, prep = self._build_step_fn(cfg)
        if fresh_optimizer or self._opt_state is None:
            theta, self._opt_state = prep(self.model.params)
        else:
            theta = self._flatten_jit(self.model.params)
        if self._pending_opt_state is not None:
            # Checkpoint resume: graft the saved moments onto this fit's
            # optimizer state (freshly prep'd or reused) so resumed training
            # continues where the saving run left off instead of restarting
            # Adam.
            from flax import serialization
            try:
                self._opt_state = serialization.from_state_dict(
                    self._opt_state, self._pending_opt_state)
            except (ValueError, KeyError, TypeError) as err:
                import warnings
                warnings.warn(
                    "checkpointed optimizer state is incompatible with "
                    f"this fit's optimizer and was not restored: {err}")
            self._pending_opt_state = None

        fit_key, self._key = jax.random.split(self._key)
        bounds = list(range(0, niters, chunk))

        show_progress = (progress is True
                         or (progress == "auto" and sys.stderr.isatty()))
        iterator = bounds
        if show_progress:
            try:
                from tqdm import tqdm
                iterator = tqdm(bounds, unit="chunk")
            except ImportError:
                pass

        profile_ctx = (jax.profiler.trace(profile_dir)
                       if profile_dir else contextlib.nullcontext())

        fixed_host_batch = None
        if sampler_key == "host" and not resample:
            pts = sampler.sample(batch_size).astype(np.float32)
            fixed_host_batch = pts.reshape(1, batch_size, self.model.total)

        def run_one_chunk(carry, start):
            n = min(chunk, niters - start)
            if sampler_key == "host":
                if resample:
                    pts = sampler.sample(n * batch_size).astype(np.float32)
                    pts = pts.reshape(n, batch_size, self.model.total)
                    if n < chunk:  # pad the fixed buffer; padded steps never run
                        pad = np.zeros((chunk - n,) + pts.shape[1:],
                                       np.float32)
                        pts = np.concatenate([pts, pad], axis=0)
                else:
                    pts = fixed_host_batch
                if self.mesh is not None:
                    data_axes, _ = _mesh_axes(self.mesh, self.n_models)
                    spec = P(None, data_axes, None)
                    if self._mesh_mp:
                        # Every process sampled the same full batch (same
                        # seed); each contributes its local devices' shards.
                        host_pts = global_batch(self.mesh, pts, spec)
                    else:
                        host_pts = jax.device_put(
                            pts, NamedSharding(self.mesh, spec))
                else:
                    host_pts = jnp.asarray(pts)
            else:
                host_pts = np.float32(0.0)  # unused placeholder
            carry, chunk_losses, verdict = run_chunk(
                carry, fit_key, np.int32(self._step_counter + start),
                np.int32(self._step_counter), np.int32(n), host_pts,
                np.float32(causal_eps),
                np.float32(-np.inf if until_loss is None else until_loss))
            return carry, chunk_losses, n, verdict

        if balance_every:
            # Initial weights in the step's term order (equation first,
            # then constraints in appearance order).
            lt_dict = dict(loss_terms)
            init_wts = (([float(lt_dict["equation"])]
                         if "equation" in lt_dict else [])
                        + [float(w) for t, w in loss_terms
                           if "constraint" in t])
            carry = (theta, self._opt_state,
                     jnp.asarray(init_wts, self.model.dtype))
        else:
            carry = (theta, self._opt_state)
        if rba_cfg is not None:
            # Per-point attention weights, reset each fit (the fixed batch
            # is redrawn per fit, so carried weights would be stale).
            carry += (jnp.ones((int(batch_size),), self.model.dtype),)
        if self._mesh_mp:
            # Assemble per-process host-local state into replicated global
            # arrays (already-global leaves pass through) — a mesh-sharded
            # jit under multi-controller SPMD requires global inputs.
            carry = to_global_replicated(carry, self.mesh)
        # This fit's per-iteration losses: chunk loss buffers stay on device
        # (reading them synchronizes) and drain to host floats incrementally
        # — O(total) over the fit — only when something needs them
        # (checkpoint snapshot, fit end).
        fit_losses_list = []
        pending_losses = []
        iters_run = 0
        ckpt_every = int(checkpoint_every or chunk)
        ckpt_iters_saved = -1

        def drain_losses():
            if pending_losses:
                # One batched transfer for every pending device buffer
                # (host-numpy buffers pass through device_get untouched) —
                # per-buffer reads each cost a tunnel round-trip.
                bufs = jax.device_get([l for l, _ in pending_losses])
                for b, (_, m) in zip(bufs, pending_losses):
                    fit_losses_list.extend(np.asarray(b)[:m].tolist())
                pending_losses.clear()
            return fit_losses_list

        def save_checkpoint(carry):
            """Snapshot the live carry (params, opt state, losses so far,
            learned balancing weights) without mutating the solver."""
            nonlocal ckpt_iters_saved
            ckpt_iters_saved = iters_run
            if self._mesh_mp and jax.process_index() != 0:
                # One writer per multi-process mesh: the state is replicated
                # (every process holds identical copies), and concurrent
                # same-path writes would race on the atomic-rename tmp file.
                return
            from .utils.checkpoint import save_solver
            save_solver(
                self, checkpoint_path,
                params=self._unflatten_jit(carry[0]),
                opt_state=carry[1],
                losses=self.losses + drain_losses(),
                step_counter=self._step_counter + iters_run,
                balanced_weights=(np.asarray(carry[2]).tolist()
                                  if balance_every else None))

        nan_stop = None
        converged_at = None
        try:
            with profile_ctx:
                for start in iterator:
                    # `carry` must be reassigned before the callback can
                    # raise: the previous carry's buffers were donated to
                    # the device call and are dead.
                    carry, chunk_losses, n, verdict = \
                        run_one_chunk(carry, start)
                    if stop_on_nan:
                        # ONE blocking round-trip per chunk: verdict packs
                        # (iterations done, guard flag) as done / -done-1,
                        # and the batched device_get pulls the loss buffer
                        # down in the same transfer (measured: separate
                        # reads each pay a full ~25 ms tunnel round-trip;
                        # one batched get costs one).  chunk_losses becomes
                        # host numpy, so the end-of-fit drain is free.
                        v, chunk_losses = jax.device_get(
                            (verdict, chunk_losses))
                        v = int(v)
                        done = v if v >= 0 else -v - 1
                        if v < 0:
                            # The guard tripped at index done-1 of this
                            # chunk: either the loss reached the until_loss
                            # target (converged — a clean stop) or it went
                            # non-finite (diverged).
                            last = (float(np.asarray(chunk_losses)[done - 1])
                                    if done > 0 else float("nan"))
                            iters_run = start + done
                            pending_losses.append((chunk_losses, done))
                            # Compare against the f32 tol the DEVICE guard
                            # used (run_one_chunk passes np.float32(tol)) —
                            # re-checking against the f64 value misclassifies
                            # a loss in (tol, f32(tol)] as divergence when
                            # the cast rounds tol up.
                            if (until_loss is not None
                                    and np.isfinite(last)
                                    and last <= float(np.float32(until_loss))):
                                converged_at = (self._step_counter + start
                                                + done - 1)
                                break
                            import warnings
                            nan_stop = self._step_counter + start + done - 1
                            warnings.warn(
                                f"fit stopped early: non-finite loss at "
                                f"iteration {nan_stop} (of {niters}); the "
                                "partial loss history is kept. Lower the "
                                "learning rate or check the sampled "
                                "domain. Pass stop_on_nan=False to "
                                "disable this guard.")
                            break
                    iters_run = min(niters, start + chunk)
                    pending_losses.append((chunk_losses, n))
                    if checkpoint_path is not None and (
                            iters_run // ckpt_every
                            > (0 if ckpt_iters_saved < 0
                               else ckpt_iters_saved // ckpt_every)):
                        save_checkpoint(carry)
                    stop = False
                    if callback is not None:
                        # Observability / early-stopping hook: called once
                        # per compiled chunk with (global_iteration,
                        # np.ndarray of that chunk's losses); return truthy
                        # to stop the fit cleanly.  NOTE: reading losses
                        # synchronizes with the device.
                        stop = bool(callback(
                            self._step_counter + iters_run,
                            np.asarray(chunk_losses)[:n]))
                    if stop:
                        break
            # Final snapshot at fit end (normal completion OR a clean
            # callback stop), regardless of the interval; crashes between
            # interval marks are covered by the interval saves above.  A
            # NaN stop keeps the last good snapshot instead.
            if (checkpoint_path is not None and nan_stop is None
                    and ckpt_iters_saved < iters_run):
                save_checkpoint(carry)
        finally:
            # Commit whatever completed — a raising callback (or any other
            # mid-fit error at a chunk boundary) must not discard the
            # trained state.  If run_chunk itself raised mid-dispatch, the
            # bound carry is the DONATED (deleted) input — touching it
            # would mask the real error with 'array has been deleted';
            # leave the pre-chunk parameters in place instead.
            self._step_counter += iters_run
            balanced_weights = None
            donated_dead = (isinstance(carry[0], jax.Array)
                            and carry[0].is_deleted())
            if not donated_dead:
                theta, self._opt_state = carry[0], carry[1]
                if balance_every:
                    balanced_weights = np.asarray(carry[2]).tolist()
                self.model.params = self._unflatten_jit(theta)
            self.losses.extend(drain_losses())

        fit_losses = np.asarray(fit_losses_list, np.float32)
        self.history.append({
            "niters": iters_run, "batch_size": int(batch_size),
            "optimizer": (optimizer if isinstance(optimizer, str)
                          else "reused" if optimizer is None
                          else type(optimizer).__name__),
            "lr": (lr if isinstance(lr, (int, float))
                   else getattr(lr, "__name__", "schedule")),
            "loss_terms": list(loss_terms),
            "resample": bool(resample),
            "wall_time_s": time.perf_counter() - fit_t0,
            "first_loss": float(fit_losses[0]),
            "final_loss": float(fit_losses[-1]),
        })
        if balanced_weights is not None:
            self.history[-1]["balanced_weights"] = balanced_weights
        if nan_stop is not None:
            self.history[-1]["stopped_on_nan"] = int(nan_stop)
        if converged_at is not None:
            self.history[-1]["converged_at"] = int(converged_at)
        return self

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def _normalize_inputs(self, xs):
        """Evaluation-input normalization shared by predict / residual /
        predict_grad: mixed per-column inputs (reference semantics) or one
        stacked ``(N, total)`` grid; validates the column count."""
        if (len(xs) == 1 and hasattr(xs[0], "ndim") and xs[0].ndim == 2
                and xs[0].shape[1] == self.model.total > 1):
            xs_concat = np.asarray(xs[0], np.float32)
        else:
            xs_concat = self.reshape_and_concat(xs)
        if xs_concat.shape[1] != self.model.total:
            raise ValueError(
                f"received {xs_concat.shape[1]} coordinate columns but the "
                f"problem has ndims+nparams={self.model.total}")
        # Stay on the host (numpy): padding/slicing device arrays costs one
        # eager dispatch each — a round-trip (and a cold remote mini-compile)
        # when the chip sits behind a tunnel.  The jitted entries take the
        # numpy batch directly; ml_dtypes covers bf16 casts host-side.
        return np.asarray(xs_concat,
                          jax.dtypes.canonicalize_dtype(self.model.dtype))

    def _predict_raw(self, xs):
        return self.model.predict_apply(self.model.params,
                                        self._normalize_inputs(xs))

    def residual(self, *xs):
        """Evaluate the |equation residual| at the supplied points — the
        natural verification diagnostic (how well the PDE is satisfied).
        Accepts the same inputs as :meth:`predict`; for ensembles returns
        the per-model mean, for systems the sum over components.  Returns
        an ``(N, 1)`` numpy array."""
        if self._residual_jit is None:
            _, point_residual, _ = self._build_loss_fn(
                (("equation", 1.0),), lambda a, b: 0.0,
                use_plan=bool(self._plan_ok))
            if self.n_models > 1:
                def res_fn(params, leaves):
                    return jax.vmap(point_residual, in_axes=(0, None))(
                        params, leaves).mean(axis=0)
            else:
                res_fn = point_residual
            self._residual_jit = jax.jit(res_fn)
        # Shape-bucketed like predict_apply: one compile serves a sweep of
        # grid sizes.
        xs_concat, n = pad_to_bucket(self._normalize_inputs(xs))
        leaves = [xs_concat[:, i:i + 1] for i in range(self.model.total)]
        return np.asarray(self._residual_jit(self.model.params, leaves))[:n]

    def predict_grad(self, *xs):
        """First derivatives of the trained solution w.r.t. every coordinate
        (and parameter) column, at the supplied points — e.g. flux or
        velocity fields.

        Returns ``(N, ndims+nparams)`` for scalar problems,
        ``(N, ndims+nparams, n_out)`` for systems; the ensemble mean when
        ``n_models > 1``.  Uses the Taylor-mode tap machinery when the model
        supports it, nested-jvp taps otherwise.
        """
        if self._grad_jit is None:
            model = self.model
            total = model.total

            def one_model(params, xs_concat):
                leaves = [xs_concat[:, i:i + 1] for i in range(total)]
                with variable_scope("read", params["variables"]):
                    if model.supports_taylor:
                        derivs = {(a,) for a in range(total)}
                        table = model.full_taps(params, xs_concat, derivs)
                        cols = [table[(a,)] for a in range(total)]
                    else:
                        ctx = EvalContext(leaves)
                        f = Expr(lambda ls: model.apply(
                            params, jnp.concatenate(ls, axis=1)), ctx,
                            deriv=())
                        coords = [Expr(_leaf_fn(k), ctx, leaf_index=k)
                                  for k in range(total)]
                        cols = [D(f, coords[a]).value for a in range(total)]
                return jnp.stack(cols, axis=1)  # (N, total, n_out)

            if self.n_models > 1:
                def fn(params, xs_concat):
                    return jax.vmap(one_model, in_axes=(0, None))(
                        params, xs_concat).mean(axis=0)
            else:
                fn = one_model
            self._grad_jit = jax.jit(fn)

        xs_concat, n = pad_to_bucket(self._normalize_inputs(xs))
        out = np.asarray(self._grad_jit(self.model.params, xs_concat))[:n]
        return out[..., 0] if out.shape[-1] == 1 else out

    def predict(self, *xs):
        """Evaluate the trained solution at the supplied points.

        Accepts the same mixed inputs as the reference
        (``model_torch.py:466-487``): arrays, numbers (tiled to the batch),
        lists — plus a single ``(N, ndims+nparams)`` array of stacked
        coordinates.  Returns an ``(N, n_out)`` numpy array, where ``n_out``
        is the number of solution components (1 for scalar problems); the
        ensemble mean when ``n_models > 1``.
        """
        out = self._predict_raw(xs)
        if self.n_models > 1:
            out = out.mean(axis=0)
        return np.asarray(out)

    def predict_grid(self, *axes):
        """Evaluate the trained solution on the tensor-product grid of the
        given 1-D per-axis arrays; returns ``(N_1, ..., N_d, n_out)``.

        For a :class:`~pydens_tpu.SeparableModel` this uses the factorized
        path — ``d`` small MLP evaluations plus one einsum, so dense
        visualization/verification grids (e.g. ``256**3`` points) cost
        almost nothing; axis lengths are padded to power-of-two buckets so
        a sweep of grid sizes reuses one compiled executable.  Other models
        fall back to ``meshgrid`` + :meth:`predict` (pointwise cost)."""
        total = self.model.total
        if len(axes) != total:
            raise ValueError(f"predict_grid needs one 1-D array per input "
                             f"column ({total}), got {len(axes)}")
        dt = jax.dtypes.canonicalize_dtype(self.model.dtype)
        axes = [np.asarray(a, dt).ravel() for a in axes]
        if not getattr(self.model, "separable", False):
            grids = np.meshgrid(*axes, indexing="ij")
            out = self.predict(*[g.ravel() for g in grids])
            return out.reshape(grids[0].shape + (out.shape[-1],))
        if self._grid_eval_jit is None:
            model = self.model
            if self.n_models > 1:
                def fn(params, leaves):
                    return jax.vmap(model.apply_leaves,
                                    in_axes=(0, None))(params,
                                                       leaves).mean(axis=0)
            else:
                fn = model.apply_leaves
            self._grid_eval_jit = jax.jit(fn)
        ns = [a.size for a in axes]
        padded = []
        for k, a in enumerate(axes):
            b = 64
            while b < a.size:
                b *= 2
            if b > a.size:  # repeat-last-row padding, as pad_to_bucket
                a = np.concatenate([a, np.broadcast_to(a[-1:], (b - a.size,))])
            padded.append(a.reshape((1,) * k + (-1,) + (1,) * (total - k)))
        out = np.asarray(self._grid_eval_jit(self.model.params, padded))
        return out[tuple(slice(0, n) for n in ns)]

    def predict_all(self, *xs):
        """Per-model predictions, shape ``(n_models, N, n_out)``."""
        out = self._predict_raw(xs)
        if self.n_models == 1:
            out = out[None]
        return np.asarray(out)

    def predict_std(self, *xs):
        """Ensemble standard deviation — epistemic uncertainty of the
        learned solution, shape ``(N, n_out)``.  Requires ``n_models > 1``."""
        if self.n_models <= 1:
            raise ValueError("predict_std requires Solver(n_models > 1)")
        return np.asarray(self._predict_raw(xs).std(axis=0))

    # ------------------------------------------------------------------
    # checkpointing (superset of the reference, which has none — SURVEY §5)
    # ------------------------------------------------------------------
    def save(self, path):
        """Serialize parameters, V variables, optimizer state and the loss
        history to ``path`` (msgpack via flax.serialization)."""
        from .utils.checkpoint import save_solver
        save_solver(self, path)

    def load(self, path):
        """Restore a checkpoint produced by :meth:`save` into this solver
        (the solver must be constructed with the same problem/model config)."""
        from .utils.checkpoint import load_solver
        load_solver(self, path)
        return self

    def export(self, path=None, with_grad=False):
        """Serialize the trained solution field to a portable ahead-of-time
        serving artifact (StableHLO via ``jax.export``): parameters baked
        in, batch dimension shape-polymorphic, loadable by
        :func:`pydens_tpu.load_exported` in a bare JAX process on any
        backend.  ``with_grad=True`` makes the artifact return
        ``(u, du)`` with the ``predict_grad`` derivative fields.  Returns
        the artifact bytes (also written to ``path`` if given)."""
        from .utils.export import export_model
        return export_model(self, path, with_grad=with_grad)
