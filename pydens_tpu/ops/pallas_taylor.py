"""Fused Taylor-traversal training kernel (Pallas/Mosaic) — the hand-fused
forward+backward pass for order-<=2 derivative plans on dense-chain MLPs.

Motivation (BENCHMARKS.md "Large-batch roofline"): at collocation batches
>= 64k the XLA training step is HBM-bandwidth-bound at ~50 kB/point — the
per-layer, per-tap-stream intermediates stream through HBM between fused
ops.  This kernel keeps the ENTIRE batched-tangent traversal (value + first
+ second directional-derivative streams) and its reverse pass in VMEM for a
batch tile: per step, HBM sees only the input points, the (tiny) final tap
columns, their cotangents, and the parameter gradients — O(50) bytes/point
instead of O(50k).

Scope (checked by ``supports``): dense-chain layouts (``f``/``a`` tokens,
no skips), one elementwise activation chain, identity input state (no
periodic embedding), derivative multi-indices of order <= 2 (pure or
mixed), float32.  Everything else uses the XLA paths.

The backward pass is a hand-derived adjoint of the traversal (same
recurrences as ``layout.taylor_taps`` read backwards), wrapped in
``jax.custom_vjp``; the backward kernel recomputes the forward states
in VMEM (they never hit HBM) and accumulates parameter gradients across
batch tiles through the sequential TPU grid.

Correctness: differential-tested against the XLA Taylor plan (values and
parameter gradients) in tests/test_pallas_taylor.py (interpret mode on
CPU, the real Mosaic lowering on TPU).

Measured verdict (v5e, BENCHMARKS.md "Fused Pallas Taylor
forward+backward kernel" and "... retired"): the kernel is correct but
0.55-0.84x the best XLA path at 64k-1M batches — Mosaic codegen for
tiny-K (<=64) matmul chains eats the bandwidth savings.  The round-5
fix attempt (row-stacking the streams so each dense is ONE
(n_streams*tile, K) matmul and the weight gradient contracts over
n_streams*tile — ``PYDENS_TPU_TAYLOR_STACKED=1``) is differential-
correct but hangs the Mosaic compile at width 64; the kernel is RETIRED
from the performance roadmap and stays opt-in
(``PYDENS_TPU_FUSED_TAYLOR=always``) for study only.  The XLA paths are
the default; the large-batch frontier is their measured HBM bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_fused_taylor", "supports"]

_TILE = 2048  # max batch rows per grid program
_MAX_STACKED_ROWS = 8192  # tile * n_streams cap (see _tile_for)

# The backward kernel recomputes and holds every layer's stream state in
# VMEM (that is the point — HBM never sees them); at tile 1024 x 5 streams
# x 4 layers that is ~21 MB of scoped stack, above the 16 MB default limit.
# v5e has 128 MiB of VMEM per core; grant the kernel most of it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _stacked_enabled():
    """Row-stacked stream traversal (one wide matmul per dense layer instead
    of one tiny-K matmul per stream) — the round-5 targeted attempt at the
    measured Mosaic tiny-K chain inefficiency.  Differential-correct
    (tests/test_pallas_taylor.py runs both modes) and compiles+runs on TPU
    at width 16, but the Mosaic remote compile HANGS (>9 min, no error) at
    width 64 for any tile in {512, 1024} (v5e tunnel, 08/2026) — exactly
    the widths where the kernel could matter.  Default OFF; set
    ``PYDENS_TPU_TAYLOR_STACKED=1`` to study it.  Closure recorded in
    BENCHMARKS.md "Fused Pallas Taylor kernel: retired"."""
    import os
    return os.environ.get("PYDENS_TPU_TAYLOR_STACKED", "0") == "1"


def _tile_for(n_streams):
    """Batch-tile rows for a kernel with ``n_streams`` stacked streams.

    Measured on the v5e tunnel (August 2026): kernels whose stacked
    traversal matrix exceeds ~8192 rows (5 streams x 2048 rows) fail in
    the remote TPU compile helper, while the same kernel at 5 x 1024
    compiles and runs; synthetic kernels of the same nominal shapes pass,
    so the trigger is overall program size, not one op.  Empirical rule:
    largest power-of-two tile with ``n_streams * tile <= 8192``, capped
    at ``_TILE``, floor 256."""
    tile = _TILE
    while tile > 256 and n_streams * tile > _MAX_STACKED_ROWS:
        tile //= 2
    return tile


def supports(tokens, closure, periodic_dims=()):
    """Whether the fused kernel covers this (layout, plan) combination."""
    if any(t not in ("f", "c", "a") for t in tokens):
        return False  # skip connections not implemented in v1
    if periodic_dims:
        return False  # embedding init state not implemented in v1
    return all(len(mi) <= 2 for mi in closure)


def _sigma_derivs(act, v, order):
    """sigma'(v) [, sigma''(v), sigma'''(v)] via nested jvp-with-ones —
    the same generic construction as layout.taylor_taps, traced inside the
    kernel body (elementwise, lowers to VPU ops)."""
    ones = jnp.ones_like(v)
    sv, d1 = jax.jvp(act, (v,), (ones,))
    out = [sv, d1]
    fk = act
    for _ in range(2, order + 1):
        fk = (lambda f: lambda z: jax.jvp(f, (z,),
                                          (jnp.ones_like(z),))[1])(fk)
        out.append(jax.jvp(fk, (v,), (ones,))[1])
    return out  # [sigma(v), sigma'(v), ...]


def make_fused_taylor(tokens, acts, layer_names, in_dim, closure,
                      interpret=False):
    """Build the fused forward+backward tap computation.

    Returns ``taps(net_params, x) -> (n, S * out_dim)`` with streams
    ``[V, T_first..., S_pair...]`` stacked along the last axis, registered
    with a custom VJP whose backward runs as one Pallas kernel.

    Parameters
    ----------
    tokens : list of str
        Parsed layout tokens (``f``/``c``/``a`` only).
    acts : sequence of callables
        Resolved activations per ``a`` slot.
    layer_names : sequence of str
        Dense-layer parameter keys, in order.
    in_dim : int
        Input feature dimension.
    closure : sequence of tuple
        Downward-closed multi-indices, order <= 2 (from
        ``Model.plan_closure``).
    """
    firsts = [mi[0] for mi in closure if len(mi) == 1]
    pairs = [mi for mi in closure if len(mi) == 2]
    if not supports(tokens, closure):
        raise ValueError("fused taylor kernel: unsupported layout/plan")
    n_streams = 1 + len(firsts) + len(pairs)
    tile = _tile_for(n_streams)
    d_pos = {d: i for i, d in enumerate(firsts)}
    max_sigma = 2 if pairs else 1  # backward needs one more (see below)

    def _dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def _split_stk(ST, rows):
        """Stacked (n_streams*rows, w) -> ([V], T list, S list) by static
        row slices (slicing is always safe; it is dim-0 *concatenate* of
        narrow blocks that crashes Mosaic)."""
        V = ST[0:rows]
        T = [ST[(1 + i) * rows:(2 + i) * rows] for i in range(len(firsts))]
        S = [ST[(1 + len(firsts) + j) * rows:(2 + len(firsts) + j) * rows]
             for j in range(len(pairs))]
        return V, T, S

    def _act_streams(act, V, T, S):
        """One activation step on separate streams; returns new (V, T, S)."""
        sd = _sigma_derivs(act, V, max_sigma)
        if pairs:
            S = [sd[2] * T[d_pos[a]] * T[d_pos[b]] + sd[1] * S[j]
                 for j, (a, b) in enumerate(pairs)]
        T = [sd[1] * t for t in T]
        return sd[0], T, S

    def _forward_states(x, ws, bs):
        """Trace the traversal; returns the final streams plus the saved
        per-layer states the adjoint needs.

        Between wide layers the ``n_streams`` tap streams run STACKED along
        the row (sublane) dimension — each dense is then ONE
        (n_streams*tile, K) @ (K, N) matmul instead of n_streams tiny ones,
        which amortizes Mosaic's fixed per-matmul cost (the measured reason
        the r04 kernel lost to XLA: tiny-K matmul chains).  The stacked
        region is gated per boundary to widths >= 8 lanes because Mosaic's
        dim-0 tpu.concatenate miscompiles/crashes on narrower vectors
        (measured on the v5e tunnel, 08/2026); the first dense (K = in_dim,
        narrow) and the last dense's output (out_dim, narrow) run on
        separate streams, which is also where per-stream work is cheapest.
        ``PYDENS_TPU_TAYLOR_STACKED=0`` forces separate streams throughout.
        """
        rows = x.shape[0]
        V = x
        # One-hot tangent columns via iota-compare (Mosaic has no scatter).
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, in_dim), 1)
        T = [(col == d).astype(x.dtype) for d in firsts]
        S = [jnp.zeros((rows, in_dim), x.dtype) for _ in pairs]
        ST = None  # stacked state when mode == 'stk'
        mode = "sep"
        saved = []  # per token: (tok, mode, payload)
        di, ai = 0, 0
        n_dense = len(layer_names)
        for tok in tokens:
            if tok in ("f", "c"):
                out_w = ws[di].shape[1]
                stackable = (_stacked_enabled() and n_streams > 1
                             and di < n_dense - 1 and out_w >= 8)
                if mode == "sep":
                    streams = [V] + T + S
                    saved.append(("f", "sep", streams))
                    outs = [_dot(s, ws[di]) for s in streams]
                    V = outs[0] + bs[di]
                    T = outs[1:1 + len(firsts)]
                    S = outs[1 + len(firsts):]
                    if stackable:
                        ST = jnp.concatenate([V] + T + S, axis=0)
                        mode = "stk"
                else:
                    saved.append(("f", "stk", ST))
                    out = _dot(ST, ws[di])
                    # The bias lands on the V block only (rows < tile).
                    row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
                    out = out + jnp.where(row < rows, 1.0, 0.0
                                          ).astype(out.dtype) * bs[di]
                    if stackable:
                        ST = out
                    else:
                        V, T, S = _split_stk(out, rows)
                        mode = "sep"
                di += 1
            else:  # 'a'
                act = acts[ai]
                if mode == "sep":
                    saved.append(("a", "sep", (V, list(T), list(S))))
                    V, T, S = _act_streams(act, V, T, S)
                else:
                    Vb, Tb, Sb = _split_stk(ST, rows)
                    saved.append(("a", "stk", (Vb, Tb, Sb)))
                    nV, nT, nS = _act_streams(act, Vb, Tb, Sb)
                    ST = jnp.concatenate([nV] + nT + nS, axis=0)
                ai += 1
        if mode == "stk":  # layout ends on a stacked token
            V, T, S = _split_stk(ST, rows)
        return V, T, S, saved

    def fwd_kernel(x_ref, *refs):
        out_ref = refs[-1]
        n_dense = len(layer_names)
        ws = [refs[2 * i][...] for i in range(n_dense)]
        bs = [refs[2 * i + 1][...] for i in range(n_dense)]
        V, T, S, _ = _forward_states(x_ref[...], ws, bs)
        out_ref[...] = jnp.concatenate([V] + T + S, axis=1)

    def bwd_kernel(x_ref, *refs):
        n_dense = len(layer_names)
        g_ref = refs[2 * n_dense]
        wg_refs = refs[2 * n_dense + 1:2 * n_dense + 1 + n_dense]
        bg_refs = refs[2 * n_dense + 1 + n_dense:
                       2 * n_dense + 1 + 2 * n_dense]
        xg_ref = refs[-1]
        ws = [refs[2 * i][...] for i in range(n_dense)]
        bs = [refs[2 * i + 1][...] for i in range(n_dense)]

        V, T, S, saved = _forward_states(x_ref[...], ws, bs)
        out_dim = V.shape[1]
        g = g_ref[...]
        gV = g[:, 0:out_dim]
        gT = [g[:, (1 + i) * out_dim:(2 + i) * out_dim]
              for i in range(len(firsts))]
        gS = [g[:, (1 + len(firsts) + j) * out_dim:
                 (2 + len(firsts) + j) * out_dim]
              for j in range(len(pairs))]

        def _act_adjoint(act, V0, T0, S0, gV, gT, gS):
            # sigma', sigma'', sigma''' at the pre-activation value:
            # the adjoint of S = sigma''*T_a*T_b + sigma'*S reads one
            # derivative order deeper than the forward.
            sd = _sigma_derivs(act, V0, max_sigma + 1)
            d1, d2 = sd[1], sd[2] if len(sd) > 2 else None
            d3 = sd[3] if len(sd) > 3 else None
            nV = gV * d1
            nT = [gt * d1 for gt in gT]
            nS = [gs * d1 for gs in gS]
            for i in range(len(firsts)):
                nV = nV + gT[i] * d2 * T0[i]
            for j, (a, b) in enumerate(pairs):
                ia, ib = d_pos[a], d_pos[b]
                nV = nV + gS[j] * (d3 * T0[ia] * T0[ib] + d2 * S0[j])
                nT[ia] = nT[ia] + gS[j] * d2 * T0[ib]
                nT[ib] = nT[ib] + gS[j] * d2 * T0[ia]
            return nV, nT, nS

        rows = x_ref.shape[0]
        first_step = pl.program_id(0) == 0
        wgrads = [None] * n_dense
        bgrads = [None] * n_dense
        G = None  # stacked cotangent when g_mode == 'stk'
        g_mode = "sep"
        di = n_dense
        ai = sum(1 for t in tokens if t == "a")
        for save in reversed(saved):
            tok, fmode, payload = save
            if tok in ("f", "c"):
                di -= 1
                if fmode == "sep":
                    if g_mode == "stk":
                        # Forward stacked right after this layer; its own
                        # inputs are separate — split the cotangent back.
                        gV, gT, gS = _split_stk(G, rows)
                        g_mode = "sep"
                    in_streams = payload
                    # Per-stream dots: K = this layer's input width, too
                    # narrow to stack (see _forward_states); the weight
                    # gradient sums over streams AND batch.
                    g_streams = [gV] + gT + gS
                    wg = None
                    for s_in, s_g in zip(in_streams, g_streams):
                        term = _dot(s_in.T, s_g)
                        wg = term if wg is None else wg + term
                    wgrads[di] = wg
                    bgrads[di] = jnp.sum(gV, axis=0, keepdims=True)
                    backs = [_dot(s_g, ws[di].T) for s_g in g_streams]
                    gV = backs[0]
                    gT = backs[1:1 + len(firsts)]
                    gS = backs[1 + len(firsts):]
                else:  # inputs were stacked
                    ST_in = payload
                    if g_mode == "sep":
                        # Output side is separate (the last dense / a
                        # narrow output): per-stream wg from slices of the
                        # stacked input, then stack the wide cotangents.
                        g_streams = [gV] + gT + gS
                        wg = None
                        for s_idx, s_g in enumerate(g_streams):
                            s_in = ST_in[s_idx * rows:(s_idx + 1) * rows]
                            term = _dot(s_in.T, s_g)
                            wg = term if wg is None else wg + term
                        wgrads[di] = wg
                        bgrads[di] = jnp.sum(gV, axis=0, keepdims=True)
                        G = jnp.concatenate(
                            [_dot(s_g, ws[di].T) for s_g in g_streams],
                            axis=0)
                        g_mode = "stk"
                    else:
                        # Fully stacked: ONE weight-gradient matmul whose
                        # contraction dim is n_streams*tile (the big-K win)
                        # and one back-propagating matmul.
                        wgrads[di] = _dot(ST_in.T, G)
                        bgrads[di] = jnp.sum(G[0:rows], axis=0,
                                             keepdims=True)
                        G = _dot(G, ws[di].T)
            else:  # 'a'
                ai -= 1
                act = acts[ai]
                V0, T0, S0 = payload  # saved as separate blocks either mode
                if g_mode == "stk":
                    gVb, gTb, gSb = _split_stk(G, rows)
                    nV, nT, nS = _act_adjoint(act, V0, T0, S0,
                                              gVb, gTb, gSb)
                    G = jnp.concatenate([nV] + nT + nS, axis=0)
                else:
                    # Cotangents still separate (e.g. a trailing activation
                    # whose forward state was split at the walk's end).
                    gV, gT, gS = _act_adjoint(act, V0, T0, S0, gV, gT, gS)
        assert g_mode == "sep", "backward walk must end on separate streams"
        xg_ref[...] = gV  # input V-stream adjoint = d loss / d x

        for i in range(n_dense):
            @pl.when(first_step)
            def _(i=i):
                wg_refs[i][...] = jnp.zeros_like(wg_refs[i])
                bg_refs[i][...] = jnp.zeros_like(bg_refs[i])
            wg_refs[i][...] += wgrads[i]
            bg_refs[i][...] += bgrads[i]

    def _weights(net_params):
        flat = []
        for name in layer_names:
            flat.append(net_params[name]["w"])
            flat.append(net_params[name]["b"].reshape(1, -1))
        return flat

    def _pallas_fwd(flat_weights, x):
        n = x.shape[0]
        out_dim = flat_weights[-2].shape[1]
        n_pad = -(-n // tile) * tile
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
        grid = (n_pad // tile,)
        in_specs = [pl.BlockSpec((tile, in_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in flat_weights:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((n_pad, n_streams * out_dim),
                                           x.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, n_streams * out_dim),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )(xp, *flat_weights)
        return out[:n]

    def _pallas_bwd(flat_weights, x, g):
        n = x.shape[0]
        n_pad = -(-n // tile) * tile
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
            # Padded rows contribute zero cotangent -> zero gradient.
            g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
        grid = (n_pad // tile,)
        in_specs = [pl.BlockSpec((tile, in_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in flat_weights:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        out_shapes = ([jax.ShapeDtypeStruct(w.shape, w.dtype)
                       for w in flat_weights[0::2]]
                      + [jax.ShapeDtypeStruct(b.shape, b.dtype)
                         for b in flat_weights[1::2]]
                      + [jax.ShapeDtypeStruct((n_pad, in_dim), x.dtype)])
        out_specs = ([pl.BlockSpec(w.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
                      for w in flat_weights[0::2]]
                     + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for b in flat_weights[1::2]]
                     + [pl.BlockSpec((tile, in_dim), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)])
        outs = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )(x, *flat_weights, g)
        n_dense = len(layer_names)
        wgrads = outs[:n_dense]
        bgrads = outs[n_dense:2 * n_dense]
        xgrad = outs[-1][:n]
        flat_grads = []
        for i in range(n_dense):
            flat_grads.append(wgrads[i])
            flat_grads.append(bgrads[i])
        return flat_grads, xgrad

    @jax.custom_vjp
    def taps_flat(flat_weights, x):
        return _pallas_fwd(flat_weights, x)

    def taps_fwd(flat_weights, x):
        return _pallas_fwd(flat_weights, x), (flat_weights, x)

    def taps_bwd(res, g):
        flat_weights, x = res
        flat_grads, xgrad = _pallas_bwd(flat_weights, x, g)
        return flat_grads, xgrad

    taps_flat.defvjp(taps_fwd, taps_bwd)

    def taps(net_params, x):
        """(V, {(d,): T_d}, {(a,b): S_ab}) via the fused kernel."""
        out = taps_flat(_weights(net_params), x)
        out_dim = out.shape[1] // n_streams
        V = out[:, :out_dim]
        taps_d = {}
        for i, d in enumerate(firsts):
            taps_d[(d,)] = out[:, (1 + i) * out_dim:(2 + i) * out_dim]
        for j, p in enumerate(pairs):
            k = 1 + len(firsts) + j
            taps_d[tuple(p)] = out[:, k * out_dim:(k + 1) * out_dim]
        return V, taps_d

    return taps
