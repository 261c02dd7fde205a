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
forward+backward kernel"): the
kernel is correct but 0.55-0.84x the best XLA path at 64k-1M batches —
Mosaic codegen for tiny-K (<=64) matmul chains eats the bandwidth savings.
It therefore stays opt-in (``PYDENS_TPU_FUSED_TAYLOR=always``); the XLA
paths are the default.
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

    def _forward_states(x, ws, bs):
        """Trace the traversal; returns the final streams plus the saved
        per-layer states the adjoint needs.  ``streams`` is a list
        [V, T..., S...] of (tile, width) values."""
        rows = x.shape[0]
        V = x
        # One-hot tangent columns via iota-compare (Mosaic has no scatter).
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, in_dim), 1)
        T = [(col == d).astype(x.dtype) for d in firsts]
        S = [jnp.zeros((rows, in_dim), x.dtype) for _ in pairs]
        saved = []  # one entry per token: ('f', in_streams) | ('a', pre_V_T)
        di, ai = 0, 0
        for tok in tokens:
            if tok in ("f", "c"):
                # Streams stay separate: inside the kernel there is no
                # launch cost for a stacked matmul to amortize, and Mosaic's
                # sublane-dim tpu.concatenate miscompiles/crashes on narrow
                # (lanes < 8) vectors (measured on the v5e tunnel, 08/2026).
                streams = [V] + T + S
                saved.append(("f", streams))
                outs = [jnp.dot(s, ws[di],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                        for s in streams]
                V = outs[0] + bs[di]
                T = outs[1:1 + len(firsts)]
                S = outs[1 + len(firsts):]
                di += 1
            else:  # 'a'
                act = acts[ai]
                saved.append(("a", (V, list(T), list(S))))
                sd = _sigma_derivs(act, V, max_sigma)
                if pairs:
                    S = [sd[2] * T[d_pos[a]] * T[d_pos[b]] + sd[1] * S[j]
                         for j, (a, b) in enumerate(pairs)]
                T = [sd[1] * t for t in T]
                V = sd[0]
                ai += 1
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

        first_step = pl.program_id(0) == 0
        wgrads = [None] * n_dense
        bgrads = [None] * n_dense
        di = n_dense
        ai = sum(1 for t in tokens if t == "a")
        for tok, save in zip(reversed(tokens), reversed(saved)):
            if tok in ("f", "c"):
                di -= 1
                _, in_streams = save
                # Per-stream dots (see _forward_states on why no dim-0
                # concat): the weight gradient sums over streams AND batch.
                g_streams = [gV] + gT + gS
                wg = None
                for s_in, s_g in zip(in_streams, g_streams):
                    term = jnp.dot(s_in.T, s_g,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                    wg = term if wg is None else wg + term
                wgrads[di] = wg
                bgrads[di] = jnp.sum(gV, axis=0, keepdims=True)
                backs = [jnp.dot(s_g, ws[di].T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                         for s_g in g_streams]
                gV = backs[0]
                gT = backs[1:1 + len(firsts)]
                gS = backs[1 + len(firsts):]
            else:  # 'a'
                ai -= 1
                act = acts[ai]
                _, (V0, T0, S0) = save
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
                gV, gT, gS = nV, nT, nS
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
