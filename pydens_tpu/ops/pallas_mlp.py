"""Fused layout-MLP forward kernel (Pallas/Mosaic) — EXPERIMENTAL, opt-in.

The kernel tiles the batch over a 1-D grid and keeps each tile's activations
in VMEM across the whole layer chain (weights resident in VMEM), aiming to
cut per-layer HBM round-trips on dense-grid ``predict`` calls.

Measured verdict on a v5e chip ('fa fa fa f' [64,64,64,1] Tanh, f32,
``benchmarks/bench_predict.py``): XLA already pipelines this workload at or
near bandwidth — the fused kernel is ~1.4x at 64k points but 0.4-0.8x at
256k+ (Mosaic's f32 full-precision dots and tile padding cost more than the
saved traffic).  The same conclusion held for a whole-training-step
megakernel (value_and_grad traced into the kernel body): inside a compiled
XLA loop there is no per-op launch cost for Pallas to remove, and Mosaic
lowers small shapes worse than XLA's fusions (~7x slower end-to-end).

The kernel is therefore OFF by default and kept as a validated building
block (numerically exact vs the XLA path at HIGHEST dot precision — see
tests/test_pallas_mlp.py): enable with ``PYDENS_TPU_FUSED=always``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layout import parse_layout

__all__ = ["make_fused_mlp_forward"]

_TILE = 1024  # batch rows per grid program; activations tile (TILE, width)


def make_fused_mlp_forward(layout, acts, layer_names, interpret=False):
    """Build ``fused_apply(net_params, x) -> y`` for a layout-string MLP.

    Parameters
    ----------
    layout : str
        The layout string ('f'/'c' dense, 'a' activation, 'R'/'+' skips).
    acts : sequence of callables
        Resolved activation callables, one per 'a' slot.
    layer_names : sequence of str
        Parameter-dict keys of the dense layers, in order.
    interpret : bool
        Run the kernel in interpreter mode (for CPU tests).
    """
    tokens = parse_layout(layout)

    def kernel(x_ref, *refs):
        # refs: w1, b1, w2, b2, ..., out_ref
        out_ref = refs[-1]
        h = x_ref[...]
        stack = []
        di, ai = 0, 0
        for tok in tokens:
            if tok in ("f", "c"):
                w = refs[2 * di][...]
                b = refs[2 * di + 1][...]
                h = jnp.dot(h, w, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) + b
                di += 1
            elif tok == "a":
                h = acts[ai](h)
                ai += 1
            elif tok == "R":
                stack.append(h)
            elif tok == "+":
                h = h + stack.pop()
        out_ref[...] = h.astype(out_ref.dtype)

    def fused_apply(net_params, x):
        n, in_dim = x.shape
        out_dim = net_params[layer_names[-1]]["w"].shape[1]
        n_pad = -(-n // _TILE) * _TILE
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        weights = []
        for name in layer_names:
            weights.append(net_params[name]["w"])
            weights.append(net_params[name]["b"].reshape(1, -1))

        grid = (n_pad // _TILE,)
        in_specs = [pl.BlockSpec((_TILE, in_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in weights:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), x.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_TILE, out_dim), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, *weights)
        return out[:n]

    return fused_apply
