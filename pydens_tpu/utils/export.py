"""Ahead-of-time model export — the serving/deployment artifact.

A trained solution field serializes to a self-contained StableHLO artifact
via ``jax.export``: network parameters are baked in as constants, the batch
dimension is shape-polymorphic, and the artifact round-trips through a
byte-string that loads in any JAX process on any backend — the serving side
never needs pydens_tpu, the Python equation, or the training machinery.

The reference has no persistence or serving story at all (SURVEY §5); for a
TPU-production framework the AOT artifact with a stable serialization is the
deployment unit (the same mechanism TF-Serving/IFRT consume).

Scope: the exported function is the plain XLA inference path
(network + ansatz + V-variables; ensembles export as the member-mean) —
the opt-in Pallas fused kernels are deliberately NOT exported, as their
custom-calls would tie the artifact to one backend generation.
"""

import jax
import jax.numpy as jnp

__all__ = ["export_model", "load_exported"]

_MAGIC = b"PDTPUEXP1"


def export_model(solver, path=None, with_grad=False):
    """Serialize the trained solution ``u_theta`` to a portable artifact.

    Parameters
    ----------
    solver : Solver
        A (trained) solver; current parameters are baked into the artifact.
    path : str | None
        If given, the artifact is written there; the bytes are returned
        either way.
    with_grad : bool
        If true, the artifact returns ``(u, du)`` with ``du`` of shape
        ``(N, total, n_out)`` — derivative fields (fluxes, velocities)
        served without the framework, matching ``Solver.predict_grad``.

    Returns
    -------
    bytes — ``load_exported``-compatible artifact (magic + StableHLO).
    """
    from jax import export as jax_export

    model = solver.model
    if model.params is None:
        raise ValueError("solver has no parameters to export")
    # Pull parameters to host numpy: a mesh-trained solver's params carry
    # multi-device shardings, and baking those into the closure would pin
    # the artifact to the training topology (nr_devices = mesh size).
    params = jax.device_get(model.params)

    if model.ensemble_size > 1:
        def value_fn(xs):
            member = jax.vmap(model._apply_with_variables, in_axes=(0, None))
            return jnp.mean(member(params, xs), axis=0)
    else:
        def value_fn(xs):
            return model._apply_with_variables(params, xs)

    if with_grad:
        def apply_fn(xs):
            # Batch-diagonal jvp per input column (same tap construction as
            # the D token): tangent e_a broadcast over the batch.
            total = xs.shape[1]
            u = value_fn(xs)
            cols = []
            for a in range(total):
                basis = jnp.zeros((total,), xs.dtype).at[a].set(1.0)
                cols.append(jax.jvp(value_fn, (xs,),
                                    (jnp.broadcast_to(basis, xs.shape),))[1])
            return u, jnp.stack(cols, axis=1)
    else:
        apply_fn = value_fn

    (batch,) = jax_export.symbolic_shape("batch")
    spec = jax.ShapeDtypeStruct((batch, model.total), model.dtype)
    # Lower for every mainstream backend so the serving process need not
    # match the training one (train on TPU, serve on CPU and vice versa).
    exported = jax_export.export(
        jax.jit(apply_fn), platforms=("cpu", "tpu", "cuda"))(spec)
    blob = _MAGIC + exported.serialize()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Load an ``export_model`` artifact into a plain callable.

    Accepts a path or the raw bytes; returns ``fn(xs) -> (N, n_out)`` —
    or ``fn(xs) -> (u, du)`` with ``du`` of shape ``(N, total, n_out)``
    for artifacts exported with ``with_grad=True`` — where ``xs`` is any
    ``(N, ndims + nparams)`` array (the batch dimension is
    shape-polymorphic).  Works in a bare JAX process — pydens_tpu itself is
    only needed for this loader, and ``jax.export.deserialize`` alone can
    consume ``blob[len(b'PDTPUEXP1'):]`` without it.
    """
    from jax import export as jax_export

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    if not blob.startswith(_MAGIC):
        raise ValueError("not a pydens_tpu export artifact")
    exported = jax_export.deserialize(blob[len(_MAGIC):])

    def fn(xs):
        xs = jnp.asarray(xs)
        if xs.ndim != 2:
            raise ValueError(f"expected a (N, in_dim) batch, got {xs.shape}")
        return exported.call(xs)

    return fn
