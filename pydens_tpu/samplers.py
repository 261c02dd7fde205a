"""Point samplers — the rebuild of the batchflow sampler suite that the
reference star-exports as its public API
(``/root/reference/pydens/__init__.py:5``; consumed surface at
``/root/reference/pydens/model_torch.py:433-434``).

Required protocol (reference docstring ``model_torch.py:376-380``):
``sampler.sample(size) -> np.ndarray`` of shape ``(size, ndims)``, plus the
``&`` product operator joining samplers into higher-dimensional joint
samplers (``README.md:82``).

TPU-native addition: every built-in sampler also implements
``sample_device(key, size) -> jnp.ndarray``, a stateless ``jax.random`` path
the Solver uses *inside* the jitted training scan, so collocation points are
generated in HBM and the fit loop never touches the host.  User-defined
samplers that only implement the host protocol still work — the Solver
pre-samples on the host and ships one batch array per fit chunk.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Sampler", "NumpySampler", "ConstantSampler", "HistoSampler",
           "ScipySampler", "ProductSampler", "MixtureSampler", "NS",
           "GeometrySampler", "BoundarySampler", "HaltonSampler"]


class Sampler:
    """Base sampler.

    Subclasses set ``ndims`` and implement :meth:`sample` (host, numpy) and
    optionally :meth:`sample_device` (device, jax.random).

    Composition:

    * ``a & b`` — product: joint sampler over ``a.ndims + b.ndims`` columns.
    * ``a | b`` — mixture: rows drawn from ``a`` or ``b`` (weights via
      ``w * sampler``).
    * ``w * sampler`` (scalar) — re-weights a mixture component.
    * ``sampler.apply(fn)`` — host-side transform of sampled points.
    """

    ndims = 1
    weight = 1.0

    # -- protocol -----------------------------------------------------------
    def sample(self, size):
        raise NotImplementedError

    def sample_device(self, key, size):
        raise NotImplementedError(
            f"{type(self).__name__} has no device-side sampling path")

    @property
    def supports_device(self):
        return type(self).sample_device is not Sampler.sample_device

    # -- composition --------------------------------------------------------
    def __and__(self, other):
        return ProductSampler(self, other)

    def __or__(self, other):
        return MixtureSampler([self, other])

    def __mul__(self, w):
        if isinstance(w, (int, float)):
            return _Weighted(self, float(w))
        return NotImplemented

    __rmul__ = __mul__

    def __add__(self, other):
        return BinOpSampler(self, other, "add")

    __radd__ = __add__

    def __sub__(self, other):
        return BinOpSampler(self, other, "sub")

    def __rsub__(self, other):
        return BinOpSampler(self, other, "rsub")

    def __truediv__(self, other):
        return BinOpSampler(self, other, "div")

    def times(self, other):
        """Elementwise product of samples (``*`` is reserved for mixture
        weights, so the sample-algebra product is a named method)."""
        return BinOpSampler(self, other, "mul")

    def shift(self, c):
        """Samples shifted by a constant."""
        return BinOpSampler(self, c, "add")

    def scale(self, c):
        """Samples scaled by a constant."""
        return BinOpSampler(self, c, "mul")

    def apply(self, fn):
        """Host-side pointwise transform: ``fn(points) -> points``."""
        return MappedSampler(self, fn)

    def truncate(self, low=None, high=None, max_tries=100):
        """Rejection-resample until all coordinates fall in ``[low, high]``.
        Host-only (rejection loops are data-dependent and do not jit)."""
        return TruncatedSampler(self, low, high, max_tries)


class _Weighted(Sampler):
    """Internal: a sampler with a mixture weight attached."""

    def __init__(self, base, weight):
        self.base = base
        self.ndims = base.ndims
        self.weight = weight

    def sample(self, size):
        return self.base.sample(size)

    def sample_device(self, key, size):
        return self.base.sample_device(key, size)

    @property
    def supports_device(self):
        return self.base.supports_device


# ---------------------------------------------------------------------------
# Distribution registry
# ---------------------------------------------------------------------------

def _u_host(rng, size, dim, low, high):
    return rng.uniform(low, high, (size, dim))


def _u_dev(key, size, dim, low, high):
    return jax.random.uniform(key, (size, dim), jnp.float32, low, high)


def _n_host(rng, size, dim, loc, scale):
    return rng.normal(loc, scale, (size, dim))


def _n_dev(key, size, dim, loc, scale):
    return jax.random.normal(key, (size, dim), jnp.float32) * scale + loc


def _e_host(rng, size, dim, scale):
    return rng.exponential(scale, (size, dim))


def _e_dev(key, size, dim, scale):
    return jax.random.exponential(key, (size, dim), jnp.float32) * scale


def _b_host(rng, size, dim, a, b):
    return rng.beta(a, b, (size, dim))


def _b_dev(key, size, dim, a, b):
    return jax.random.beta(key, a, b, (size, dim), jnp.float32)


def _g_host(rng, size, dim, shape, scale):
    return rng.gamma(shape, scale, (size, dim))


def _g_dev(key, size, dim, shape, scale):
    return jax.random.gamma(key, shape, (size, dim), jnp.float32) * scale


def _ln_host(rng, size, dim, mean, sigma):
    return rng.lognormal(mean, sigma, (size, dim))


def _ln_dev(key, size, dim, mean, sigma):
    return jnp.exp(jax.random.normal(key, (size, dim), jnp.float32)
                   * sigma + mean)


_DISTRIBUTIONS = {
    "uniform": (_u_host, _u_dev, {"low": 0.0, "high": 1.0}),
    "normal": (_n_host, _n_dev, {"loc": 0.0, "scale": 1.0}),
    "exponential": (_e_host, _e_dev, {"scale": 1.0}),
    "beta": (_b_host, _b_dev, {"a": 1.0, "b": 1.0}),
    "gamma": (_g_host, _g_dev, {"shape": 1.0, "scale": 1.0}),
    "lognormal": (_ln_host, _ln_dev, {"mean": 0.0, "sigma": 1.0}),
}

_ALIASES = {
    "u": "uniform",
    "n": "normal",
    "gaussian": "normal",
    "e": "exponential",
    "b": "beta",
    "g": "gamma",
    "ln": "lognormal",
}


class NumpySampler(Sampler):
    """Sampler over a named distribution, matching the batchflow usage in the
    reference docs: ``NumpySampler('uniform', low=1, high=5)``
    (``README.md:82``), ``NumpySampler('u', dim=2)`` (tutorial cell 39).

    Parameters
    ----------
    name : str
        Distribution name or alias: ``'u'/'uniform'``, ``'n'/'normal'``,
        ``'e'/'exponential'``, ``'b'/'beta'``, ``'g'/'gamma'``,
        ``'ln'/'lognormal'``.
    dim : int
        Number of i.i.d. output columns.
    seed : int, optional
        Host-side RNG seed (device path is keyed by the Solver).
    **kwargs
        Distribution parameters (e.g. ``low``/``high``, ``loc``/``scale``).
    """

    def __init__(self, name, dim=1, seed=None, **kwargs):
        canonical = _ALIASES.get(name, name)
        if canonical not in _DISTRIBUTIONS:
            raise ValueError(
                f"unknown distribution {name!r}; known: "
                f"{sorted(_DISTRIBUTIONS) + sorted(_ALIASES)}")
        host_fn, dev_fn, defaults = _DISTRIBUTIONS[canonical]
        unknown = set(kwargs) - set(defaults)
        if unknown:
            raise ValueError(f"{canonical} sampler got unexpected "
                             f"parameters {sorted(unknown)}; "
                             f"accepts {sorted(defaults)}")
        self.name = canonical
        self.ndims = int(dim)
        self.params = {**defaults, **kwargs}
        self._host_fn = host_fn
        self._dev_fn = dev_fn
        self._rng = np.random.default_rng(seed)

    def sample(self, size):
        return self._host_fn(self._rng, size, self.ndims, **self.params)

    def sample_device(self, key, size):
        return self._dev_fn(key, size, self.ndims, **self.params)


NS = NumpySampler  # tutorial shorthand (`from pydens import NumpySampler as NS`)


class ConstantSampler(Sampler):
    """Sampler returning a constant point (batchflow ``ConstantSampler``)."""

    def __init__(self, constant):
        self.constant = np.atleast_1d(np.asarray(constant, np.float32))
        self.ndims = self.constant.shape[-1]

    def sample(self, size):
        return np.tile(self.constant.reshape(1, -1), (size, 1))

    def sample_device(self, key, size):
        return jnp.tile(jnp.asarray(self.constant).reshape(1, -1), (size, 1))


class ScipySampler(Sampler):
    """Sampler over a ``scipy.stats`` distribution (host-only)."""

    def __init__(self, name, dim=1, seed=None, **kwargs):
        import scipy.stats
        self.dist = getattr(scipy.stats, name)(**kwargs)
        self.ndims = int(dim)
        self._rng = np.random.default_rng(seed)

    def sample(self, size):
        out = self.dist.rvs(size=(size, self.ndims),
                            random_state=self._rng)
        return np.asarray(out, np.float64).reshape(size, self.ndims)


class HistoSampler(Sampler):
    """Sampler from an n-d histogram: pick a bin by its mass, then sample
    uniformly inside it (batchflow ``HistoSampler``).

    Parameters
    ----------
    histo : tuple
        ``(H, edges)`` as returned by ``np.histogramdd``.
    """

    def __init__(self, histo, seed=None):
        counts, edges = histo
        counts = np.asarray(counts, np.float64)
        self.edges = [np.asarray(e, np.float64) for e in edges]
        self.ndims = counts.ndim
        total = counts.sum()
        if total <= 0:
            raise ValueError("histogram has no mass")
        self.probs = (counts / total).ravel()
        self.bin_shape = counts.shape
        self._rng = np.random.default_rng(seed)
        # Precompute per-flat-bin lower corners and widths for device path.
        idx = np.stack(np.unravel_index(np.arange(self.probs.size),
                                        self.bin_shape), axis=-1)
        self._lo = np.stack([self.edges[d][idx[:, d]]
                             for d in range(self.ndims)], axis=-1)
        self._hi = np.stack([self.edges[d][idx[:, d] + 1]
                             for d in range(self.ndims)], axis=-1)

    def sample(self, size):
        flat = self._rng.choice(self.probs.size, size=size, p=self.probs)
        u = self._rng.uniform(size=(size, self.ndims))
        return self._lo[flat] + u * (self._hi[flat] - self._lo[flat])

    def sample_device(self, key, size):
        k1, k2 = jax.random.split(key)
        logits = jnp.log(jnp.asarray(self.probs, jnp.float32) + 1e-30)
        flat = jax.random.categorical(k1, logits, shape=(size,))
        u = jax.random.uniform(k2, (size, self.ndims))
        lo = jnp.asarray(self._lo, jnp.float32)[flat]
        hi = jnp.asarray(self._hi, jnp.float32)[flat]
        return lo + u * (hi - lo)


_HALTON_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47,
                  53, 59, 61, 67, 71)


class HaltonSampler(Sampler):
    """Low-discrepancy (quasi-Monte-Carlo) collocation sampler — the Halton
    sequence with a per-draw random Cranley–Patterson rotation.

    QMC collocation covers the domain far more evenly than i.i.d. uniform
    draws (no clusters/gaps), a standard variance-reduction practice for
    PINN training; the random rotation keeps draws unbiased and gives every
    chunk fresh points.  No reference/batchflow counterpart.

    The radical-inverse computation is a fixed-digit integer recurrence —
    branch-free, shape-static, jit/TPU-friendly — so the device path runs
    INSIDE the compiled training loop like every other device sampler.

    Multi-dim domains should use ONE sampler with ``dim=n`` (and per-dim
    ``low``/``high`` sequences): each column then gets its own prime base,
    which is what makes the joint sequence low-discrepancy.  Composing two
    HaltonSamplers with ``&`` would otherwise silently reuse base 2 for
    both columns — an identical van-der-Corput sequence up to a constant
    rotation, i.e. every point on one wrapped diagonal line;
    :class:`ProductSampler` detects this and raises.  For deliberate
    composition pass disjoint ``base_index`` offsets.

    Parameters
    ----------
    dim : int
        Number of columns (consecutive prime bases; dim <= 20).
    low, high : float or per-dim sequences
        Domain box to scale into (default unit box).
    seed : int, optional
        Host-path RNG seed for the rotation.
    base_index : int
        Offset into the prime-base list (columns use primes
        ``base_index .. base_index + dim - 1``) — for composing several
        HaltonSamplers with ``&`` without base collisions.
    """

    def __init__(self, dim=1, low=0.0, high=1.0, seed=None, base_index=0):
        self.ndims = int(dim)
        self.base_index = int(base_index)
        if self.base_index + self.ndims > len(_HALTON_PRIMES):
            raise ValueError(
                f"HaltonSampler supports up to {len(_HALTON_PRIMES)} prime "
                f"bases; got dim={dim} at base_index={base_index}")
        self.low = np.broadcast_to(
            np.asarray(low, np.float32), (self.ndims,)).copy()
        self.high = np.broadcast_to(
            np.asarray(high, np.float32), (self.ndims,)).copy()
        self._bases = _HALTON_PRIMES[self.base_index:
                                     self.base_index + self.ndims]
        # Static digit counts: base ** digits covers every int32 index.
        self._digits = [int(np.ceil(31 / np.log2(b))) for b in self._bases]
        self._rng = np.random.default_rng(seed)
        self._counter = 0

    def _radical_inverse(self, n, d):
        """Vectorized radical inverse of integer vector ``n`` in the d-th
        prime base (works for both numpy and jnp inputs)."""
        base = self._bases[d]
        inv = n * 0.0
        f = 1.0 / base
        for _ in range(self._digits[d]):
            inv = inv + (n % base).astype(np.float32) * np.float32(f)
            n = n // base
            f /= base
        return inv

    def _scaled(self, idx, shift):
        cols = [(self._radical_inverse(idx, d) + shift[d]) % 1.0
                for d in range(self.ndims)]
        if isinstance(shift, np.ndarray):
            u = np.stack(cols, axis=-1)
        else:
            u = jnp.stack(cols, axis=-1)
        return self.low + u * (self.high - self.low)

    def sample(self, size):
        idx = np.arange(self._counter, self._counter + size, dtype=np.int64)
        self._counter += size
        shift = self._rng.uniform(size=self.ndims).astype(np.float32)
        return self._scaled(idx, shift)

    def sample_device(self, key, size):
        k_shift = jax.random.fold_in(key, 1)
        shift = jax.random.uniform(k_shift, (self.ndims,))
        idx = jnp.arange(size, dtype=jnp.int32)
        return self._scaled(idx, shift)


class GeometrySampler(Sampler):
    """Collocation points on an arbitrary geometry given by an indicator
    function — non-rectangular domains (the reference and the rebuild's
    ansatz bind conditions on boxes only; on general geometries boundary
    conditions are expressed as constraints with boundary samplers).

    Parameters
    ----------
    inside : callable
        ``inside(points) -> bool array`` over ``(N, ndims)`` points; must be
        jnp-traceable for the device path (numpy works for host-only use).
    bbox : sequence of (lo, hi)
        Bounding box to propose candidates from.
    oversample : int
        Candidate multiplier.  Host sampling rejects and redraws until the
        batch is full; device sampling (inside the compiled loop) draws
        ``oversample * size`` candidates once and fills the batch with valid
        ones — if fewer than ``size`` candidates land inside, valid points
        are repeated (raise ``oversample`` for thin geometries).

    Example (unit disk)::

        disk = GeometrySampler(lambda p: (p ** 2).sum(-1) <= 1.0,
                               bbox=[(-1, 1), (-1, 1)])
    """

    def __init__(self, inside, bbox, oversample=4, seed=None):
        self.inside = inside
        self.bbox = [tuple(map(float, b)) for b in bbox]
        self.ndims = len(self.bbox)
        self.oversample = int(oversample)
        self._rng = np.random.default_rng(seed)

    def _propose_host(self, n):
        lo = np.asarray([b[0] for b in self.bbox])
        hi = np.asarray([b[1] for b in self.bbox])
        return self._rng.uniform(lo, hi, (n, self.ndims))

    def sample(self, size):
        out = np.empty((0, self.ndims), np.float64)
        for _ in range(100):
            cand = self._propose_host(self.oversample * size)
            mask = np.asarray(self.inside(cand)).astype(bool).reshape(-1)
            out = np.vstack([out, cand[mask]])
            if len(out) >= size:
                return out[:size]
        raise RuntimeError(
            "GeometrySampler: indicator accepted too few points — is the "
            "bbox right?")

    def sample_device(self, key, size):
        n_cand = self.oversample * size
        lo = jnp.asarray([b[0] for b in self.bbox], jnp.float32)
        hi = jnp.asarray([b[1] for b in self.bbox], jnp.float32)
        cand = jax.random.uniform(key, (n_cand, self.ndims),
                                  jnp.float32, 0.0, 1.0) * (hi - lo) + lo
        valid = jnp.asarray(self.inside(cand)).reshape(-1)
        # Stable-order compaction: indices of valid candidates first; fill
        # the batch by cycling through them (duplicates only when fewer
        # than `size` candidates landed inside — check
        # :meth:`duplication_rate` and raise ``oversample`` for thin
        # geometries).
        order = jnp.argsort(~valid, stable=True)
        n_valid_raw = jnp.sum(valid)
        take = jnp.arange(size) % jnp.maximum(n_valid_raw, 1)
        picked = cand[order[take]]
        # Zero valid candidates must be VISIBLE: a NaN batch turns the loss
        # NaN immediately, instead of silently training on the best-sorted
        # out-of-domain point.
        return jnp.where(n_valid_raw > 0, picked,
                         jnp.full_like(picked, jnp.nan))

    def duplication_rate(self, size, trials=16):
        """Diagnostic: expected fraction of a device-sampled batch of
        ``size`` points that is duplicate-filled because fewer than ``size``
        of the ``oversample * size`` candidates landed inside the geometry.

        Duplicates bias the collocation distribution toward the accepted
        points; anything above ~0 means ``oversample`` should be raised.
        Returns the mean rate over ``trials`` candidate draws.  Read-only:
        uses its own RNG, so the sampler's seeded stream (and any seeded
        run using it) is unaffected.
        """
        rng = np.random.default_rng(0)
        lo = np.asarray([b[0] for b in self.bbox])
        hi = np.asarray([b[1] for b in self.bbox])
        rates = []
        for _ in range(trials):
            cand = rng.uniform(lo, hi, (self.oversample * size, self.ndims))
            valid = np.asarray(self.inside(cand)).astype(bool).reshape(-1)
            n_valid = int(valid.sum())
            rates.append(max(0, size - n_valid) / size)
        return float(np.mean(rates))


class BoundarySampler(Sampler):
    """Points on a parametrized boundary: ``surface(u) -> (N, ndims)`` maps
    uniform samples on ``[0, 1]^udim`` onto the boundary — the companion of
    :class:`GeometrySampler` for constraint-based boundary conditions.

    Example (unit circle)::

        circle = BoundarySampler(
            lambda u: jnp.concatenate([jnp.cos(2*jnp.pi*u),
                                       jnp.sin(2*jnp.pi*u)], axis=1),
            ndims=2)
    """

    def __init__(self, surface, ndims, udim=1, seed=None):
        self.surface = surface
        self.ndims = int(ndims)
        self.udim = int(udim)
        self._rng = np.random.default_rng(seed)

    def sample(self, size):
        u = self._rng.uniform(size=(size, self.udim))
        return np.asarray(self.surface(u)).reshape(size, self.ndims)

    def sample_device(self, key, size):
        u = jax.random.uniform(key, (size, self.udim), jnp.float32)
        return jnp.asarray(self.surface(u)).reshape(size, self.ndims)


class ProductSampler(Sampler):
    """Joint sampler over concatenated columns — the ``&`` operator
    (``README.md:82``: ``NumpySampler('uniform') & NumpySampler('uniform',
    low=1, high=5)``)."""

    def __init__(self, *samplers):
        flat = []
        for s in samplers:
            if isinstance(s, ProductSampler):
                flat.extend(s.samplers)
            else:
                flat.append(s)
        self.samplers = flat
        self.ndims = sum(s.ndims for s in flat)
        # Two Halton children sharing a prime base would yield perfectly
        # correlated columns (same van-der-Corput sequence up to a constant
        # rotation — all points on one wrapped diagonal): a silently
        # degenerate collocation set.  Fail fast instead.
        used = {}
        for s in flat:
            if isinstance(s, HaltonSampler):
                for b in s._bases:
                    if b in used:
                        raise ValueError(
                            f"HaltonSampler base collision in '&' product "
                            f"(prime base {b} used twice): columns would be "
                            "perfectly correlated. Use ONE HaltonSampler("
                            "dim=n, low=[...], high=[...]) for the joint "
                            "box, or give each component a disjoint "
                            "base_index.")
                    used[b] = s

    def sample(self, size):
        return np.hstack([s.sample(size) for s in self.samplers])

    def sample_device(self, key, size):
        keys = jax.random.split(key, len(self.samplers))
        return jnp.hstack([s.sample_device(k, size)
                           for s, k in zip(self.samplers, keys)])

    @property
    def supports_device(self):
        return all(s.supports_device for s in self.samplers)


class MixtureSampler(Sampler):
    """Row-wise mixture — the ``|`` operator; component weights come from
    ``w * sampler``."""

    def __init__(self, samplers, seed=None):
        flat = []
        for s in samplers:
            if isinstance(s, MixtureSampler):
                flat.extend(s.samplers)
            else:
                flat.append(s)
        self.samplers = flat
        dims = {s.ndims for s in flat}
        if len(dims) != 1:
            raise ValueError(f"mixture components must share ndims, got {dims}")
        self.ndims = dims.pop()
        w = np.asarray([s.weight for s in flat], np.float64)
        self.weights = w / w.sum()
        self._rng = np.random.default_rng(seed)

    def sample(self, size):
        comp = self._rng.choice(len(self.samplers), size=size,
                                p=self.weights)
        out = np.empty((size, self.ndims), np.float64)
        for i, s in enumerate(self.samplers):
            mask = comp == i
            n = int(mask.sum())
            if n:
                out[mask] = s.sample(n)
        return out

    def sample_device(self, key, size):
        keys = jax.random.split(key, len(self.samplers) + 1)
        logits = jnp.log(jnp.asarray(self.weights, jnp.float32))
        comp = jax.random.categorical(keys[0], logits, shape=(size,))
        draws = jnp.stack([s.sample_device(k, size)
                           for s, k in zip(self.samplers, keys[1:])])
        return jnp.take_along_axis(
            draws, comp[None, :, None].astype(jnp.int32), axis=0)[0]

    @property
    def supports_device(self):
        return all(s.supports_device for s in self.samplers)


class BinOpSampler(Sampler):
    """Pointwise algebra on samples: sampler (+,-,/,times) sampler-or-scalar.

    Operands draw independently; both host and device paths are supported
    when both operands support them.
    """

    _OPS = {"add": lambda a, b: a + b, "sub": lambda a, b: a - b,
            "rsub": lambda a, b: b - a, "mul": lambda a, b: a * b,
            "div": lambda a, b: a / b}

    def __init__(self, left, right, op):
        self.left = left
        self.right = right
        self.op = self._OPS[op]
        if isinstance(right, Sampler) and right.ndims != left.ndims:
            raise ValueError(
                f"sample algebra needs matching ndims, got {left.ndims} "
                f"and {right.ndims}")
        self.ndims = left.ndims

    def sample(self, size):
        rhs = (self.right.sample(size) if isinstance(self.right, Sampler)
               else self.right)
        return self.op(self.left.sample(size), rhs)

    def sample_device(self, key, size):
        k1, k2 = jax.random.split(key)
        rhs = (self.right.sample_device(k2, size)
               if isinstance(self.right, Sampler) else self.right)
        return self.op(self.left.sample_device(k1, size), rhs)

    @property
    def supports_device(self):
        rs = (self.right.supports_device if isinstance(self.right, Sampler)
              else True)
        return self.left.supports_device and rs


class MappedSampler(Sampler):
    """Host-side pointwise transform of another sampler."""

    def __init__(self, base, fn):
        self.base = base
        self.fn = fn
        # Discover the mapped width NOW: compositions built before the
        # first draw (truncate, mixtures, products) capture ndims at
        # construction, so a lazily-discovered width would leave them
        # validating/allocating against the base sampler's.  Probe with a
        # domain-plausible dummy (zeros), falling back to a real 1-point
        # draw for fns that reject it.
        try:
            probe = np.asarray(fn(np.zeros((1, base.ndims), np.float32)))
        except Exception:
            probe = np.asarray(fn(base.sample(1)))
        self.ndims = int(probe.shape[-1])

    def sample(self, size):
        out = np.asarray(self.fn(self.base.sample(size)))
        self.ndims = out.shape[-1]
        return out


class TruncatedSampler(Sampler):
    """Rejection-resampling truncation of another sampler (host-only)."""

    def __init__(self, base, low, high, max_tries=100):
        self.base = base
        self.low = low
        self.high = high
        self.max_tries = max_tries
        self.ndims = base.ndims

    def _ok(self, pts):
        ok = np.ones(len(pts), bool)
        if self.low is not None:
            ok &= np.all(pts >= self.low, axis=1)
        if self.high is not None:
            ok &= np.all(pts <= self.high, axis=1)
        return ok

    def sample(self, size):
        out = np.empty((0, self.ndims), np.float64)
        for _ in range(self.max_tries):
            pts = self.base.sample(size)
            out = np.vstack([out, pts[self._ok(pts)]])
            if len(out) >= size:
                return out[:size]
        raise RuntimeError(
            f"truncate: {self.max_tries} rounds of rejection sampling did "
            "not produce enough in-range points")
