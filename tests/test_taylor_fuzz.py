"""Randomized differential fuzz: the Taylor plan must equal the nested-jvp
fallback (loss and parameter gradients) across random layouts, activations,
dimensionalities and derivative structures."""

import itertools
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pydens_tpu as pdt
from pydens_tpu import Solver, D

LAYOUTS = ["fa f", "fa fa f", "faR fa+ f", "fa fa fa f"]
ACTS = ["Tanh", "Sigmoid", "sin", "gelu", "softplus"]


def random_equation(rng, total, n_out):
    """Build a random residual from field taps of order <= 4 + algebra.
    The random structure is drawn HERE, once — the returned callable must be
    deterministic (it is traced multiple times, like any jitted function)."""
    second_pairs = [(rng.randrange(total), rng.randrange(total))
                    for _ in range(rng.randint(1, 3))]
    third_triples = [tuple(rng.randrange(total) for _ in range(3))
                     for _ in range(rng.randint(0, 2))]
    fourth_quads = [tuple(rng.randrange(total) for _ in range(4))
                    for _ in range(rng.randint(0, 1))]
    first_dir = rng.randrange(total)
    coeff = rng.uniform(0.5, 2.0)
    nl_dir = rng.randrange(total)

    def equation(f, *coords):
        terms = [D(D(f, coords[a]), coords[b]) for a, b in second_pairs]
        terms.extend(D(D(D(f, coords[a]), coords[b]), coords[c])
                     for a, b, c in third_triples)
        terms.extend(D(D(D(D(f, coords[a]), coords[b]), coords[c]),
                       coords[d])
                     for a, b, c, d in fourth_quads)
        terms.append(coeff * D(f, coords[first_dir]))
        terms.append(f * D(f, coords[nl_dir]))
        terms.append(pdt.sin(coords[0] + 0.3) * 0.7)
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    return equation


@pytest.mark.parametrize("trial", range(12))
def test_plan_equals_fallback_random_config(trial):
    rng = random.Random(1234 + trial)
    total = rng.choice([1, 2, 3])
    n_out = rng.choice([1, 1, 2])
    layout = rng.choice(LAYOUTS)
    n_dense = layout.count("f")
    width = rng.choice([6, 10])
    features = [width] * (n_dense - 1) + [n_out]
    act = rng.choice(ACTS)
    use_bc = rng.random() < 0.5 and n_out == 1
    use_ic = rng.random() < 0.5

    kwargs = dict(layout=layout, features=features, activation=act, seed=trial)
    if use_bc:
        kwargs["boundary_condition"] = rng.uniform(-1, 1)
    if use_ic:
        kwargs["initial_condition"] = (rng.uniform(-1, 1) if n_out == 1 else
                                       np.ones(n_out, np.float32))

    equation = random_equation(rng, total, n_out)
    solver = Solver(equation, ndims=total, **kwargs)
    assert solver._plan_ok, (trial, layout, act)

    lt = (("equation", 1.0),)
    crit = lambda a, b: jnp.mean((a - b) ** 2)
    loss_plan, *_ = solver._build_loss_fn(lt, crit, use_plan=True)
    loss_ref, *_ = solver._build_loss_fn(lt, crit, use_plan=False)
    pts = jax.random.uniform(jax.random.key(trial), (32, total)) * .8 + .1
    leaves = [pts[:, i:i + 1] for i in range(total)]
    l1, g1 = jax.jit(jax.value_and_grad(loss_plan))(solver.model.params,
                                                    leaves)
    l2, g2 = jax.jit(jax.value_and_grad(loss_ref))(solver.model.params,
                                                   leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-5,
                               err_msg=f"trial {trial}: {layout} {act}")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5,
                                   err_msg=f"trial {trial}: {layout} {act}")
