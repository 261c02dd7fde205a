"""Randomized grammar fuzz for the layout-string builder superset
(``R``/``B``/``+``/``*``/``.`` tokens, nested ``branches=``): a generator
emits random VALID layouts while tracking widths symbolically, then every
trial checks

1. the builder's symbolic width pass against the runtime tensor
   (``apply.out_dim`` == actual output width — the round-4 branch-width
   bug class), and
2. the single-traversal Taylor plan against nested-jvp reference taps
   through the full random topology (branch recursion, product Leibniz
   rule, concat splits).

Reference grammar: /root/reference/pydens/model_torch.py:142-156 (the
consumed ``f c a R +`` subset); branches/joins are the recorded superset.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydens_tpu.models.layout import make_layout_network

WIDTHS = [3, 4, 5, 6, 8]


def _nested_jvp_tap(fn, x, mi):
    """Reference tap: nested jvp along one-hot coordinate directions."""
    for k in mi:
        fn = (lambda g, kk: lambda z: jax.jvp(
            g, (z,), (jnp.zeros_like(z).at[:, kk].set(1.0),))[1])(fn, kk=k)
    return fn(x)


def gen_layout(rng, in_dim, depth=1):
    """Random valid layout: returns (layout, features, branches, out_width).

    Widths are tracked symbolically WHILE generating, so '+'/'*' joins are
    always width-matched (a dense layer to the pushed width is inserted
    when needed) and the returned out_width is the ground truth the
    builder's own symbolic pass must reproduce."""
    tokens, features, branches, stack = [], [], [], []
    cur = in_dim

    def dense(w=None):
        nonlocal cur
        w = w if w is not None else rng.choice(WIDTHS)
        tokens.append("f")
        features.append(w)
        cur = w
        if rng.random() < 0.8:
            tokens.append("a")

    dense()
    for _ in range(rng.randint(3, 6)):
        r = rng.random()
        if r < 0.35 and len(stack) < 2:
            if depth == 0 or rng.random() < 0.4:
                tokens.append("R")
                stack.append(cur)
            else:
                tokens.append("B")
                if rng.random() < 0.3:
                    branches.append(None)  # identity branch
                    stack.append(cur)
                else:
                    b_layout, b_feats, b_brs, b_out = gen_layout(
                        rng, cur, depth - 1)
                    branches.append(dict(layout=b_layout, features=b_feats,
                                         branches=b_brs or None))
                    stack.append(b_out)
        elif r < 0.7 and stack:
            join = rng.choice("+*.")
            if join in "+*":
                if cur != stack[-1]:
                    dense(stack[-1])
                tokens.append(join)
                stack.pop()
            else:
                tokens.append(".")
                cur += stack.pop()
        else:
            dense()
    while stack:  # close every open push
        if rng.random() < 0.5:
            dense(stack[-1])
            tokens.append("+")
            stack.pop()
        else:
            tokens.append(".")
            cur += stack.pop()
    head = rng.choice([1, 2])
    tokens.append("f")
    features.append(head)
    return "".join(tokens), features, branches, head


@pytest.mark.parametrize("trial", range(14))
def test_grammar_fuzz_width_and_taps(trial):
    rng = random.Random(7000 + trial)
    layout, feats, brs, out_w = gen_layout(rng, in_dim=2)
    init, apply, _ = make_layout_network(
        layout, feats, "Tanh", in_dim=2, branches=brs or None)
    params = init(jax.random.key(trial))
    x = jnp.asarray(np.random.default_rng(trial).normal(size=(5, 2)),
                    jnp.float32)
    out = apply(params, x)
    assert out.shape == (5, out_w), (trial, layout, feats)
    assert apply.out_dim == out_w, (trial, layout, feats)

    assert apply.taylor_ok, (trial, layout)
    closure = [(0,), (1,), (0, 0), (0, 1), (1, 1)]
    V, taps = apply.taylor_taps(params, x, closure)
    np.testing.assert_allclose(np.asarray(V), np.asarray(out),
                               rtol=1e-5, atol=1e-6,
                               err_msg=f"trial {trial}: {layout}")
    for mi in closure:
        ref = _nested_jvp_tap(lambda z: apply(params, z), x, mi)
        np.testing.assert_allclose(
            np.asarray(taps[mi]), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"trial {trial}: {layout} tap {mi}")
