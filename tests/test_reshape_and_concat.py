"""Tests for input normalization — behavioral parity with
/root/reference/pydens/model_torch.py:327-362 including its quirks."""

import numpy as np
import pytest

from pydens_tpu.solver import Solver

rc = Solver.reshape_and_concat


def test_array_plus_scalar_tiles_scalar():
    out = rc([np.linspace(0, 1, 5), 4.0])
    assert out.shape == (5, 2)
    np.testing.assert_allclose(out[:, 1], 4.0)


def test_single_scalar_batch_one():
    out = rc([3.0])
    assert out.shape == (1, 1)
    assert out[0, 0] == 3.0


def test_mismatched_array_tiled_from_first_element():
    # Reference quirk (:355-357): an array whose size != batch is tiled from
    # its FIRST element, not broadcast.
    out = rc([np.arange(6, dtype=np.float32), np.array([9.0, 8.0])])
    assert out.shape == (6, 2)
    np.testing.assert_allclose(out[:, 1], 9.0)  # first element tiled


def test_lists_become_columns():
    out = rc([[1.0, 2.0, 3.0], 5])
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out[:, 0], [1, 2, 3])


def test_2d_column_arrays_pass_through():
    a = np.arange(4, dtype=np.float32).reshape(-1, 1)
    b = np.arange(4, 8, dtype=np.float32).reshape(-1, 1)
    out = rc([a, b])
    np.testing.assert_allclose(out, np.hstack([a, b]))


def test_jax_and_torch_inputs():
    import jax.numpy as jnp
    out = rc([jnp.linspace(0, 1, 4), 2.0])
    assert out.shape == (4, 2)
    torch = pytest.importorskip("torch")
    out = rc([torch.linspace(0, 1, 4), 2.0])
    assert out.shape == (4, 2)


def test_dtype_is_float32():
    out = rc([np.arange(3, dtype=np.float64)])
    assert out.dtype == np.float32


def test_unknown_type_raises():
    with pytest.raises(TypeError, match="cannot interpret"):
        rc([object()])


def test_matches_reference_torch_semantics():
    """Differential test against a literal torch re-implementation of the
    reference's normalization logic."""
    torch = pytest.importorskip("torch")

    def torch_rc(tensors):  # mirrors model_torch.py:327-362 semantics
        xs = list(tensors)
        sizes = ([int(np.prod(t.shape)) for t in xs
                  if isinstance(t, (np.ndarray, torch.Tensor))] +
                 [int(np.prod(np.array(t).shape)) for t in xs
                  if isinstance(t, (tuple, list))])
        batch = int(np.max(sizes)) if sizes else 1
        for i, x in enumerate(xs):
            if isinstance(x, (int, float)):
                xs[i] = torch.Tensor(np.tile(x, (batch, 1))).float()
            if isinstance(x, np.ndarray):
                if x.size != batch:
                    x = np.tile(x.squeeze()[0], (batch, 1))
                xs[i] = torch.Tensor(x.reshape(batch, 1)).float()
            if isinstance(x, (list, tuple)):
                xs[i] = torch.Tensor(x).float().view(-1, 1)
            if isinstance(x, torch.Tensor):
                xs[i] = x.view(-1, 1)
        return torch.cat(xs, dim=1).numpy()

    cases = [
        [np.linspace(0, 1, 5), 4.0],
        [3.0],
        [np.arange(6, dtype=np.float32), np.array([9.0, 8.0, 7.0])],
        [[1.0, 2.0], 5],
        [np.ones((4, 1)), np.zeros(4), 2],
    ]
    for case in cases:
        np.testing.assert_allclose(rc(case), torch_rc(case), rtol=1e-6)
