"""The tutorial notebooks must execute end-to-end — the direct analogue of
the reference's only test (notebook-exec smoke,
``/root/reference/pydens/tests/pydens_test.py``, which globs every tutorial
notebook and execs it).  Kept as slow tests since the examples suite already
covers each workload with assertions; the notebooks carry their own inline
asserts too."""

import pathlib

import pytest

TUTORIALS = pathlib.Path(__file__).parent.parent / "tutorials"


@pytest.mark.slow
@pytest.mark.parametrize("name", ["1_solving_pdes.ipynb",
                                  "2_torch_examples.ipynb"])
def test_tutorial_notebook_executes(name):
    import nbformat

    nb_path = TUTORIALS / name
    nb = nbformat.read(nb_path, as_version=4)
    source = "\n\n".join(c.source for c in nb.cells
                         if c.cell_type == "code")
    namespace = {}
    exec(compile(source, str(nb_path), "exec"), namespace)  # noqa: S102
    # spot-check that the walk-through actually converged
    assert "solver" in namespace
    if name.startswith("1_"):
        assert "adaptive" in namespace
