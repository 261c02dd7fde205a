"""The tutorial notebook must execute end-to-end — the direct analogue of
the reference's only test (notebook-exec smoke,
``/root/reference/pydens/tests/pydens_test.py``), kept as a slow test since
the examples suite already covers each workload with assertions."""

import pathlib

import pytest

NB = pathlib.Path(__file__).parent.parent / "tutorials" / "1_solving_pdes.ipynb"


@pytest.mark.slow
def test_tutorial_notebook_executes():
    import nbformat

    nb = nbformat.read(NB, as_version=4)
    source = "\n\n".join(c.source for c in nb.cells
                         if c.cell_type == "code")
    namespace = {}
    exec(compile(source, str(NB), "exec"), namespace)  # noqa: S102
    # spot-check that the walk-through actually converged
    assert "solver" in namespace and "adaptive" in namespace
