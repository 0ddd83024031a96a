"""Native C++ host core vs NumPy fallback equivalence."""

import numpy as np
import pytest

from tlfea import native
from tlfea.utils.coloring import (
    build_adjacency,
    build_incidence,
    greedy_coloring,
    validate_coloring,
)
from tlfea.utils.tetmesh import box_t10_mesh


@pytest.fixture(scope="module")
def mesh():
    return box_t10_mesh(1.0, 0.5, 0.5, 3, 2, 2)


def test_native_builds_and_matches_python(mesh):
    nodes, conn = mesh
    if not native.available():
        pytest.skip("no C++ toolchain")
    n = nodes.shape[0]
    colors_c = native.greedy_color(conn, n)
    adj = build_adjacency(conn, n)
    colors_py = greedy_coloring(adj)
    # Identical first-fit order -> identical colorings.
    np.testing.assert_array_equal(colors_c, colors_py)
    assert validate_coloring(adj, colors_c)

    inc_c, mask_c = native.build_incidence(conn, n)
    inc_py, mask_py = build_incidence(conn, n)
    np.testing.assert_array_equal(mask_c, mask_py)
    np.testing.assert_array_equal(inc_c[mask_c], inc_py[mask_py])


def test_native_rejects_bad_connectivity(mesh):
    nodes, conn = mesh
    if not native.available():
        pytest.skip("no C++ toolchain")
    bad = conn.copy()
    bad[0, 0] = nodes.shape[0] + 5  # out of range
    with pytest.raises(ValueError):
        native.greedy_color(bad, nodes.shape[0])


def test_native_scales():
    """Sanity: native path handles a mid-size mesh quickly."""
    if not native.available():
        pytest.skip("no C++ toolchain")
    import time

    nodes, conn = box_t10_mesh(4.0, 1.0, 1.0, 16, 4, 4)  # 1536 elems
    t0 = time.time()
    colors = native.greedy_color(conn, nodes.shape[0])
    assert time.time() - t0 < 2.0
    assert colors.max() >= 3  # needs at least a few colors
