"""Small parity tests: DEM force spreading, shell-strip connectivity, CLI.

Mirrors the reference's `utest_utils.cc` (offset math, shell connectivity
generation) plus the DEME force-distribution helper.
"""

import numpy as np
import pytest

from tlfea.collision.dem_bridge import DemMeshCollision, spread_point_forces
from tlfea.elements import ancf3243, ancf3443
from tlfea.utils.cli import Cli


def test_spread_point_forces_conserves_total():
    rng = np.random.default_rng(0)
    surf = rng.standard_normal((50, 3))
    pts = rng.standard_normal((7, 3))
    forces = rng.standard_normal((7, 3))
    out = spread_point_forces(pts, forces, surf, k=4)
    np.testing.assert_allclose(out.sum(axis=0), forces.sum(axis=0), rtol=1e-12)
    # Weights concentrate on nearby vertices: the nearest vertex to an
    # isolated far point receives almost all of its force.
    far_pt = np.array([[100.0, 0.0, 0.0]])
    far_f = np.array([[1.0, 0.0, 0.0]])
    out = spread_point_forces(far_pt, far_f, surf, k=4)
    assert out[:, 0].max() > 0.2


def test_dem_bridge_requires_backend():
    with pytest.raises(RuntimeError, match="DEM"):
        DemMeshCollision(mesh_manager=None, backend=None)


def test_shell_strip_connectivity():
    """Consecutive shells share an edge; node count = 2 * (n + 1)
    (reference `utest_utils.cc:32-167` shell connectivity checks)."""
    coefs, conn = ancf3443.shell_strip(4)
    assert coefs.shape[0] == 4 * 2 * 5
    for e in range(3):
        shared = set(conn[e]).intersection(conn[e + 1])
        assert len(shared) == 2, "consecutive shells must share exactly one edge"
    # Corner ordering is CCW: (n0, n1) bottom edge, (n2, n3) top edge.
    for row in conn:
        assert row[0] % 2 == 0 and row[1] % 2 == 0  # bottom nodes even
        assert row[2] % 2 == 1 and row[3] % 2 == 1  # top nodes odd


def test_beam_offsets():
    """Coefficient offset math: node k owns coefficients [4k, 4k+4)."""
    coefs, conn = ancf3243.straight_beam(3)
    assert coefs.shape[0] == 4 * 4
    elems = ancf3243.build(coefs, conn, 2.0, 1.0, 1.0, rho=1.0)
    cc = np.asarray(elems.conn)
    for e in range(3):
        np.testing.assert_array_equal(cc[e, :4], 4 * e + np.arange(4))
        np.testing.assert_array_equal(cc[e, 4:], 4 * (e + 1) + np.arange(4))


def test_cli_parsing():
    cli = Cli("t").add("x", 1.5).add("name", "abc").add("n", 3).add("flag", False)
    out = cli.parse(["--x=2.5", "--flag=true"])
    assert out == {"x": 2.5, "name": "abc", "n": 3, "flag": True}
    with pytest.raises(SystemExit):
        cli.parse(["--bogus=1"])
