"""Trajectory regression against committed float64-CPU fixtures.

Pins the full dynamic trajectory (not just end states) so solver/kernel/
sharding refactors can't silently change the physics — the committed-CSV
analogue of the reference's FEniCS validation CSVs (SURVEY §4).
"""

import os
import sys

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
sys.path.insert(0, FIXDIR)


@pytest.mark.slow
def test_beam_sag_trajectory_pinned():
    path = os.path.join(FIXDIR, "beam_sag_t10_tip.csv")
    if not os.path.exists(path):
        pytest.skip("fixture not generated")
    from generate import beam_sag_trajectory

    ref = np.loadtxt(path, delimiter=",", skiprows=1)
    got = beam_sag_trajectory(write=False)
    scale = np.abs(ref[:, 1:4]).max()
    np.testing.assert_allclose(got[:, 1:4], ref[:, 1:4], rtol=0, atol=1e-9 * scale)


@pytest.mark.slow
def test_sphere_drop_trajectory_pinned():
    path = os.path.join(FIXDIR, "sphere_drop_lownode.csv")
    if not os.path.exists(path):
        pytest.skip("fixture not generated (reference meshes absent?)")
    from generate import sphere_drop_trajectory

    ref = np.loadtxt(path, delimiter=",", skiprows=1)
    got = sphere_drop_trajectory(write=False)
    scale = np.abs(ref[:, 1:4]).max()
    np.testing.assert_allclose(got[:, 1:4], ref[:, 1:4], rtol=0, atol=1e-8 * scale)
    # Contact counts are integers; identical counts = same discrete events.
    np.testing.assert_array_equal(got[:, 4], ref[:, 4])
