"""Device narrowphase vs the NumPy prototype — the `compare_narrowphase.py`
analog (reference: `test-scripts/compare_narrowphase.py:1-12` diffs the
Python hydropatch prototype against CUDA JSON exports)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "prototypes"))

import jax
import jax.numpy as jnp

import narrowphase_oracle as oracle
from tlfea.collision.narrowphase import _patch_one


def random_overlapping_tet_pair(rng):
    """Two random tets sharing space, with random positive pressures."""
    base = rng.standard_normal(3) * 0.1
    vA = base + rng.standard_normal((4, 3))
    # Make B a jittered copy overlapping A.
    vB = vA * rng.uniform(0.6, 1.1) + rng.standard_normal(3) * 0.3
    pA = rng.uniform(0.1, 2.0, 4)
    pB = rng.uniform(0.1, 2.0, 4)
    return vA, pA, vB, pB


def test_narrowphase_matches_oracle():
    rng = np.random.default_rng(7)
    fn = jax.jit(_patch_one)
    n_checked = 0
    for trial in range(60):
        vA, pA, vB, pB = random_overlapping_tet_pair(rng)
        got = fn(jnp.asarray(vA), jnp.asarray(pA), jnp.asarray(vB), jnp.asarray(pB))
        ref = oracle.contact_patch(vA, pA, vB, pB)
        if ref is None:
            assert not bool(got["valid"]), f"trial {trial}: device found a patch, oracle none"
            continue
        assert bool(got["valid"]), f"trial {trial}: oracle found a patch, device none"
        n_checked += 1
        np.testing.assert_allclose(float(got["area"]), ref["area"], rtol=1e-9,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(
            np.asarray(got["centroid"]), ref["centroid"], atol=1e-9,
            err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(
            np.asarray(got["normal"]), ref["normal"], atol=1e-9
        )
        np.testing.assert_allclose(float(got["p_eq"]), ref["p_eq"], rtol=1e-8)
        np.testing.assert_allclose(float(got["g_A"]), ref["g_A"], rtol=1e-9)
        np.testing.assert_allclose(float(got["g_B"]), ref["g_B"], rtol=1e-9)
        assert bool(got["valid_orientation"]) == ref["valid_orientation"]
        assert int(got["n_verts"]) == len(ref["verts"])
    assert n_checked >= 10, f"only {n_checked} overlapping trials — generator too weak"
