"""ANCF beam/shell element tests.

Includes the reference's golden-file mass-matrix check: the assembled
coefficient-level consistent mass for a 2- and 3-element ANCF3243 beam must
match `data/utest/mass_matrix_{2,3}_beam.csv` to 1e-4 (the reference's own
acceptance test, `lib_utest/utest_3243.cc:34-115`). Skipped if the reference
checkout is not present.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.elements import ancf3243, ancf3443
from tlfea.elements.assembly import (
    deformation_gradient,
    internal_force,
    mass_matvec,
)
from tlfea.materials import SVK, lame_from_E_nu

REF = "/root/reference"


def assemble_coef_mass(elems):
    """Dense (n_coef, n_coef) scalar mass from element blocks."""
    n = elems.n_coef
    M = np.zeros((n, n))
    me = np.asarray(elems.mass_elem)
    cc = np.asarray(elems.conn)
    for e in range(cc.shape[0]):
        M[np.ix_(cc[e], cc[e])] += me[e]
    return M


@pytest.mark.parametrize("n_beam", [2, 3])
def test_mass_matrix_golden(n_beam):
    csv = os.path.join(REF, f"data/utest/mass_matrix_{n_beam}_beam.csv")
    if not os.path.exists(csv):
        pytest.skip("reference golden data not available")
    expected = np.loadtxt(csv, delimiter=",")

    L, W, H, rho = 2.0, 1.0, 1.0, 2700.0
    coefs, conn = ancf3243.straight_beam(n_beam, L=L, origin=(0.0, 0.0, 0.0))
    elems = ancf3243.build(coefs, conn, L, W, H, rho=rho)
    M = assemble_coef_mass(elems)
    assert M.shape == expected.shape
    np.testing.assert_allclose(M, expected, atol=1e-4)
    # SPD + symmetry, as the reference asserts.
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    assert np.linalg.det(M) > 0


def test_ancf3243_identity_F_at_rest():
    coefs, conn = ancf3243.straight_beam(4)
    elems = ancf3243.build(coefs, conn, 2.0, 1.0, 1.0, rho=2700.0)
    F = deformation_gradient(jnp.asarray(coefs), elems)
    np.testing.assert_allclose(
        np.asarray(F), np.broadcast_to(np.eye(3), F.shape), atol=1e-10
    )


def test_ancf3243_zero_force_at_rest():
    coefs, conn = ancf3243.straight_beam(4)
    elems = ancf3243.build(coefs, conn, 2.0, 0.5, 0.5, rho=2700.0)
    lam, mu = lame_from_E_nu(7e8, 0.33)
    mat = SVK(lam=lam, mu=mu)
    f = internal_force(jnp.asarray(coefs), None, elems, mat)
    assert float(jnp.abs(f).max()) < 1e-4  # scale: E ~ 7e8


def test_ancf3243_total_mass():
    """sum of position-coefficient mass rows = rho * volume."""
    L, W, H, rho = 2.0, 1.0, 0.5, 2700.0
    n = 3
    coefs, conn = ancf3243.straight_beam(n, L=L)
    elems = ancf3243.build(coefs, conn, L, W, H, rho=rho)
    ones = jnp.zeros((coefs.shape[0], 3))
    # Rigid translation field: position coefficients 1, gradient coefs 0.
    pos_idx = np.arange(0, coefs.shape[0], 4)
    ones = ones.at[pos_idx, 0].set(1.0)
    mv = np.asarray(mass_matvec(ones, elems))
    total = mv[pos_idx, 0].sum()
    np.testing.assert_allclose(total, rho * (n * L) * W * H, rtol=1e-10)


def test_ancf3443_identity_F_at_rest():
    coefs, conn = ancf3443.shell_strip(3, L=1.0, W=1.0)
    elems = ancf3443.build(coefs, conn, 1.0, 1.0, 0.1, rho=7800.0)
    F = deformation_gradient(jnp.asarray(coefs), elems)
    np.testing.assert_allclose(
        np.asarray(F), np.broadcast_to(np.eye(3), F.shape), atol=1e-9
    )


def test_ancf3443_total_mass():
    L, W, H, rho = 1.0, 1.0, 0.1, 7800.0
    n = 3
    coefs, conn = ancf3443.shell_strip(n, L=L, W=W)
    elems = ancf3443.build(coefs, conn, L, W, H, rho=rho)
    ones = jnp.zeros((coefs.shape[0], 3))
    pos_idx = np.arange(0, coefs.shape[0], 4)
    ones = ones.at[pos_idx, 0].set(1.0)
    mv = np.asarray(mass_matvec(ones, elems))
    np.testing.assert_allclose(mv[pos_idx, 0].sum(), rho * n * L * W * H, rtol=1e-9)


def test_ancf3243_stretch_force_sign():
    """Uniform axial stretch must produce restoring (inward) end forces."""
    coefs, conn = ancf3243.straight_beam(2, L=2.0, origin=(0.0, 0.0, 0.0))
    elems = ancf3243.build(coefs, conn, 2.0, 1.0, 1.0, rho=2700.0)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)
    x = coefs.copy()
    pos_idx = np.arange(0, coefs.shape[0], 4)
    x[pos_idx, 0] *= 1.01  # 1% stretch along x
    x[pos_idx + 1, 0] = 1.01  # r_u coefficient stretches too
    f = np.asarray(internal_force(jnp.asarray(x), None, elems, mat))
    # Internal force opposes stretch: +x end pulls back in -x... f_int sign
    # convention: residual = f_int - f_ext, so f_int at the +x end is positive.
    end = pos_idx[-1]
    start = pos_idx[0]
    assert f[end, 0] > 0 and f[start, 0] < 0
