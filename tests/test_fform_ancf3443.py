"""ANCF3443 shell device pipeline vs the standalone f-form NumPy prototype
(the `test-scripts/3443-shell/f-form-*` analog — closes the last
executable-spec gap from round 1)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "prototypes"))

import jax.numpy as jnp

from fform_ancf3443 import FForm3443
from tlfea.constraints import FixedCoefs
from tlfea.elements import ancf3443
from tlfea.elements.assembly import internal_force, mass_matvec
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System
from tlfea.solvers.common import grad_L


def _setup(n_elem=2):
    L, W, H, rho = 1.0, 0.8, 0.05, 2700.0
    lam, mu = lame_from_E_nu(1e7, 0.3)
    coefs, conn = ancf3443.shell_strip(n_elem, L=L, W=W)
    return coefs, conn, L, W, H, rho, lam, mu


def test_ancf3443_internal_force_matches_prototype():
    coefs, conn, L, W, H, rho, lam, mu = _setup()
    proto = FForm3443(coefs, conn, L, W, H, rho, lam, mu, 1e-3, 1e6)
    elems = ancf3443.build(coefs, conn, L, W, H, rho=rho)
    mat = SVK(lam=lam, mu=mu)

    rng = np.random.default_rng(11)
    x = coefs + 0.02 * rng.standard_normal(coefs.shape)
    f_dev = np.asarray(internal_force(jnp.asarray(x), None, elems, mat))
    f_ref = proto.f_int(x)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_dev, f_ref, rtol=1e-9, atol=1e-11 * scale)


def test_ancf3443_mass_matches_prototype():
    coefs, conn, L, W, H, rho, lam, mu = _setup()
    proto = FForm3443(coefs, conn, L, W, H, rho, lam, mu, 1e-3, 1e6)
    elems = ancf3443.build(coefs, conn, L, W, H, rho=rho)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(coefs.shape)
    mv_dev = np.asarray(mass_matvec(jnp.asarray(v), elems))
    mv_ref = proto.M @ v
    np.testing.assert_allclose(mv_dev, mv_ref, rtol=1e-9, atol=1e-11 * np.abs(mv_ref).max())


def test_ancf3443_alm_gradient_matches_prototype():
    coefs, conn, L, W, H, rho, lam, mu = _setup()
    dt, rho_alm = 1e-3, 1e6
    fixed = np.arange(8)  # first two nodes (clamped edge): 8 coefficient vecs
    proto = FForm3443(coefs, conn, L, W, H, rho, lam, mu, dt, rho_alm, fixed=fixed)
    elems = ancf3443.build(coefs, conn, L, W, H, rho=rho)
    system = System(
        elems=elems,
        material=SVK(lam=lam, mu=mu),
        constraints=FixedCoefs.from_indices(fixed, coefs),
    )

    rng = np.random.default_rng(5)
    v = rng.standard_normal(coefs.shape) * 0.05
    v_prev = rng.standard_normal(coefs.shape) * 0.05
    lam_dual = rng.standard_normal((len(fixed), 3))
    f_ext = rng.standard_normal(coefs.shape)

    g_dev = np.asarray(
        grad_L(
            jnp.asarray(v), jnp.asarray(coefs), jnp.asarray(v_prev),
            jnp.asarray(lam_dual), jnp.asarray(f_ext), dt, rho_alm, system,
        )
    )
    g_ref = proto.grad(v, coefs, v_prev, lam_dual, f_ext)
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_dev, g_ref, rtol=1e-9, atol=1e-11 * scale)


def test_ancf3443_nag_step_sags_under_gravity():
    """The prototype's own dynamics: a clamped strip under gravity develops
    negative tip deflection (sanity of the executable spec itself)."""
    coefs, conn, L, W, H, rho, lam, mu = _setup(n_elem=2)
    dt = 1e-3
    fixed = np.arange(8)
    proto = FForm3443(coefs, conn, L, W, H, rho, lam, mu, dt, 1e6, fixed=fixed)
    # gravity on position coefficients via lumped mass rows
    f_ext = np.zeros_like(coefs)
    f_ext[:, 2] = proto.M.sum(axis=1) * -9.81
    x, v, lam_d = coefs.copy(), np.zeros_like(coefs), np.zeros((len(fixed), 3))
    for _ in range(3):
        x, v, lam_d = proto.nag_step(x, v, lam_d, f_ext, alpha=2e-8, iters=300)
    tip = 4 * int(conn[-1, 2])  # a far-edge node position coefficient
    assert x[tip, 2] < coefs[tip, 2]  # sagging
    assert np.abs(x[: 4 * 2] - coefs[: 4 * 2]).max() < 1e-4  # clamp holds
