"""ANCF3243 device pipeline vs the standalone f-form NumPy prototype
(the `test-scripts/3243-beam/f-form-*` analog)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "prototypes"))

import jax.numpy as jnp

from fform_ancf3243 import FForm3243
from tlfea.constraints import FixedCoefs
from tlfea.elements import ancf3243
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System
from tlfea.solvers.common import grad_L


def test_ancf3243_alm_gradient_matches_prototype():
    L, W, H, rho = 2.0, 0.5, 0.5, 2700.0
    lam, mu = lame_from_E_nu(1e7, 0.3)
    dt, rho_alm = 1e-3, 1e6
    coefs, conn = ancf3243.straight_beam(3, L=L, origin=(0.0, 0.0, 0.0))
    fixed = np.arange(4)  # first node's 4 coefficient vectors

    proto = FForm3243(coefs, conn, L, W, H, rho, lam, mu, dt, rho_alm, fixed=fixed)
    elems = ancf3243.build(coefs, conn, L, W, H, rho=rho)
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
