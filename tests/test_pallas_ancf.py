"""ANCF element families through the Pallas kernels (interpreter mode).

VERDICT-r2 item 3: the flat element/Hv kernels (`pallas_fem`) are claimed
family-generic over (S, Q); these tests pin that claim for ANCF3243 beams
(S=8, Q=12 stiffness rule) and ANCF3443 shells (S=16, Q=48 — the
reference's stress-test QP load, `SyncedNewton.cu:101`). Parity target is
the XLA einsum path, which is itself golden-tested against the reference's
mass CSVs (`tests/test_elements_ancf.py`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import ancf3243, ancf3443
from tlfea.elements.assembly import alm_residual_contributions
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_fem
from tlfea.solvers import System
from tlfea.solvers.common import grad_L

DTYPE = np.float32


def _mat(damped=True):
    lam, mu = lame_from_E_nu(2e7, 0.3)
    z = DTYPE(50.0) if damped else DTYPE(0.0)
    return SVK(lam=jnp.asarray(lam, DTYPE), mu=jnp.asarray(mu, DTYPE),
               eta_damp=jnp.asarray(z), lam_damp=jnp.asarray(z))


def _beam():
    coefs, conn = ancf3243.straight_beam(4, L=2.0)
    elems = ancf3243.build(coefs, conn, 0.5, 0.1, 0.1, rho=2000.0, dtype=DTYPE)
    return np.asarray(coefs, DTYPE), elems


def _shell():
    # ONE element: the interpret-mode 48-QP shell kernels are minutes per
    # element on this 1-core box (a 2-element strip measured >60 min for
    # the jvp parity alone); parity coverage is identical — every (q, a)
    # code path executes, and the QP-chunked grid (qp_chunks -> NC=8 for
    # this element) exercises chunk-boundary accumulation regardless of E.
    coefs, conn = ancf3443.shell_strip(1, L=0.5, W=0.5)
    elems = ancf3443.build(coefs, conn, 0.5, 0.5, 0.05, rho=1000.0, dtype=DTYPE)
    return np.asarray(coefs, DTYPE), elems


def _jvp_parity(coefs, elems, mat, seed):
    contrib, tpd = pallas_fem.make_element_contrib(elems, mat, interpret=True)
    assert tpd["S"] == elems.conn.shape[1]
    rng = np.random.default_rng(seed)
    shp = coefs.shape
    x = jnp.asarray(coefs + 0.01 * rng.standard_normal(shp).astype(DTYPE))
    v = jnp.asarray(rng.standard_normal(shp).astype(DTYPE))
    dv = jnp.asarray(rng.standard_normal(shp).astype(DTYPE))
    tans = tuple(jnp.asarray(rng.standard_normal(shp).astype(DTYPE))
                 for _ in range(3))
    f_ref = lambda x, v, dv: alm_residual_contributions(x, v, dv, elems, mat)
    f_pal = lambda x, v, dv: pallas_fem.residual_contributions(
        x, v, dv, elems, contrib, tpd)
    r_ref, d_ref = jax.jvp(f_ref, (x, v, dv), tans)
    r_pal, d_pal = jax.jvp(f_pal, (x, v, dv), tans)
    assert float(jnp.abs(r_pal - r_ref).max()) / float(jnp.abs(r_ref).max()) < 1e-5
    assert float(jnp.abs(d_pal - d_ref).max()) / float(jnp.abs(d_ref).max()) < 1e-5


def _hv_parity(coefs, elems, mat, seed):
    """g_and_hvp (primal+prep / specialized tangent kernels) vs
    jax.linearize(grad_L) — the production Newton-PCG path."""
    n = coefs.shape[0]
    fixed = np.arange(4)  # pin the first node's 4 coefficient rows
    system = System(
        elems=elems, material=mat,
        constraints=FixedCoefs.from_indices(fixed, coefs),
    )
    psystem = pallas_fem.with_pallas(system, interpret=True)
    rng = np.random.default_rng(seed)
    x_prev = jnp.asarray(coefs + 0.005 * rng.standard_normal((n, 3)).astype(DTYPE))
    v_prev = jnp.asarray(rng.standard_normal((n, 3)).astype(DTYPE))
    v = jnp.asarray(rng.standard_normal((n, 3)).astype(DTYPE))
    p = jnp.asarray(rng.standard_normal((n, 3)).astype(DTYPE))
    f_ext = jnp.asarray(rng.standard_normal((n, 3)).astype(DTYPE))
    lam_d = jnp.asarray(rng.standard_normal((len(fixed), 3)).astype(DTYPE))
    dt, rho = DTYPE(1e-3), DTYPE(1e6)

    g_ref, hvp_ref = jax.linearize(
        lambda vv: grad_L(vv, x_prev, v_prev, lam_d, f_ext, dt, rho, psystem), v
    )
    g_got, hvp_got = pallas_fem.g_and_hvp(
        v, x_prev, v_prev, lam_d, f_ext, dt, rho, psystem
    )
    assert float(jnp.abs(g_got - g_ref).max()) / float(jnp.abs(g_ref).max()) < 1e-5
    h_ref, h_got = hvp_ref(p), hvp_got(p)
    assert float(jnp.abs(h_got - h_ref).max()) / float(jnp.abs(h_ref).max()) < 1e-4


@pytest.mark.heavy
@pytest.mark.parametrize("damped", [False, True])
def test_ancf3243_pallas_jvp_parity(damped):
    coefs, elems = _beam()
    _jvp_parity(coefs, elems, _mat(damped), seed=11)


@pytest.mark.heavy
def test_ancf3243_pallas_hv_parity():
    coefs, elems = _beam()
    _hv_parity(coefs, elems, _mat(True), seed=12)


@pytest.mark.slow
def test_ancf3443_pallas_jvp_parity():
    coefs, elems = _shell()
    _jvp_parity(coefs, elems, _mat(True), seed=13)


@pytest.mark.slow
def test_ancf3443_pallas_hv_parity():
    coefs, elems = _shell()
    _hv_parity(coefs, elems, _mat(True), seed=14)
