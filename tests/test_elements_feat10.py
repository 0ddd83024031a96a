"""FEAT10 element kernels vs independent NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.elements import feat10
from tlfea.elements.assembly import (
    deformation_gradient,
    internal_force,
    mass_matvec,
    mass_diag,
)
from tlfea.materials import SVK, MooneyRivlin, lame_from_E_nu
from tlfea.utils.tetmesh import box_t10_mesh

from tests import oracles


@pytest.fixture(scope="module")
def small_mesh():
    nodes, conn = box_t10_mesh(1.0, 0.5, 0.5, 2, 1, 1)
    return nodes, conn


def _deformed(nodes, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    x = nodes + scale * rng.standard_normal(nodes.shape)
    v = rng.standard_normal(nodes.shape)
    return x, v


def test_identity_F_at_rest(small_mesh):
    nodes, conn = small_mesh
    elems = feat10.build(nodes, conn, rho=1000.0)
    F = deformation_gradient(jnp.asarray(nodes), elems)
    np.testing.assert_allclose(
        np.asarray(F), np.broadcast_to(np.eye(3), F.shape), atol=1e-12
    )


def test_zero_force_at_rest(small_mesh):
    nodes, conn = small_mesh
    elems = feat10.build(nodes, conn, rho=1000.0)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)
    f = internal_force(jnp.asarray(nodes), None, elems, mat)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-6)


def test_internal_force_matches_oracle_svk(small_mesh):
    nodes, conn = small_mesh
    elems = feat10.build(nodes, conn, rho=1000.0)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)
    x, _ = _deformed(nodes)
    f = np.asarray(internal_force(jnp.asarray(x), None, elems, mat))
    f_ref = oracles.t10_internal_force(nodes, conn, x, None, lam, mu)
    np.testing.assert_allclose(f, f_ref, rtol=1e-9, atol=1e-9 * np.abs(f_ref).max())


def test_internal_force_matches_oracle_damped(small_mesh):
    nodes, conn = small_mesh
    elems = feat10.build(nodes, conn, rho=1000.0)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    eta, lam_d = 50.0, 10.0
    mat = SVK(lam=lam, mu=mu, eta_damp=eta, lam_damp=lam_d)
    x, v = _deformed(nodes)
    f = np.asarray(internal_force(jnp.asarray(x), jnp.asarray(v), elems, mat))
    f_ref = oracles.t10_internal_force(nodes, conn, x, v, lam, mu, eta, lam_d)
    np.testing.assert_allclose(f, f_ref, rtol=1e-9, atol=1e-9 * np.abs(f_ref).max())


def test_mass_matvec_matches_dense_oracle(small_mesh):
    """keast5 parity mode must reproduce the oracle's Keast-5 assembly."""
    nodes, conn = small_mesh
    rho = 2700.0
    elems = feat10.build(nodes, conn, rho=rho, mass_rule="keast5")
    M = oracles.t10_mass_matrix(nodes, conn, rho)
    rng = np.random.default_rng(1)
    vv = rng.standard_normal(nodes.shape)
    mv = np.asarray(mass_matvec(jnp.asarray(vv), elems))
    mv_ref = M @ vv
    np.testing.assert_allclose(mv, mv_ref, rtol=1e-10, atol=1e-12)
    # Diagonal extraction
    np.testing.assert_allclose(np.asarray(mass_diag(elems)), np.diag(M), rtol=1e-10)
    # Total mass = rho * volume (partition of unity)
    vol = 1.0 * 0.5 * 0.5
    np.testing.assert_allclose(M.sum(), rho * vol, rtol=1e-9)


def test_mass_spd(small_mesh):
    """Default (exact Duffy) mass must be SPD; it must also agree with the
    Keast-5 mass on total mass (both integrate rho * 1 exactly)."""
    nodes, conn = small_mesh
    rho = 2700.0
    elems = feat10.build(nodes, conn, rho=rho)  # exact rule
    n = nodes.shape[0]
    M = np.zeros((n, n))
    me = np.asarray(elems.mass_elem)
    cc = np.asarray(elems.conn)
    for e in range(cc.shape[0]):
        M[np.ix_(cc[e], cc[e])] += me[e]
    np.testing.assert_allclose(M, M.T, atol=1e-9)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0, f"exact consistent mass should be SPD, min eig {w.min()}"
    M5 = oracles.t10_mass_matrix(nodes, conn, rho)
    np.testing.assert_allclose(M.sum(), M5.sum(), rtol=1e-10)


def test_svk_piola_matches_oracle():
    rng = np.random.default_rng(2)
    F = np.eye(3) + 0.1 * rng.standard_normal((4, 3, 3))
    lam, mu = lame_from_E_nu(7e8, 0.33)
    mat = SVK(lam=lam, mu=mu)
    P = np.asarray(mat.first_piola(jnp.asarray(F)))
    for k in range(4):
        np.testing.assert_allclose(P[k], oracles.svk_P(F[k], lam, mu), rtol=1e-12)


def test_mooney_rivlin_piola_matches_oracle():
    rng = np.random.default_rng(3)
    F = np.eye(3) + 0.1 * rng.standard_normal((4, 3, 3))
    mat = MooneyRivlin(mu10=3e5, mu01=1e5, kappa=1e7)
    P = np.asarray(mat.first_piola(jnp.asarray(F)))
    for k in range(4):
        np.testing.assert_allclose(
            P[k], oracles.mr_P(F[k], 3e5, 1e5, 1e7), rtol=1e-9
        )


def test_internal_force_is_energy_gradient(small_mesh):
    """f_int must equal d/dx of the total strain energy (SVK)."""
    import jax

    nodes, conn = small_mesh
    elems = feat10.build(nodes, conn, rho=1000.0)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)

    def energy(x):
        F = deformation_gradient(x, elems)
        E = 0.5 * (jnp.einsum("eqki,eqkj->eqij", F, F) - jnp.eye(3))
        trE = jnp.trace(E, axis1=-2, axis2=-1)
        W = 0.5 * lam * trE**2 + mu * jnp.sum(E * E, axis=(-2, -1))
        return jnp.sum(W * elems.dV)

    x, _ = _deformed(nodes)
    f = np.asarray(internal_force(jnp.asarray(x), None, elems, mat))
    f_ad = np.asarray(jax.grad(energy)(jnp.asarray(x)))
    np.testing.assert_allclose(f, f_ad, rtol=1e-8, atol=1e-8 * np.abs(f_ad).max())


def test_tangent_diag_block_matches_jacfwd():
    """Closed-form SVK diag block vs autodiff of first_piola."""
    import jax

    rng = np.random.default_rng(4)
    F = jnp.asarray(np.eye(3) + 0.1 * rng.standard_normal((3, 3)))
    h = jnp.asarray(rng.standard_normal(3))
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)
    A = jax.jacfwd(mat.first_piola)(F)  # (3,3,3,3): dP_ij/dF_kl
    K_ref = np.einsum("djel,j,l->de", np.asarray(A), np.asarray(h), np.asarray(h))
    K = np.asarray(mat.tangent_diag_block(F, h))
    np.testing.assert_allclose(K, K_ref, rtol=1e-9)

    mr = MooneyRivlin(mu10=3e5, mu01=1e5, kappa=1e7)
    A = jax.jacfwd(mr.first_piola)(F)
    K_ref = np.einsum("djel,j,l->de", np.asarray(A), np.asarray(h), np.asarray(h))
    K = np.asarray(mr.tangent_diag_block(F, h))
    np.testing.assert_allclose(K, K_ref, rtol=1e-8)


def test_mooney_rivlin_du_path_matches_classic():
    """Strain-safe MR first_piola_du == first_piola(I + Du) in f64; in f32 it
    must be far closer to the f64 truth at small strains."""
    rng = np.random.default_rng(9)
    Du = 1e-5 * rng.standard_normal((8, 3, 3))
    mat = MooneyRivlin(mu10=3e5, mu01=1e5, kappa=1e9)
    P_cl = np.asarray(mat.first_piola(jnp.asarray(np.eye(3) + Du)))
    P_du = np.asarray(mat.first_piola_du(jnp.asarray(Du)))
    np.testing.assert_allclose(P_du, P_cl, rtol=1e-9, atol=1e-12 * np.abs(P_cl).max())

    Du32 = jnp.asarray(Du.astype(np.float32))
    s = np.abs(P_cl).max()
    err_cl = np.abs(np.asarray(mat.first_piola(Du32 + jnp.eye(3, dtype=jnp.float32))) - P_cl).max() / s
    err_du = np.abs(np.asarray(mat.first_piola_du(Du32)) - P_cl).max() / s
    assert err_du < 0.01 * err_cl, f"du-path {err_du:.2e} vs classic {err_cl:.2e}"
