"""Vertex Block Descent solver tests: coloring invariants + solver parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System, StepState, newton, vbd
from tlfea.utils.coloring import build_adjacency, greedy_coloring, validate_coloring
from tlfea.utils.tetmesh import box_t10_mesh


@pytest.fixture(scope="module")
def beam():
    nodes, conn = box_t10_mesh(1.0, 0.1, 0.1, 3, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    cons = FixedCoefs.from_indices(fixed, nodes)
    elems = feat10.build(nodes, conn, rho=1000.0)
    system = System(elems=elems, material=mat, constraints=cons)
    return nodes, conn, system


def test_coloring_valid(beam):
    nodes, conn, system = beam
    adj = build_adjacency(conn, nodes.shape[0])
    colors = greedy_coloring(adj)
    assert validate_coloring(adj, colors)
    # Within a color no two nodes share an element (VBD's parallel-safety
    # invariant).
    for c in range(colors.max() + 1):
        nodes_c = set(np.nonzero(colors == c)[0])
        for row in conn:
            assert len(nodes_c.intersection(row)) <= 1


def test_vbd_matches_newton(beam):
    """VBD minimizes the same penalty subproblem as Newton."""
    nodes, conn, system = beam
    from tlfea.elements.assembly import lumped_mass

    m = lumped_mass(system.elems)
    f_ext = jnp.zeros((nodes.shape[0], 3)).at[:, 2].add(m * -9.81)
    dt, rho = 2e-3, 1e6

    sN = StepState.rest(system, nodes)
    pN = newton.NewtonParams(dt=dt, rho=rho, inner_atol=1e-11, max_outer=1, max_inner=25)
    for _ in range(2):
        sN, _ = newton.step(system, sN, pN, f_ext)
    xN = np.asarray(sN.x)
    scale = np.abs(xN - nodes).max() + 1e-30

    sV = StepState.rest(system, nodes)
    pV = vbd.VBDParams(
        dt=dt, rho=rho, omega=1.0, inner_tol=1e-9, max_outer=1,
        max_sweeps=400, color_group_size=4, convergence_check_interval=8,
    )
    step = vbd.make_step(system, pV)
    for _ in range(2):
        sV, dV = step(sV, f_ext)
    xV = np.asarray(sV.x)
    dev = np.abs(xV - xN).max() / scale
    assert dev < 0.05, f"VBD deviates {dev:.3e} from Newton (sweeps={int(dV['sweeps'])})"


def test_vbd_free_fall():
    nodes, conn = box_t10_mesh(0.4, 0.2, 0.2, 1, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu)
    elems = feat10.build(nodes, conn, rho=1000.0)
    system = System(elems=elems, material=mat, constraints=None)
    from tlfea.elements.assembly import lumped_mass

    m = lumped_mass(elems)
    f_ext = jnp.zeros((nodes.shape[0], 3)).at[:, 2].add(m * -9.81)
    dt = 1e-3
    params = vbd.VBDParams(dt=dt, inner_tol=1e-10, max_outer=1, max_sweeps=100)
    step = vbd.make_step(system, params)
    state = StepState.rest(system, nodes)
    for _ in range(3):
        state, _ = step(state, f_ext)
    v = np.asarray(state.v)
    np.testing.assert_allclose(v[:, 2], 3 * (-9.81) * dt, rtol=1e-5)


def test_vbd_linear_constraints():
    """Round-2 VBD supports general linear constraints (welds) — beyond the
    reference, whose VBD handles pins only (`SyncedVBD.cu:1089-1118`)."""
    from tlfea.constraints import LinearConstraintBuilder
    from tlfea.elements.assembly import lumped_mass

    nodes, conn = box_t10_mesh(0.6, 0.2, 0.2, 3, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    b = LinearConstraintBuilder()
    for i in np.nonzero(nodes[:, 0] < 1e-12)[0]:
        for d in range(3):
            b.fix_dof(int(i), d, float(nodes[i, d]))
    cons = b.build()
    elems = feat10.build(nodes, conn, rho=1000.0)
    system = System(elems=elems, material=mat, constraints=cons)
    m = lumped_mass(elems)
    f_ext = jnp.zeros((nodes.shape[0], 3)).at[:, 2].add(m * -9.81)
    params = vbd.VBDParams(dt=2e-3, rho=1e7, inner_tol=1e-8, max_outer=3, max_sweeps=200)
    step = vbd.make_step(system, params)
    state = StepState.rest(system, nodes)
    for _ in range(3):
        state, diag = step(state, f_ext)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    clamped = np.nonzero(nodes[:, 0] < 1e-12)[0]
    assert np.abs(x[clamped] - nodes[clamped]).max() < 5e-4  # weld rows hold (ALM)
    assert x[:, 2].min() < -1e-5  # beam sags
