"""Scene assembly (MeshManager), ANCF mesh readers, VTK/CSV exporters,
Simulation driver + checkpoint/resume."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation, gravity_force
from tlfea.solvers import System, StepState, newton
from tlfea.utils.mesh_manager import MeshManager
from tlfea.utils.tetmesh import box_t10_mesh
from tlfea.utils import io_vtk

REF = "/root/reference"


def test_mesh_manager_scene(tmp_path):
    mm = MeshManager()
    nodes, conn = box_t10_mesh(1.0, 1.0, 1.0, 1, 1, 1)
    a = mm.add_mesh(nodes, conn, "a")
    b = mm.add_mesh(nodes, conn, "b")
    mm.translate_mesh(b, (2.0, 0.0, 0.0))
    assert mm.nodes.shape[0] == 2 * nodes.shape[0]
    assert mm.elements.max() == 2 * nodes.shape[0] - 1
    ids = mm.elem_mesh_ids()
    assert (ids[: conn.shape[0]] == 0).all() and (ids[conn.shape[0] :] == 1).all()
    # Rigid transform: rotate mesh a by 90 deg about z.
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    before = mm.mesh_nodes(a).copy()
    mm.transform_mesh(a, R)
    np.testing.assert_allclose(mm.mesh_nodes(a), before @ R.T, atol=1e-12)

    # NPZ scalar field round-trip.
    field = np.arange(nodes.shape[0], dtype=float)
    path = tmp_path / "field.npz"
    np.savez(path, p_vertex=field)
    mm.load_scalar_field_from_npz(b, str(path))
    full = mm.scalar_field()
    np.testing.assert_allclose(full[nodes.shape[0] :], field)
    np.testing.assert_allclose(full[: nodes.shape[0]], 0.0)


def test_mesh_manager_loads_reference_meshes():
    node = os.path.join(REF, "data/meshes/T10/sphere.1.node")
    ele = os.path.join(REF, "data/meshes/T10/sphere.1.ele")
    if not os.path.exists(node):
        pytest.skip("reference data not available")
    mm = MeshManager()
    mm.load_mesh(node, ele, "sphere")
    assert mm.instances[0].n_elems == 256
    assert mm.instances[0].n_nodes == 529
    tris = mm.surface_triangles(0)
    assert tris.shape[0] > 0


def test_ancf_mesh_readers():
    p3243 = os.path.join(REF, "data/meshes/ANCF3243/net_pinned_nx20_ny20_L0.5.ancf3243mesh")
    if not os.path.exists(p3243):
        pytest.skip("reference data not available")
    from tlfea.utils.ancf_mesh import read_ancf3243_mesh, read_ancf3443_mesh

    mesh = read_ancf3243_mesh(p3243)
    assert mesh.n_nodes == 882
    assert mesh.conn.shape == (840, 2)
    cons = mesh.constraints()
    assert cons is not None
    # 441 pinned constraints x 3 rows each.
    assert cons.n_rows == 441 * 3
    np.testing.assert_allclose(np.asarray(mesh.elem_L), 0.5, atol=1e-12)
    # At rest, all constraints satisfied: c(coefs) = 0.
    c = cons.eval_c(jnp.asarray(mesh.coefs))
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-12)

    p3443 = os.path.join(REF, "data/meshes/ANCF3443/airless_tire.ancf3443mesh")
    tire = read_ancf3443_mesh(p3443)
    assert tire.n_nodes == 1120
    assert tire.conn.shape == (720, 4)
    c = tire.constraints().eval_c(jnp.asarray(tire.coefs))
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-10)


def test_vtu_vtp_csv_writers(tmp_path):
    nodes, conn = box_t10_mesh(1.0, 1.0, 1.0, 1, 1, 1)
    vtu = tmp_path / "mesh.vtu"
    io_vtk.write_vtu_t10(str(vtu), nodes, conn, displacement=np.zeros_like(nodes))
    text = vtu.read_text()
    assert "QUADRATIC" not in text  # numeric cell type
    assert '"24"' not in text  # types are space-separated values, not attrs
    assert "24" in text and "UnstructuredGrid" in text

    csv = tmp_path / "hist.csv"
    io_vtk.write_csv_history(str(csv), ["t", "tip_z"], [(0.0, 1.0), (0.1, 0.9)])
    lines = csv.read_text().strip().split("\n")
    assert lines[0] == "t,tip_z" and len(lines) == 3

    from tlfea.elements import ancf3243

    coefs, c2 = ancf3243.straight_beam(2)
    hexa = tmp_path / "beam.vtu"
    io_vtk.write_vtu_ancf_hex(str(hexa), coefs, c2, 2.0, 0.5, 0.5, "3243")
    assert "12" in hexa.read_text()


def test_simulation_checkpoint_roundtrip(tmp_path):
    nodes, conn = box_t10_mesh(0.5, 0.1, 0.1, 2, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0),
        material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    state = StepState.rest(system, nodes)
    params = newton.NewtonParams(dt=1e-3, rho=1e8, inner_atol=1e-8, max_outer=2, max_inner=8)
    sim = Simulation(system, state, newton.stepper(params), base_f_ext=gravity_force(system))
    sim.run(3)
    ckpt = tmp_path / "state.npz"
    sim.save_state(str(ckpt))
    x3 = np.asarray(sim.state.x)
    sim.run(2)
    x5 = np.asarray(sim.state.x)

    # Resume from checkpoint and re-run: trajectories must match exactly.
    sim2 = Simulation(system, state, newton.stepper(params), base_f_ext=gravity_force(system))
    sim2.load_state(str(ckpt))
    assert sim2.step_count == 3
    np.testing.assert_allclose(np.asarray(sim2.state.x), x3, atol=0)
    sim2.run(2)
    np.testing.assert_allclose(np.asarray(sim2.state.x), x5, atol=1e-15)


def test_prescribed_motion_retargeting():
    """Moving constraint targets drags the pinned nodes (the bubble-gripper
    pattern, reference `test_bubble_gripper_bunny.cc:458-459`)."""
    nodes, conn = box_t10_mesh(0.5, 0.1, 0.1, 2, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0),
        material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    state = StepState.rest(system, nodes)
    params = newton.NewtonParams(dt=1e-3, rho=1e10, inner_atol=1e-8, max_outer=3, max_inner=10)
    sim = Simulation(system, state, newton.stepper(params))
    dz_per_step = 1e-4
    target = np.asarray(nodes[fixed])
    for k in range(5):
        target = target + np.array([0.0, 0.0, dz_per_step])
        sim.set_constraint_targets(target)
        sim.step()
    x = np.asarray(sim.state.x)
    np.testing.assert_allclose(
        x[fixed, 2], nodes[fixed, 2] + 5 * dz_per_step, atol=1e-6
    )
