"""Simulation + collision coupling: contact forces separate overlapping
bodies through the full stepping loop (the demo main-loop path, as a test)."""

import numpy as np

import jax.numpy as jnp

from tlfea.collision.hydroelastic import HydroelasticCollision, HydroelasticParams
from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation
from tlfea.solvers import System, StepState, newton
from tlfea.utils.mesh_manager import MeshManager
from tlfea.utils.pressure import distance_pressure_field
from tlfea.utils.tetmesh import box_t10_mesh


def test_contact_separates_overlapping_boxes():
    mm = MeshManager()
    bn, bc = box_t10_mesh(0.5, 0.5, 0.5, 2, 2, 2)
    a = mm.add_mesh(bn, bc, "a")
    b = mm.add_mesh(bn, bc, "b")
    mm.translate_mesh(b, (0.0, 0.0, 0.4))  # 0.1 overlap in z
    for mid in (a, b):
        inst = mm.instances[mid]
        local = mm.elements[inst.elem_offset : inst.elem_offset + inst.n_elems] - inst.node_offset
        mm.set_scalar_field(mid, distance_pressure_field(mm.mesh_nodes(mid), local, 1e5))

    nodes, conn = mm.nodes, mm.elements
    lam, mu = lame_from_E_nu(5e5, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    # Anchor the bottom face of box a.
    fixed = np.nonzero(nodes[:, 2] < nodes[:, 2].min() + 1e-9)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0),
        material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    collision = HydroelasticCollision(conn, mm.elem_mesh_ids(), mm.scalar_field(), window=64)
    params = newton.NewtonParams(dt=1e-3, rho=1e8, inner_atol=1e-6, max_outer=2, max_inner=8)
    sim = Simulation(
        system, StepState.rest(system, nodes), newton.stepper(params),
        collision=collision, collision_params=HydroelasticParams(damping=0.1, friction=0.2),
    )
    nb = mm.instances[b].node_offset
    z0 = float(np.asarray(nodes)[nb:, 2].mean())
    sim.run(10)
    assert sim.last_patches is not None
    assert int(np.asarray(sim.last_patches.n_contacts)) >= 0  # pipeline ran
    z1 = float(np.asarray(sim.state.x)[nb:, 2].mean())
    # Upper box pushed upward out of the overlap.
    assert z1 > z0 + 1e-5, f"contact should push box b up: {z0:.6f} -> {z1:.6f}"
    assert np.isfinite(np.asarray(sim.state.x)).all()
