"""Airless tire: ANCF3443 shell mesh from `.ancf3443mesh` with welded-joint
linear constraints.

Workload parity: reference `lib_bin/mesh_deform/test_ancf3443_mesh_newton.cc`
(airless tire, 1120 nodes / 720 shells / 160 welded joints, rim fixed,
load applied).

Run: python examples/ancf3443_tire.py --steps=10
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tlfea.elements import ancf3443
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation, gravity_force
from tlfea.solvers import System, StepState
from tlfea.utils import io_vtk
from tlfea.utils.ancf_mesh import read_ancf3443_mesh
from tlfea.utils.cli import Cli

from _common import REF_DATA, make_solver, out_dir


def main():
    args = (
        Cli("ANCF3443 airless tire (reference: test_ancf3443_mesh_newton.cc)")
        .add("mesh", os.path.join(REF_DATA, "meshes/ANCF3443/airless_tire.ancf3443mesh"), "")
        .add("solver", "newton", "newton|nesterov|adamw|vbd")
        .add("steps", 10, "time steps")
        .add("dt", 1e-3, "time step [s]")
        .add("E", 1e7, "Young's modulus")
        .add("nu", 0.33, "Poisson ratio")
        .add("rho0", 1100.0, "density")
        .add("damping", 1e3, "Kelvin-Voigt damping")
        .add("rho_alm", 1e8, "ALM penalty")
        .add("rim_radius", 0.16, "nodes within this radius of the axis are fixed")
        .add("vtk_every", 5, "VTU export interval (0 = off)")
        .parse()
    )

    mesh = read_ancf3443_mesh(args["mesh"])
    print(f"tire: {mesh.n_nodes} nodes, {mesh.conn.shape[0]} shells, "
          f"{mesh.constraint_builder._n_rows} joint rows")

    # Fix nodes near the rim (small radius about the tire axis, here y-axis).
    pos = mesh.coefs[0::4]
    center = pos.mean(axis=0)
    r = np.linalg.norm(pos[:, [0, 2]] - center[[0, 2]], axis=1)
    rim = np.nonzero(r < args["rim_radius"])[0]
    print(f"fixing {len(rim)} rim nodes")
    for n in rim:
        for slot in range(4):
            for c in range(3):
                mesh.constraint_builder.fix_dof(4 * n + slot, c, mesh.coefs[4 * n + slot, c])

    cons = mesh.constraints()
    elems = ancf3443.build(
        mesh.coefs, mesh.conn, mesh.elem_L, mesh.elem_W, mesh.elem_H, rho=args["rho0"]
    )
    lam, mu = lame_from_E_nu(args["E"], args["nu"])
    mat = SVK(lam=lam, mu=mu, eta_damp=args["damping"], lam_damp=args["damping"])
    system = System(elems=elems, material=mat, constraints=cons)
    state = StepState.rest(system, mesh.coefs)

    step = make_solver(args["solver"], system, args["dt"], args["rho_alm"])
    sim = Simulation(system, state, step, base_f_ext=gravity_force(system))

    d = out_dir("ancf3443_tire")
    t0 = time.time()
    for k in range(args["steps"]):
        diag = sim.step()
        if k % 2 == 0:
            dz = float(jnp.abs(sim.state.x[0::4, 2] - pos[:, 2]).max())
            print(f"step {k:3d} max_dz={dz:.6f} |c|={float(diag['norm_c']):.2e}")
        if args["vtk_every"] and k % args["vtk_every"] == 0:
            io_vtk.write_vtu_ancf_hex(
                os.path.join(d, f"tire_{k:05d}.vtu"),
                np.asarray(sim.state.x), mesh.conn,
                mesh.elem_L, mesh.elem_W, mesh.elem_H, "3443",
            )
    wall = time.time() - t0
    print(f"{args['steps']} steps in {wall:.1f}s; out in {d}/")


if __name__ == "__main__":
    main()
