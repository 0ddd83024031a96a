"""Physical validation against analytic ground truth.

The reference validates against FEniCSx backward-Euler trajectories
(`test-scripts/validation/fenics/beam_dynamic_backward_euler.py`); dolfinx is
not available here, so the committed ground truth is the Euler-Bernoulli
cantilever solution (exact in the small-deflection limit), plus mesh-
refinement consistency. The end-to-end verify recipe
(.claude/skills/verify/SKILL.md) runs the full 300-step settling version;
this test is a shortened CI-friendly variant.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation, gravity_force
from tlfea.solvers import System, StepState, newton
from tlfea.utils.tetmesh import box_t10_mesh


@pytest.mark.slow
def test_cantilever_matches_euler_bernoulli():
    L, W, H = 1.0, 0.05, 0.05
    E, rho = 2e9, 1000.0
    nodes, conn = box_t10_mesh(L, W, H, 8, 1, 1)
    lam, mu = lame_from_E_nu(E, 0.0)  # nu = 0 so E-B theory applies
    mat = SVK(lam=lam, mu=mu, eta_damp=5e4, lam_damp=5e4)  # heavy damping
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=rho),
        material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    params = newton.NewtonParams(
        dt=1e-2, rho=1e9, inner_atol=1e-8, max_outer=2, max_inner=10
    )
    sim = Simulation(
        system, StepState.rest(system, nodes), newton.stepper(params),
        base_f_ext=gravity_force(system),
    )
    sim.run(150)
    tip = int(np.lexsort((nodes[:, 2], nodes[:, 1], -nodes[:, 0]))[0])
    tz = float(sim.state.x[tip, 2]) - nodes[tip, 2]
    q = rho * 9.81 * W * H
    I = W * H**3 / 12.0
    w_theory = q * L**4 / (8.0 * E * I)
    assert abs(tz + w_theory) / w_theory < 0.03, (
        f"tip deflection {tz:.6f} vs Euler-Bernoulli {-w_theory:.6f}"
    )
    # Velocities settled (damping worked).
    assert float(jnp.abs(sim.state.v).max()) < 1e-4
