"""ANCF3443 shell bending validation vs thin-plate (wide-beam) theory.

The reference validates shells against its NumPy prototypes
(`test-scripts/3443-shell`); here the committed ground truth is the
cylindrical-bending cantilever plate solution w = q L^4 / (8 D') with
D' = E H^3 / 12 per unit width under nu = 0 (so beam and plate theory
coincide and membrane locking plays no role at small deflections).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import ancf3443
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation, gravity_force
from tlfea.solvers import System, StepState, newton


@pytest.mark.slow
def test_shell_cantilever_matches_plate_theory():
    L_el, W, H = 0.25, 1.0, 0.02
    n_el = 8  # total length 2.0
    L_tot = n_el * L_el
    E, rho = 2e10, 1000.0

    coefs, conn = ancf3443.shell_strip(n_el, L=L_el, W=W)
    lam, mu = lame_from_E_nu(E, 0.0)
    mat = SVK(lam=lam, mu=mu, eta_damp=2e5, lam_damp=2e5)
    elems = ancf3443.build(coefs, conn, L_el, W, H, rho=rho)

    # Clamp the first node column (all 4 coefficient vectors of both nodes).
    clamp_nodes = [0, 1]
    fixed = np.sort(np.concatenate([4 * np.asarray(clamp_nodes) + k for k in range(4)]))
    system = System(
        elems=elems, material=mat, constraints=FixedCoefs.from_indices(fixed, coefs)
    )
    state = StepState.rest(system, coefs)
    f_ext = gravity_force(system)

    params = newton.NewtonParams(
        dt=1e-2, rho=1e10, inner_atol=1e-7, inner_rtol=1e-9,
        max_outer=2, max_inner=12, cg_rtol=1e-5, cg_max_iter=400,
    )
    sim = Simulation(system, state, newton.stepper(params), base_f_ext=f_ext)
    sim.run(150)

    # Tip deflection at the last column's position coefficients.
    tip_nodes = [int(conn[-1][1]), int(conn[-1][2])]
    tz = float(np.mean([sim.state.x[4 * n, 2] - coefs[4 * n, 2] for n in tip_nodes]))

    q = rho * 9.81 * W * H  # load per unit length
    I = W * H**3 / 12.0
    w_theory = q * L_tot**4 / (8.0 * E * I)
    rel = abs(tz + w_theory) / w_theory
    assert rel < 0.05, f"shell tip {tz:+.6f} vs plate theory {-w_theory:+.6f} ({rel:.1%})"
    assert float(jnp.abs(sim.state.v).max()) < 1e-2 * abs(w_theory) / 1e-2