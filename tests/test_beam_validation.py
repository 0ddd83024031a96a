"""ANCF3243 beam bending validation vs Euler-Bernoulli theory.

Completes the per-family analytic validation trio (T10:
test_validation.py; shell: test_shell_validation.py). Fully-parameterized
ANCF beams carry transverse-shear/cross-section energy, so a slender beam
and nu = 0 are used where E-B theory is exact in the limit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import ancf3243
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.simulation import Simulation, gravity_force
from tlfea.solvers import System, StepState, newton


@pytest.mark.slow
def test_ancf_beam_cantilever_matches_euler_bernoulli():
    L_el, W, H = 0.25, 0.05, 0.05
    n_el = 8  # total length 2.0
    L_tot = n_el * L_el
    E, rho = 1e10, 2700.0

    coefs, conn = ancf3243.straight_beam(n_el, L=L_el, origin=(0.0, 0.0, 0.0))
    lam, mu = lame_from_E_nu(E, 0.0)
    mat = SVK(lam=lam, mu=mu, eta_damp=2e5, lam_damp=2e5)
    elems = ancf3243.build(coefs, conn, L_el, W, H, rho=rho)

    fixed = np.arange(4)  # node 0's full coefficient set (clamped)
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

    tip = 4 * n_el  # last node's position coefficient
    tz = float(sim.state.x[tip, 2] - coefs[tip, 2])
    q = rho * 9.81 * W * H
    I = W * H**3 / 12.0
    w_theory = q * L_tot**4 / (8.0 * E * I)
    rel = abs(tz + w_theory) / w_theory
    assert rel < 0.05, f"beam tip {tz:+.6f} vs E-B {-w_theory:+.6f} ({rel:.1%})"
    # Settled.
    assert float(jnp.abs(sim.state.v).max()) < 1e-2 * abs(w_theory) / 1e-2
