"""Energy/momentum diagnostics: AD-consistency of material energies."""

import numpy as np

import jax
import jax.numpy as jnp

from tlfea import diagnostics
from tlfea.elements import feat10
from tlfea.elements.assembly import internal_force
from tlfea.materials import SVK, MooneyRivlin, lame_from_E_nu
from tlfea.utils.tetmesh import box_t10_mesh


def test_f_int_is_gradient_of_energy_svk_and_mr():
    nodes, conn = box_t10_mesh(0.6, 0.3, 0.3, 2, 1, 1)
    elems = feat10.build(nodes, conn, rho=1000.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(nodes + 0.03 * rng.standard_normal(nodes.shape))

    lam, mu = lame_from_E_nu(1e6, 0.3)
    for mat in (SVK(lam=lam, mu=mu), MooneyRivlin(mu10=3e5, mu01=1e5, kappa=1e7)):
        f = np.asarray(internal_force(x, None, elems, mat))
        f_ad = np.asarray(jax.grad(lambda xx: diagnostics.strain_energy(xx, elems, mat))(x))
        scale = np.abs(f_ad).max()
        np.testing.assert_allclose(f, f_ad, rtol=1e-7, atol=1e-9 * scale)


def test_momentum_conservation_free_fall():
    from tlfea.solvers import System, StepState, newton
    from tlfea.simulation import gravity_force

    nodes, conn = box_t10_mesh(0.4, 0.2, 0.2, 1, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    system = System(elems=feat10.build(nodes, conn, rho=1000.0), material=SVK(lam=lam, mu=mu))
    state = StepState.rest(system, nodes)
    params = newton.NewtonParams(dt=1e-3, inner_atol=1e-10, max_outer=1, max_inner=8)
    f_ext = gravity_force(system)
    total_mass = float(jnp.sum(jnp.asarray(
        np.asarray(diagnostics.linear_momentum(jnp.ones_like(state.v), system.elems))[2:3]
    )))
    for k in range(3):
        state, _ = newton.step(system, state, params, f_ext)
    p = np.asarray(diagnostics.linear_momentum(state.v, system.elems))
    # p_z = total_mass * v_z = m * 3 g dt; p_x, p_y ~ 0.
    np.testing.assert_allclose(p[2], total_mass * 3 * (-9.81) * 1e-3, rtol=1e-6)
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-10 * abs(p[2]))
