"""SPMD element-axis sharding: sharded step == single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.parallel.sharding import make_elem_mesh, replicate, shard_system
from tlfea.solvers import System, StepState, newton
from tlfea.utils.tetmesh import box_t10_mesh


@pytest.fixture(scope="module")
def problem():
    nodes, conn = box_t10_mesh(1.0, 0.2, 0.2, 5, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e2, lam_damp=1e2)
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0),
        material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    state = StepState.rest(system, nodes)
    from tlfea.elements.assembly import lumped_mass

    f_ext = jnp.zeros((nodes.shape[0], 3)).at[:, 2].add(lumped_mass(system.elems) * -9.81)
    params = newton.NewtonParams(dt=1e-3, rho=1e8, inner_atol=1e-9, max_outer=2, max_inner=10)
    return system, state, params, f_ext


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"


def test_sharded_step_matches_single_device(problem):
    system, state, params, f_ext = problem

    ref_state, ref_diag = newton.step(system, state, params, f_ext)

    mesh = make_elem_mesh(jax.devices()[:8])
    ssystem = shard_system(system, mesh)
    sstate = replicate(state, mesh)
    sf_ext = replicate(f_ext, mesh)
    # Padding must not change element count semantics.
    assert ssystem.elems.conn.shape[0] % 8 == 0

    sh_state, sh_diag = newton.step(ssystem, sstate, params, sf_ext)

    np.testing.assert_allclose(
        np.asarray(sh_state.x), np.asarray(ref_state.x), rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.v), np.asarray(ref_state.v), rtol=1e-10, atol=1e-12
    )
    assert int(sh_diag["newton_iters"]) == int(ref_diag["newton_iters"])


def test_padded_elements_contribute_nothing(problem):
    """Padding rows (zero dV / zero mass) must not alter forces."""
    system, state, params, f_ext = problem
    from tlfea.elements.assembly import internal_force, mass_matvec
    from tlfea.parallel.sharding import _pad_elems

    padded = _pad_elems(system.elems, 8)
    x = state.x + 0.01
    f0 = internal_force(x, None, system.elems, system.material)
    f1 = internal_force(x, None, padded, system.material)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-12)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(x.shape))
    np.testing.assert_allclose(
        np.asarray(mass_matvec(v, system.elems)),
        np.asarray(mass_matvec(v, padded)),
        atol=1e-12,
    )
