"""make_rollout (the production lax.scan stepping path, used by bench.py)
must reproduce the step-by-step make_step trajectory, including with the
cross-step frozen preconditioner and the velocity-extrapolation warm start.
"""

import numpy as np
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import StepState, System, newton
from tlfea.utils.tetmesh import box_t10_mesh


def _setup():
    nodes, conn = box_t10_mesh(1.0, 0.2, 0.2, 6, 2, 2)
    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=1e3, lam_damp=1e3)
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0), material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes),
    )
    state = StepState.rest(system, nodes)
    f_ext = jnp.zeros((len(nodes), 3)).at[:, 2].add(
        lumped_mass(system.elems) * -9.81)
    params = newton.NewtonParams(
        dt=1e-3, rho=1e7, inner_atol=1e-6, inner_rtol=0.0, outer_tol=0.0,
        max_outer=1, max_inner=6, cg_rtol=1e-4, cg_max_iter=100,
        ew_eta_max=0.5,
    )
    return system, state, f_ext, params


def test_rollout_matches_stepwise():
    system, state, f_ext, params = _setup()
    N = 5
    step = newton.make_step(system, params)
    st = state
    for _ in range(N):
        st, _ = step(st, f_ext)

    roll = newton.make_rollout(system, params, N)  # refresh=1: identical math
    s_roll, (nit, cgit) = roll(state, f_ext)

    scale = float(jnp.abs(st.x - state.x).max())
    err = float(jnp.abs(s_roll.x - st.x).max())
    assert err <= 1e-9 * max(scale, 1e-12), (err, scale)
    assert np.asarray(nit).shape == (N,)


def test_rollout_stale_precond_same_solution():
    """precond_refresh=K staleness may change CG counts, never the converged
    trajectory (beyond tolerance-level wiggle)."""
    system, state, f_ext, params = _setup()
    N = 8
    fresh = newton.make_rollout(system, params, N, precond_refresh=1)
    stale = newton.make_rollout(system, params, N, precond_refresh=8)
    s_f, _ = fresh(state, f_ext)
    s_s, _ = stale(state, f_ext)
    scale = float(jnp.abs(s_f.x - state.x).max())
    err = float(jnp.abs(s_s.x - s_f.x).max())
    assert err <= 1e-4 * max(scale, 1e-12), (err, scale)


def test_rollout_accepts_unnormalized_state():
    """States missing the optional u/dv fields (hand-built, old checkpoints)
    must work and produce one consistent executable (normalized host-side)."""
    system, state, f_ext, params = _setup()
    bare = StepState(x=state.x, v=state.v, lam=state.lam)  # u=None, dv=None
    roll = newton.make_rollout(system, params, 3)
    s1, _ = roll(bare, f_ext)
    # chained call with the (normalized) output state: same structure
    s2, _ = roll(s1, f_ext)
    assert s2.u is not None and s2.dv is not None
    assert np.isfinite(np.asarray(s2.x)).all()
