"""f32 Newton convergence on a stiff (E=7e8) cantilever — the round-2
acceptance tests for the displacement-space state, stiffness-scaled ALM
penalty, and mixed-precision accuracy mode.

The reference's stiff beam-sag config (`lib_bin/beam_sag/test_ancf3243.cc:
287-291`) uses E=7e8. Three independent fixes were needed (see PERF_NOTES
"Float32 convergence floor" for the full investigation):
- u-space state: x_prev + dt*v rounds the Newton increment away in f32;
- rho ~ dt*E*h/dt^2 (1e11 here): a weak penalty leaves constraint
  enforcement to the dual integral action, which destabilizes the
  barely-damped beam — in ANY precision;
- f64 carried ONLY in the displacement vector + the scatter accumulation
  (everything else f32) removes the eps*E*theta evaluation floor.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System, StepState, newton


def _stiff_problem(dtype, accum=None):
    from tlfea.utils.tetmesh import box_t10_mesh

    nodes, conn = box_t10_mesh(1.0, 0.2, 0.15, 8, 2, 2)
    lam, mu = lame_from_E_nu(7e8, 0.3)
    mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
              eta_damp=jnp.asarray(1e5, dtype), lam_damp=jnp.asarray(1e5, dtype))
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    system = System(
        elems=elems, material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)),
        accum_dtype=accum,
    )
    state = StepState.rest(system, nodes.astype(dtype))
    f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
        lumped_mass(elems) * dtype(-9.81))
    return system, state, f_ext


def _run(system, state, f_ext, n_steps, ramp):
    dtype = np.float32
    f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
    params = newton.NewtonParams(
        dt=dtype(1e-3), rho=dtype(1e11),  # dt^2 rho ~ dt E h
        inner_atol=dtype(1e-4 * f_scale), inner_rtol=dtype(0.0),
        outer_tol=dtype(1e-5 * f_scale), max_outer=2, max_inner=8,
        cg_rtol=dtype(1e-4), cg_max_iter=300, ew_eta_max=dtype(0.0),
    )
    step = newton.make_step(system, params)
    final = None
    for k in range(n_steps):
        scale = dtype(min(1.0, (k + 1) / ramp))
        state, diag = step(state, f_ext * scale)
        h = np.asarray(diag["norm_g_history"])
        h = h[np.isfinite(h)]
        assert len(h) > 0, f"diverged at step {k}"
        final = float(h[-1]) / f_scale
    assert np.isfinite(np.asarray(state.x)).all()
    return final, state


@pytest.mark.slow
def test_f32_newton_accuracy_mode_stiff_beam():
    """Accuracy mode (f64 displacement vector only): <= 0.1% of load."""
    system, state, f_ext = _stiff_problem(np.float32, accum="float64")
    state = state.replace(u=state.u.astype(jnp.float64))
    final, _ = _run(system, state, f_ext, n_steps=40, ramp=30)
    assert final <= 1e-3, f"accuracy-mode residual {final:.3e} > 1e-3"


@pytest.mark.slow
def test_f32_newton_pure_f32_stiff_beam():
    """Pure f32 stays stable and within the documented eps*E*theta floor."""
    system, state, f_ext = _stiff_problem(np.float32)
    final, st = _run(system, state, f_ext, n_steps=40, ramp=30)
    # At the small displacements of a 40-step ramp the floor is well under
    # 1%; the important property is stability + convergence, not 1e-3.
    assert final <= 1e-2, f"pure-f32 residual {final:.3e} > 1e-2"


def test_suggest_rho_matches_stiffness_scale():
    """suggest_rho lands within an order of magnitude of the hand-tuned
    penalty that stabilizes this stiff beam (1e11; see module docstring)."""
    from tlfea.solvers import suggest_rho

    system, _, _ = _stiff_problem(np.float32)
    rho = suggest_rho(system.elems, system.material, 1e-3)
    assert 1e10 <= rho <= 1e12, rho


def test_newton_predictor_cuts_iterations_same_solution():
    """Warm-starting the Newton iterate at v + dv (constant-acceleration
    extrapolation, NewtonParams.predict) must reduce iteration counts while
    converging to the same trajectory — it changes only the starting point
    of the iterate, never the backward-Euler fixed point."""
    import jax

    dtype = np.float32
    system, state0, f_ext = _stiff_problem(dtype)
    f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))

    def run(predict):
        params = newton.NewtonParams(
            dt=dtype(1e-3), rho=dtype(1e11),
            inner_atol=dtype(1e-3 * f_scale), inner_rtol=dtype(0.0),
            outer_tol=dtype(0.0), max_outer=1, max_inner=8,
            cg_rtol=dtype(1e-4), cg_max_iter=200, ew_eta_max=dtype(0.5),
            predict=dtype(predict),
        )
        step = newton.make_step(system, params)
        st, tot = state0, 0
        for k in range(12):
            st, diag = step(st, f_ext * dtype(min(1.0, (k + 1) / 8)))
            tot += int(diag["newton_iters"]) * 1000 + int(diag["cg_iters"])
        return st, tot

    st_cold, work_cold = run(0.0)
    st_warm, work_warm = run(1.0)
    # same converged trajectory (both solve to the same tolerance)...
    scale = float(jnp.max(jnp.abs(st_cold.x)))
    err = float(jnp.max(jnp.abs(st_warm.x - st_cold.x))) / scale
    assert err < 1e-5, f"predictor changed the trajectory: rel err {err:.2e}"
    # ...for strictly less total work on this smooth ramp
    assert work_warm < work_cold, (work_warm, work_cold)


def test_f32_iterate_update_resolves_tiny_increments():
    """The u-space mechanism: constraint eval sees dt*v increments that
    absolute-coordinate eval would quantize against node coordinates."""
    from tlfea.solvers.common import constraint_values

    dtype = np.float32
    system, state, _ = _stiff_problem(dtype)
    cons = system.constraints
    v = jnp.full_like(state.x, dtype(1e-5))
    dt = dtype(1e-3)  # dt*v = 1e-8 << eps_f32 * |x| ~ 1.2e-7
    c = constraint_values(cons, state.x, v, dt, system.elems, u_prev=state.u)
    c_abs = cons.eval_c(state.x + dt * v)
    dtv = float(dt) * 1e-5
    # u-space eval sees the increment at full relative precision...
    assert float(jnp.max(jnp.abs(c - dtv))) <= 1e-3 * dtv
    # ...while absolute-coordinate eval quantizes it against the node
    # coordinates (only coordinate-0 components survive exactly).
    assert float(jnp.max(jnp.abs(c_abs - dtv))) >= 0.2 * dtv
