"""TPU-only regression for the banded-kernel traced-constraints miscompile.

Bisected on a v5e (jax 0.8-era): with the banded Pallas kernels (primal +
Hv) inside a `lax.while_loop` body, a TRACED `FixedCoefs` (gather/scatter
indices + targets) corrupts the ALM pin term — the first Newton gradient
from rest read 716x too large (a deterministic dt*rho*O(|x_ref|) ghost
term), so convergence checks never fired and every step ran to the
iteration budget. Elements / material / banded tables traced are all fine;
the flat Pallas path is clean under the same shape. The fix closes over
the constraint arrays in the Newton factories (`newton._cons_closure`).

This test runs the production `make_step` path on the same 1k-elem mesh
and asserts the rest-state gradient history starts at exactly ||f_ext||
(the analytic value at rest) and that Newton converges in a few
iterations. Skipped off-TPU: the miscompile never reproduced on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_only():
    if jax.default_backend() in ("cpu",):
        pytest.skip("TPU-only regression (miscompile never reproduced on CPU)")


def test_make_step_banded_rest_gradient(tpu_only):
    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.elements.assembly import lumped_mass
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.ops import pallas_fem
    from tlfea.solvers import StepState, System, newton
    from tlfea.utils.reorder import apply_node_order, rcm_order
    from tlfea.utils.tetmesh import box_t10_mesh

    dtype = np.float32
    nodes, conn = box_t10_mesh(1.0, 0.25, 0.25, 12, 4, 3)
    nodes, conn = apply_node_order(nodes, conn, rcm_order(conn, len(nodes)))
    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
              eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    system = pallas_fem.with_pallas(
        System(elems=elems, material=mat,
               constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype))),
        banded="auto",
    )
    assert getattr(system.pallas, "banded", None) is not None, "banded not built"
    state = StepState.rest(system, nodes.astype(dtype))
    f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
        lumped_mass(elems) * dtype(-9.81)
    )
    f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
    params = newton.NewtonParams(
        dt=dtype(1e-3), rho=dtype(1e7),
        inner_atol=dtype(2.5e-2 * f_scale), inner_rtol=dtype(0.0),
        outer_tol=dtype(0.0), max_outer=1, max_inner=6,
        cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5),
    )
    stepf = newton.make_step(system, params)
    new_state, diag = stepf(state, f_ext)
    hist = np.asarray(diag["norm_g_history"])
    # At rest (u = v = 0, pins at targets) the gradient is exactly -f_ext.
    assert hist[0] == pytest.approx(f_scale, rel=1e-5), (
        f"rest gradient {hist[0]} != ||f_ext|| {f_scale} — traced-constraints "
        "miscompile is back (see module docstring)"
    )
    assert int(diag["newton_iters"]) < params.max_inner, "budget exhausted"
    assert np.isfinite(np.asarray(new_state.x)).all()


def test_make_step_banded_range_coarse(tpu_only):
    """Second TPU-only scan-rollout corruption: under `make_rollout`
    (lax.scan around the step) banded solves returned garbage at 10.6k
    elems (Newton stuck at the budget; CG 235-600/step vs ~17) for
    PCA-axis-sorted node orders while RCM was clean — first blamed on the
    range-mode coarse apply's integer-indexed ops, but EVERY apply variant
    (integer or all-float, range or dense-Agg) produced identical garbage,
    and bisection found g, Hv, precond blocks, _pcg, and _newton_inner all
    bit-exact direct-vs-scan(1). The trigger was the ALM dual: scattering
    the scan-CARRIED `lam` into the banded kernel's output inside the
    Newton/CG while nest (`g.at[idx].add(dt*(lam + rho c))`) miscompiles
    for some banded table layouts. Fix: `_newton_inner` expands the pins
    to dense fields ONCE outside the nest and the banded pin term is pure
    dense math (`pin_aff + pin_lin * u` — see g_and_hvp_banded.pin_terms).
    This test pins rollout behavior on the PCA-sorted order (`best_order`)
    that reproduced it: range-coarse rollouts must converge and match the
    dense-coarse mode."""
    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.elements.assembly import lumped_mass
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.ops import pallas_fem
    from tlfea.solvers import StepState, System, newton
    from tlfea.solvers.coarse import build_coarse_precond
    from tlfea.utils.reorder import apply_node_order, best_order
    from tlfea.utils.tetmesh import box_t10_mesh

    dtype = np.float32
    # The exact repro mesh: 10,584 elems, PCA-axis sort (best_order picks
    # it over RCM here). Smaller meshes did NOT reproduce the miscompile.
    nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
    nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
              eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    system = pallas_fem.with_pallas(
        System(elems=elems, material=mat,
               constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype))),
        banded="auto",
    )
    assert getattr(system.pallas, "banded", None) is not None, "banded not built"
    state = StepState.rest(system, nodes.astype(dtype))
    f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
        lumped_mass(elems) * dtype(-9.81)
    )
    f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
    params = newton.NewtonParams(
        dt=dtype(1e-3), rho=dtype(1e7),
        inner_atol=dtype(5e-3 * f_scale), inner_rtol=dtype(0.0),
        outer_tol=dtype(0.0), max_outer=1, max_inner=6,
        cg_rtol=dtype(1e-3), cg_max_iter=200, ew_eta_max=dtype(0.0),
    )
    dense = build_coarse_precond(system, state.x, float(params.dt),
                                 float(params.rho), ranges=False)
    rngc = build_coarse_precond(system, state.x, float(params.dt),
                                float(params.rho), ranges=True)
    assert rngc.seg > 0
    # make_rollout (lax.scan around the step) is where the corruption lived;
    # make_step alone was always clean.
    roll_d = newton.make_rollout(system, params, 4, coarse=dense,
                                 precond_refresh=8)
    roll_r = newton.make_rollout(system, params, 4, coarse=rngc,
                                 precond_refresh=8)
    s_d, (n_d, c_d) = roll_d(state, f_ext)
    s_r, (n_r, c_r) = roll_r(state, f_ext)
    # Identical coarse space -> same converged rollout + comparable CG.
    scale = float(jnp.abs(s_d.x - jnp.asarray(nodes, dtype)).max()) + 1e-30
    err = float(jnp.abs(s_r.x - s_d.x).max()) / scale
    assert err < 1e-3, err
    assert int(np.asarray(n_r).max()) < params.max_inner, (
        "budget exhausted — range-coarse TPU corruption is back"
    )
    assert int(np.asarray(c_r).sum()) <= 2 * max(int(np.asarray(c_d).sum()), 1), (
        np.asarray(c_r), np.asarray(c_d),
    )
