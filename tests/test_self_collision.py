"""Self-collision: grid-hash broadphase + neighbor filtering + full
contact pipeline on a single folded mesh (reference capability:
`HydroelasticBroadphaseFunc.cuh:105-133`, exercised nowhere in round 1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.collision.broadphase import setup_broadphase
from tlfea.collision.gridhash import setup_grid, find_pairs_grid
from tlfea.collision.hydroelastic import HydroelasticCollision, HydroelasticParams
from tlfea.utils.pressure import distance_pressure_field
from tlfea.utils.tetmesh import hairpin_t10_mesh


@pytest.fixture(scope="module")
def hairpin():
    # ny=nz=2: interior tet-CORNER nodes exist, so the distance pressure
    # field is nonzero where the affine patch fields are fitted (with a
    # single element across any thickness direction every tet corner lies
    # on the surface and the hydroelastic field is identically zero).
    nodes, conn = hairpin_t10_mesh(leg=0.4, gap=0.06, nx=24, ny=2, nz=2)
    return nodes, conn


@pytest.mark.slow
def test_grid_broadphase_finds_cross_leg_pairs(hairpin):
    """With a margin larger than the gap, the grid broadphase must produce
    candidate pairs between the two legs (same mesh, topologically distant)
    and none between topological neighbors."""
    nodes, conn = hairpin
    mesh_ids = np.zeros(conn.shape[0], np.int32)
    bp = setup_broadphase(conn, mesh_ids, margin=0.05)
    grid = setup_grid(nodes, conn, margin=0.05)
    pairs, valid, overflow = find_pairs_grid(bp, grid, jnp.asarray(nodes), True)
    assert not bool(overflow)
    pairs = np.asarray(pairs)[np.asarray(valid)]
    assert pairs.shape[0] > 0, "no candidate pairs found across the legs"
    # all candidates are NOT topological neighbors (share no node)
    conn_sets = [set(row) for row in conn]
    for a, b in pairs[:200]:
        assert not conn_sets[a].intersection(conn_sets[b]), (a, b)
    # at least one pair connects the two legs (z-separated element centers)
    cz = nodes[conn].mean(axis=1)[:, 2]
    cross = np.abs(cz[pairs[:, 0]] - cz[pairs[:, 1]]) > 0.03
    assert cross.any()


def test_grid_matches_dense_reference(hairpin):
    """Grid candidates = brute-force AABB overlaps (minus neighbors), up to
    the superset allowed by cell quantization (grid must MISS nothing)."""
    nodes, conn = hairpin
    mesh_ids = np.zeros(conn.shape[0], np.int32)
    margin = 0.02
    bp = setup_broadphase(conn, mesh_ids, margin=margin)
    grid = setup_grid(nodes, conn, margin=margin)
    pairs, valid, overflow = find_pairs_grid(bp, grid, jnp.asarray(nodes), True)
    assert not bool(overflow)
    got = {tuple(sorted(p)) for p in np.asarray(pairs)[np.asarray(valid)].tolist()}

    pts = nodes[conn]
    lo = pts.min(axis=1) - margin
    hi = pts.max(axis=1) + margin
    conn_sets = [set(row) for row in conn]
    E = conn.shape[0]
    expect = set()
    for a in range(E):
        over = np.all((lo[a] <= hi[a + 1:]) & (hi[a] >= lo[a + 1:]), axis=1)
        for boff in np.nonzero(over)[0]:
            b = a + 1 + boff
            if not conn_sets[a].intersection(conn_sets[b]):
                expect.add((a, b))
    missed = expect - got
    assert not missed, f"grid missed {len(missed)} of {len(expect)} AABB pairs"
    assert got == expect  # 27-cell stencil with cell >= max extent is exact


@pytest.mark.slow
def test_hairpin_self_contact_resists_closing(hairpin):
    """Folded beam, lower leg clamped at its free end, upper leg's free end
    PRESCRIBED to descend (constraint retargeting, the gripper pattern):
    the upper leg presses onto the lower leg; self-contact patches appear
    and the surfaces do not cross.

    This scenario requires Newton globalization: the SVK tangent is
    indefinite under contact compression, and an unguarded CG direction was
    measured teleporting the run from vmax 1.5 to 1e19 m/s in ONE step
    (reproduced with the warm start off, 10x damping, and at dt=5e-4). The
    DEFAULT residual-norm backtracking safeguard (NewtonParams.ls_max,
    triggered by CG's negative-curvature flag) must keep it stable with no
    per-scene knobs — this test runs stock params on purpose."""
    import jax.numpy as jnp

    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.simulation import Simulation
    from tlfea.solvers import StepState, System, newton

    nodes, conn = hairpin
    lam, mu = lame_from_E_nu(2e6, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=5e2, lam_damp=5e2)
    low_end = np.nonzero((nodes[:, 0] > 0.39) & (nodes[:, 2] < 0.03))[0]
    up_end = np.nonzero((nodes[:, 0] > 0.39) & (nodes[:, 2] > 0.08))[0]
    pinned = np.concatenate([low_end, up_end])
    system = System(
        elems=feat10.build(nodes, conn, rho=1000.0), material=mat,
        constraints=FixedCoefs.from_indices(pinned, nodes),
    )
    state = StepState.rest(system, nodes)
    pressures = distance_pressure_field(nodes, conn, 2e6)
    collision = HydroelasticCollision(
        conn, np.zeros(conn.shape[0], np.int32), pressures,
        enable_self_collision=True, broadphase="grid", rest_nodes=nodes,
        max_pairs=32768, margin=0.0,
    )
    params = newton.NewtonParams(
        dt=1e-3, rho=1e8, inner_atol=1e-6, inner_rtol=1e-6, outer_tol=1e-8,
        max_outer=2, max_inner=8, cg_rtol=1e-4, cg_max_iter=300,
    )
    sim = Simulation(
        system, state, newton.stepper(params), collision=collision,
        collision_params=HydroelasticParams(damping=2.0, friction=0.3),
    )
    # Prescribe the upper end downward by 0.07 total (gap 0.06 + press).
    saw_contact = 0
    n_steps = 120
    targets0 = nodes[pinned].copy()
    for k in range(n_steps):
        t = targets0.copy()
        t[len(low_end):, 2] -= 0.07 * (k + 1) / n_steps
        sim.set_constraint_targets(jnp.asarray(t))
        sim.step()
        if sim.last_patches is not None:
            saw_contact = max(saw_contact, int(np.asarray(sim.last_patches.n_contacts)))
    assert saw_contact > 0, "upper leg never made self-contact"
    x = np.asarray(sim.state.x)
    # Surfaces must not cross: in the contact region the upper-leg bottom
    # surface stays above the lower-leg top surface (small hydroelastic
    # overlap is the contact mechanism; a fraction of the 0.025 layer).
    region = (nodes[:, 0] > 0.15) & (nodes[:, 0] < 0.38)
    upper = region & (np.abs(nodes[:, 2] - 0.085) < 1e-6)  # upper bottom surface
    lower = region & (np.abs(nodes[:, 2] - 0.025) < 1e-6)  # lower top surface
    assert upper.any() and lower.any()
    min_upper = x[upper, 2].min()
    max_lower = x[lower, 2].max()
    assert min_upper > max_lower - 0.012, (min_upper, max_lower)
    assert np.isfinite(x).all()
