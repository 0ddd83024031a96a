"""Native DEM backend tests: contact-law invariants, momentum consistency,
mesh attribution (reference capability: DemeMeshCollisionSystem.cu:334-620)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tlfea.collision.dem import (
    DemParams,
    GranularDem,
    NodeSphereDem,
    SphereCloud,
    _closest_point_tri,
    node_sphere_radii,
)
from tlfea.utils.tetmesh import box_t10_mesh, surface_triangles_t10
from tlfea.utils.mesh_manager import MeshManager


def _two_box_scene(gap):
    """Two unit-ish boxes stacked in z, separated by `gap` (negative =
    overlapping)."""
    mm = MeshManager()
    n1, c1 = box_t10_mesh(0.4, 0.4, 0.2, 2, 2, 1)
    a = mm.add_mesh(n1, c1, "a")
    n2, c2 = box_t10_mesh(0.4, 0.4, 0.2, 2, 2, 1)
    b = mm.add_mesh(n2, c2, "b")
    mm.translate_mesh(b, (0.0, 0.0, 0.2 + gap))
    tris = [mm.surface_triangles(mid) for mid in range(2)]
    return mm, tris


def test_node_sphere_dem_third_law_and_sign():
    # Surfaces 0.04 apart: inside the sphere "skin" (radii ~0.05) but not
    # crossed — the regime node-sphere DEM is built for (contact engages
    # before surfaces interpenetrate).
    mm, tris = _two_box_scene(gap=0.04)
    x = mm.nodes
    dem = NodeSphereDem(x, tris)
    f, info, overflow = dem.step(x, np.zeros_like(x), DemParams(kn=1e5, cn=0.0, mu=0.0))
    f = np.asarray(f)
    assert int(info.n_contacts) > 0
    # Newton's third law: net force over the whole scene ~ 0.
    assert np.abs(f.sum(axis=0)).max() < 1e-8 * np.abs(f).max()
    # Sign: lower box pushed down, upper box pushed up.
    ids_a = np.unique(np.asarray(tris[0]).reshape(-1))
    ids_b = np.unique(np.asarray(tris[1]).reshape(-1))
    assert f[ids_a, 2].sum() < 0
    assert f[ids_b, 2].sum() > 0


def test_node_sphere_dem_no_contact_when_separated():
    mm, tris = _two_box_scene(gap=0.5)
    x = mm.nodes
    dem = NodeSphereDem(x, tris)
    f, info, _ = dem.step(x, np.zeros_like(x))
    assert int(info.n_contacts) == 0
    assert np.abs(np.asarray(f)).max() == 0.0


def test_node_sphere_radii_positive_on_surface():
    nodes, conn = box_t10_mesh(0.4, 0.4, 0.2, 2, 2, 1)
    tris = surface_triangles_t10(conn)
    r = node_sphere_radii(nodes, tris)
    surf = np.unique(tris.reshape(-1))
    assert (r[surf] > 0).all()
    interior = np.setdiff1d(np.arange(len(nodes)), surf)
    assert (r[interior] == 0).all()


def test_closest_point_tri_regions():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    cases = [
        (jnp.array([0.25, 0.25, 1.0]), np.array([0.25, 0.25, 0.0])),  # interior
        (jnp.array([-1.0, -1.0, 0.5]), np.array([0.0, 0.0, 0.0])),  # vertex A
        (jnp.array([2.0, -1.0, 0.0]), np.array([1.0, 0.0, 0.0])),  # vertex B
        (jnp.array([-0.5, 2.0, 0.0]), np.array([0.0, 1.0, 0.0])),  # vertex C
        (jnp.array([0.5, -1.0, 0.0]), np.array([0.5, 0.0, 0.0])),  # edge AB
        (jnp.array([-1.0, 0.5, 0.0]), np.array([0.0, 0.5, 0.0])),  # edge AC
        (jnp.array([1.0, 1.0, 0.0]), np.array([0.5, 0.5, 0.0])),  # edge BC
    ]
    for p, expect in cases:
        pt, bary = _closest_point_tri(p, a, b, c)
        np.testing.assert_allclose(np.asarray(pt), expect, atol=1e-12)
        np.testing.assert_allclose(float(bary.sum()), 1.0, atol=1e-12)
        recon = bary[0] * a + bary[1] * b + bary[2] * c
        np.testing.assert_allclose(np.asarray(recon), expect, atol=1e-12)


def test_granular_dem_momentum_consistent():
    """Impulse the mesh receives equals the negative non-gravity impulse the
    cloud receives (exact for symplectic Euler + averaged mesh force)."""
    nodes, conn = box_t10_mesh(0.5, 0.5, 0.1, 2, 2, 1)
    tris = surface_triangles_t10(conn)
    dem = GranularDem(tris, n_sub=16)
    cloud = SphereCloud.grid(
        center=(0.25, 0.25, 0.12), extent=(0.2, 0.2, 0.0),
        spacing=0.05, radius=0.028,  # 0.02 above plate top < r: touching it
    )
    dem.bind_cloud(cloud)
    p0 = np.asarray(cloud.m[:, None] * cloud.v).sum(axis=0)
    dt = 1e-3
    f_mesh, info, _ = dem.step(nodes, np.zeros_like(nodes), DemParams(kn=1e5, cn=10.0, mu=0.3), dt=dt)
    new_cloud = info["cloud"]
    p1 = np.asarray(new_cloud.m[:, None] * new_cloud.v).sum(axis=0)
    m_tot = float(np.asarray(cloud.m).sum())
    grav_impulse = np.array([0.0, 0.0, -9.81 * m_tot * dt])
    mesh_impulse = np.asarray(f_mesh).sum(axis=0) * dt
    np.testing.assert_allclose(p1 - p0 - grav_impulse, -mesh_impulse, rtol=1e-6, atol=1e-12)
    # Spheres start penetrating the mesh from above: mesh must be pushed down.
    assert mesh_impulse[2] < 0


def test_granular_dem_settles_on_plate():
    """Spheres dropped on a plate come to rest resting on it (dissipation)."""
    nodes, conn = box_t10_mesh(0.5, 0.5, 0.1, 2, 2, 1)
    tris = surface_triangles_t10(conn)
    dem = GranularDem(tris, n_sub=8)
    cloud = SphereCloud.grid(
        center=(0.25, 0.25, 0.2), extent=(0.1, 0.1, 0.0),
        spacing=0.06, radius=0.02,
    )
    dem.bind_cloud(cloud)
    params = DemParams(kn=2e4, cn=20.0, mu=0.3)
    for _ in range(400):
        dem.step(nodes, np.zeros_like(nodes), params, dt=2e-3)
    c = dem.cloud
    # Settled: slow, and resting near the plate top surface z=0.1+r.
    assert float(jnp.abs(c.v).max()) < 0.05
    z = np.asarray(c.x[:, 2])
    assert (z > 0.1).all() and (z < 0.16).all()


def test_dem_bridge_attribution():
    """Bridge spreads each contact only onto its own mesh (round-1 advisor:
    forces were duplicated onto every mesh)."""
    from tlfea.collision.dem_bridge import DemMeshCollision

    mm, tris = _two_box_scene(gap=0.5)
    x = mm.nodes

    class FakeBackend:
        def do_dynamics(self, meshes, x_np, v_np=None):
            pts = np.array([x_np[0] + 1e-3, x_np[-1] - 1e-3])
            frc = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
            return pts, frc, np.array([0, 1])

    bridge = DemMeshCollision(mm, backend=FakeBackend())
    f, _, _ = bridge.step(x)
    f = np.asarray(f)
    ids_a = np.unique(np.asarray(tris[0]).reshape(-1))
    ids_b = np.unique(np.asarray(tris[1]).reshape(-1))
    # Total applied force equals the backend's total (not a multiple of it).
    np.testing.assert_allclose(f.sum(axis=0), [0.0, 0.0, 3.0], atol=1e-9)
    np.testing.assert_allclose(f[ids_a].sum(axis=0), [0.0, 0.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(f[ids_b].sum(axis=0), [0.0, 0.0, 2.0], atol=1e-9)


def test_dem_bridge_cosim_loop():
    """Full co-simulation exchange loop through `Simulation` + Newton
    (reference `DemeMeshCollisionSystem.cu:548-620`): each step PRESCRIBES
    the current FEA positions AND velocities to the engine, the engine runs
    its own dynamics (here a scripted granular floor with persistent
    internal state), forces are RETRIEVED and spread K-nearest. Asserts the
    exchange discipline (fresh state every call, monotone engine clock) and
    the physics (the falling box is arrested by the DEM floor)."""
    from tlfea.collision.dem_bridge import DemMeshCollision
    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.simulation import Simulation, gravity_force
    from tlfea.solvers import StepState, System, newton

    mm = MeshManager()
    n1, c1 = box_t10_mesh(0.3, 0.3, 0.15, 2, 2, 1)
    mm.add_mesh(n1, c1, "drop")
    mm.translate_mesh(0, (0.0, 0.0, 0.05))  # 5 cm above the DEM floor
    nodes = mm.nodes.copy()

    class ScriptedFloorEngine:
        """Mock DEM engine: penalty floor at z=0 with damping, acting at
        penetrating surface nodes. Keeps an internal clock to verify one
        DoDynamics per exchange; records prescribed states."""

        def __init__(self, kn=5e4, cn=100.0):
            self.kn, self.cn = kn, cn
            self.calls = 0
            self.prescribed = []

        def do_dynamics(self, meshes, x_np, v_np=None):
            assert v_np is not None, "bridge must prescribe velocities"
            self.calls += 1
            self.prescribed.append((x_np.copy(), v_np.copy()))
            tris = meshes.surface_triangles(0)
            surf = np.unique(tris.reshape(-1))
            pen = -x_np[surf, 2]
            hit = pen > 0.0
            ids = surf[hit]
            if len(ids) == 0:
                return (np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros((0,), np.int64))
            fz = self.kn * pen[hit] - self.cn * v_np[ids, 2]
            frc = np.zeros((len(ids), 3))
            frc[:, 2] = np.maximum(fz, 0.0)
            pts = x_np[ids]
            return pts, frc, np.zeros((len(ids),), np.int64)

    engine = ScriptedFloorEngine()
    bridge = DemMeshCollision(mm, backend=engine, k_nearest=4)

    lam, mu = lame_from_E_nu(5e5, 0.3)
    mat = SVK(lam=lam, mu=mu, eta_damp=2e2, lam_damp=2e2)
    system = System(elems=feat10.build(nodes, c1, rho=1000.0), material=mat)
    params = newton.NewtonParams(
        dt=2e-3, rho=1e6, inner_atol=1e-5, inner_rtol=1e-5, max_outer=1,
        max_inner=6, cg_rtol=1e-4, cg_max_iter=100,
    )
    sim = Simulation(
        system, StepState.rest(system, nodes), newton.stepper(params),
        base_f_ext=gravity_force(system), collision=bridge,
    )
    n_steps = 120
    sim.run(n_steps)
    # Exchange discipline: exactly one DoDynamics per step, states fresh.
    assert engine.calls == n_steps
    x0_first, _ = engine.prescribed[0]
    x0_last, v_last = engine.prescribed[-1]
    assert not np.allclose(x0_first, x0_last)  # the mesh moved between calls
    # Physics: arrested by the floor (not in free fall: 0.12 s of free fall
    # from 5 cm would put the box bottom at z ~ -0.02), still above it, and
    # nearly settled.
    zmin = float(np.asarray(sim.state.x)[:, 2].min())
    assert zmin > -0.02, f"fell through the DEM floor (zmin={zmin})"
    assert float(np.abs(np.asarray(sim.state.v)).max()) < 1.0
    assert engine.calls == n_steps


def test_dem_params_from_material_mapping():
    """Physical (E, nu, CoR) -> (kn, cn) mapping (reference forwards these
    to DEM-Engine, `DemeMeshCollisionSystem.cu:358-366`): pins the Hertz
    linearization and the EXACT linear spring-dashpot restitution inversion
    |v_out/v_in| = exp(-zeta*pi/sqrt(1-zeta^2)) with zeta = cn/(2 sqrt(kn m*))."""
    from tlfea.collision.dem import dem_params_from_material

    E, nu, radius, mass = 2e6, 0.3, 0.01, 1e-3

    # Elastic contact: no damping.
    p1 = dem_params_from_material(E, nu, 1.0, radius, mass)
    assert float(p1.cn) == 0.0

    # Stiffness: Hertz dF/dd at the characteristic overlap d0.
    e_star = E / (2 * (1 - nu**2))
    r_star = radius / 2
    d0 = 1e-2 * r_star
    kn_expected = (4.0 / 3.0) * e_star * np.sqrt(r_star * d0)
    assert np.isclose(float(p1.kn), kn_expected, rtol=1e-12)

    # Restitution inversion: the derived zeta must reproduce the requested
    # CoR through the closed-form linear-dashpot restitution.
    for cor in (0.9, 0.5, 0.2):
        p = dem_params_from_material(E, nu, cor, radius, mass)
        m_star = mass / 2
        zeta = float(p.cn) / (2 * np.sqrt(float(p.kn) * m_star))
        cor_model = np.exp(-zeta * np.pi / np.sqrt(1 - zeta**2))
        assert np.isclose(cor_model, cor, rtol=1e-10), (cor, cor_model)

    # Perfectly plastic: critical damping.
    p0 = dem_params_from_material(E, nu, 0.0, radius, mass)
    m_star = mass / 2
    assert np.isclose(float(p0.cn), 2 * np.sqrt(float(p0.kn) * m_star), rtol=1e-12)

    # Monotonic: lower restitution -> more damping.
    cns = [float(dem_params_from_material(E, nu, c, radius, mass).cn)
           for c in (1.0, 0.8, 0.5, 0.2, 0.0)]
    assert all(a < b for a, b in zip(cns, cns[1:]))

    import pytest

    with pytest.raises(ValueError):
        dem_params_from_material(E, nu, 1.5, radius, mass)
