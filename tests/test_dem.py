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
        def do_dynamics(self, meshes, x_np):
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
