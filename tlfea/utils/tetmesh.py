"""T10 tetrahedral mesh IO and generation.

- TetGen `.node` / `.ele` readers with remap from TetGen's T10 midnode
  ordering to the canonical ordering used by `tlfea.elements.feat10`
  (reference: `lib_utils/cpu_utils.cc:607-624`, permutation
  [0, 1, 2, 3, 6, 7, 9, 5, 8, 4]).
- A native structured T10 box-mesh generator (the reference ships only
  pre-generated TetGen files; generating meshes in-framework removes that
  external dependency for tests and benchmarks).
- Surface triangle extraction for collision / visualization (reference:
  `lib_utils/surface_trimesh_extract.h:12-25`).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "TETGEN_TO_CANONICAL",
    "read_tetgen",
    "box_t10_mesh",
    "t10_from_t4",
    "surface_triangles_t10",
]

# TetGen order: [v0,v1,v2,v3, (3-4),(1-4),(1-2),(2-3),(2-4),(1-3)] (1-based
# vertex naming); canonical: [v0,v1,v2,v3, (0-1),(1-2),(0-2),(0-3),(1-3),(2-3)].
TETGEN_TO_CANONICAL = np.array([0, 1, 2, 3, 6, 7, 9, 5, 8, 4], dtype=np.int64)

# Canonical T10 edge list (matches tlfea.elements.feat10.T10_EDGES).
_T10_EDGES = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]

# Faces of a tet by corner indices (outward orientation for positive tets).
_T4_FACES = [(1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)]


def _data_lines(path: str):
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            yield s.split()


def read_tetgen(node_path: str, ele_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a TetGen T10 mesh -> (nodes (N,3) float64, conn (E,10) int canonical).

    Handles both 0- and 1-based index bases (adaptive offset, as the
    reference does in `cpu_utils.cc:745`).
    """
    lines = _data_lines(node_path)
    header = next(lines)
    n_nodes = int(header[0])
    ids = np.empty(n_nodes, dtype=np.int64)
    nodes = np.empty((n_nodes, 3), dtype=np.float64)
    for k in range(n_nodes):
        parts = next(lines)
        ids[k] = int(parts[0])
        nodes[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
    node_base = ids.min()

    lines = _data_lines(ele_path)
    header = next(lines)
    n_elem = int(header[0])
    nodes_per_elem = int(header[1]) if len(header) > 1 else 10
    if nodes_per_elem != 10:
        raise ValueError(f"expected 10-node tets, got {nodes_per_elem}-node elements")
    conn = np.empty((n_elem, 10), dtype=np.int64)
    eids = np.empty(n_elem, dtype=np.int64)
    for k in range(n_elem):
        parts = next(lines)
        eids[k] = int(parts[0])
        conn[k] = [int(p) for p in parts[1 : 1 + 10]]
    # Order rows by element id (files may list elements in any order).
    conn = conn[np.argsort(eids)]
    conn = conn - node_base
    conn = conn[:, TETGEN_TO_CANONICAL]
    return nodes, conn


def t10_from_t4(nodes4: np.ndarray, conn4: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Promote a linear tet mesh to quadratic T10 by inserting edge midnodes."""
    nodes4 = np.asarray(nodes4, dtype=np.float64)
    conn4 = np.asarray(conn4, dtype=np.int64)
    edge_ids: dict[tuple[int, int], int] = {}
    mid_coords: list[np.ndarray] = []
    n0 = nodes4.shape[0]

    def mid(a: int, b: int) -> int:
        key = (a, b) if a < b else (b, a)
        idx = edge_ids.get(key)
        if idx is None:
            idx = n0 + len(mid_coords)
            edge_ids[key] = idx
            mid_coords.append(0.5 * (nodes4[a] + nodes4[b]))
        return idx

    conn10 = np.empty((conn4.shape[0], 10), dtype=np.int64)
    for e, tet in enumerate(conn4):
        conn10[e, :4] = tet
        for k, (i, j) in enumerate(_T10_EDGES):
            conn10[e, 4 + k] = mid(int(tet[i]), int(tet[j]))
    nodes10 = np.vstack([nodes4, np.asarray(mid_coords)]) if mid_coords else nodes4
    return nodes10, conn10


def box_t10_mesh(
    lx: float,
    ly: float,
    lz: float,
    nx: int,
    ny: int,
    nz: int,
    origin=(0.0, 0.0, 0.0),
) -> tuple[np.ndarray, np.ndarray]:
    """Structured T10 mesh of an (lx, ly, lz) box: each grid cell -> 6 tets.

    Returns (nodes (N,3), conn (E,10) canonical), E = 6 * nx * ny * nz.
    Uses the standard Kuhn (Freudenthal) 6-tet cube subdivision, which yields
    a conforming all-positive-volume tetrahedralization.
    """
    xs = np.linspace(0.0, lx, nx + 1) + origin[0]
    ys = np.linspace(0.0, ly, ny + 1) + origin[1]
    zs = np.linspace(0.0, lz, nz + 1) + origin[2]
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    nodes4 = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    # Kuhn subdivision: 6 tets per cube around the main diagonal c0 -> c7.
    kuhn = [
        (0, 1, 3, 7),
        (0, 3, 2, 7),
        (0, 2, 6, 7),
        (0, 6, 4, 7),
        (0, 4, 5, 7),
        (0, 5, 1, 7),
    ]
    tets = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                c = [
                    vid(i, j, k),
                    vid(i + 1, j, k),
                    vid(i, j + 1, k),
                    vid(i + 1, j + 1, k),
                    vid(i, j, k + 1),
                    vid(i + 1, j, k + 1),
                    vid(i, j + 1, k + 1),
                    vid(i + 1, j + 1, k + 1),
                ]
                for t in kuhn:
                    tet = [c[t[0]], c[t[1]], c[t[2]], c[t[3]]]
                    # Ensure positive volume (swap last two if needed).
                    v = nodes4[tet]
                    vol = np.linalg.det(v[1:] - v[0])
                    if vol < 0:
                        tet[2], tet[3] = tet[3], tet[2]
                    tets.append(tet)
    conn4 = np.asarray(tets, dtype=np.int64)
    return t10_from_t4(nodes4, conn4)


def surface_triangles_t10(conn: np.ndarray) -> np.ndarray:
    """Boundary corner-triangles of a T10 mesh -> (T, 3) global node ids.

    A face is on the boundary iff it appears in exactly one element. Only the
    corner nodes are returned (linear surface triangles), matching the
    reference's surface extraction (`surface_trimesh_extract.h:12-25`).
    """
    conn = np.asarray(conn)
    faces: dict[tuple[int, int, int], tuple[int, int, int] | None] = {}
    for tet in conn[:, :4]:
        for f in _T4_FACES:
            tri = (int(tet[f[0]]), int(tet[f[1]]), int(tet[f[2]]))
            key = tuple(sorted(tri))
            if key in faces:
                faces[key] = None  # interior (shared) face
            else:
                faces[key] = tri
    out = [tri for tri in faces.values() if tri is not None]
    return np.asarray(out, dtype=np.int64).reshape(-1, 3)


def hairpin_t10_mesh(
    leg: float = 0.4,
    gap: float = 0.08,
    width: float = 0.05,
    thick: float = 0.05,
    nx: int = 24,
    ny: int = 1,
    nz: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Hairpin (180-degree folded) T10 beam for SELF-contact scenarios.

    A straight box beam is isometrically bent around a half-cylinder so its
    two legs run parallel, surfaces separated by `gap`. Clamping the lower
    leg's free end and letting gravity close the gap produces self-contact
    between topologically-distant elements of ONE mesh — the case the
    reference's neighbor-filtered self-collision path exists for
    (`HydroelasticBroadphaseFunc.cuh:105-133`).

    Returns (nodes (N, 3), conn (E, 10)); the lower leg's free end is at
    x = leg (clamp `nodes[:, 0] > leg - eps`... the fold is at x ~ 0).
    """
    r = 0.5 * (gap + thick)  # centerline turn radius
    arc = np.pi * r
    L = 2 * leg + arc
    nodes, conn = box_t10_mesh(L, width, thick, nx, ny, nz)
    s = nodes[:, 0]
    y = nodes[:, 1]
    d = nodes[:, 2] - 0.5 * thick  # offset from centerline
    s1, s2 = leg, leg + arc
    # Tangent-frame map p(s, y, d) = c(s) + y yhat + d n(s): every cross
    # section is ROTATED (never mirrored), so orientation and detJ > 0 are
    # preserved; along the turn the axial scale is (1 - d/r) > 0.
    out = np.empty_like(nodes)
    m = s <= s1  # lower leg: c=(s,0,0), n=+z
    out[m, 0] = s[m]
    out[m, 1] = y[m]
    out[m, 2] = d[m]
    m = (s > s1) & (s < s2)  # turn: half circle, c=(s1+r sin, 0, r-r cos)
    phi = (s[m] - s1) / r
    out[m, 0] = s1 + (r - d[m]) * np.sin(phi)
    out[m, 1] = y[m]
    out[m, 2] = r - (r - d[m]) * np.cos(phi)
    m = s >= s2  # upper leg: c=(s1-(s-s2), 0, 2r), n=-z
    out[m, 0] = s1 - (s[m] - s2)
    out[m, 1] = y[m]
    out[m, 2] = 2 * r - d[m]
    return out, conn
