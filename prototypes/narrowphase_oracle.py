"""Standalone NumPy prototype of the hydroelastic narrowphase.

Role: executable specification for `tlfea.collision.narrowphase`, mirroring
how the reference's Python prototypes (`test-scripts/hydropatch_proto/
tet_intersect.py`, `mesh_collision.py`) serve as the oracle its CUDA
narrowphase is diffed against (`test-scripts/compare_narrowphase.py`).
Straight-line scalar NumPy, no fixed-capacity tricks: dynamic lists,
exact geometric predicates.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-10


def affine_from_tet(v, p):
    T = np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]])
    a = np.linalg.solve(T, np.array([p[1] - p[0], p[2] - p[0], p[3] - p[0]]))
    return a, p[0] - a @ v[0]


def plane_tet_intersection(v, n, c):
    g = v @ n + c
    if g.max() < -EPS or g.min() > EPS:
        return []
    pts = [v[i] for i in range(4) if abs(g[i]) <= EPS]
    for (i, j) in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        if g[i] * g[j] < -EPS * EPS:
            t = g[i] / (g[i] - g[j])
            pts.append((1 - t) * v[i] + t * v[j])
    uniq = []
    for p in pts:
        if all(np.linalg.norm(p - q) >= EPS * 10 for q in uniq):
            uniq.append(p)
    if len(uniq) < 3:
        return []
    return order_by_angle(uniq, n)


def order_by_angle(pts, n):
    pts = [np.asarray(p) for p in pts]
    cen = np.mean(pts, axis=0)
    nh = n / np.linalg.norm(n)
    v0 = pts[0] - cen
    v0 = v0 - (v0 @ nh) * nh
    if np.linalg.norm(v0) < EPS:
        for cand in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0])):
            v0 = cand - (cand @ nh) * nh
            if np.linalg.norm(v0) >= EPS:
                break
    u = v0 / np.linalg.norm(v0)
    w = np.cross(nh, u)
    ang = [np.arctan2((p - cen) @ w, (p - cen) @ u) for p in pts]
    return [pts[i] for i in np.argsort(ang)]


def clip_halfspace(poly, n, p0):
    out = []
    m = len(poly)
    for i in range(m):
        A, B = poly[i], poly[(i + 1) % m]
        sA, sB = (A - p0) @ n, (B - p0) @ n
        inA, inB = sA <= EPS, sB <= EPS
        if inA and inB:
            out.append(B)
        elif inA and not inB:
            t = sA / (sA - sB)
            out.append((1 - t) * A + t * B)
        elif not inA and inB:
            t = sA / (sA - sB)
            out.append((1 - t) * A + t * B)
            out.append(B)
    return out


def clip_with_tet(poly, tet, n_ref):
    for (i, j, k, o) in [(0, 1, 2, 3), (0, 1, 3, 2), (0, 2, 3, 1), (1, 2, 3, 0)]:
        if not poly:
            break
        nf = np.cross(tet[j] - tet[i], tet[k] - tet[i])
        if nf @ (tet[o] - tet[i]) > 0:
            nf = -nf
        poly = clip_halfspace(poly, nf, tet[i])
    if len(poly) >= 3:
        poly = order_by_angle(poly, n_ref)
    return poly


def polygon_area_centroid(poly):
    if len(poly) < 3:
        return 0.0, np.zeros(3)
    area = 0.0
    wsum = np.zeros(3)
    for i in range(1, len(poly) - 1):
        c = np.cross(poly[i] - poly[0], poly[i + 1] - poly[0])
        a = 0.5 * np.linalg.norm(c)
        area += a
        wsum += a * (poly[0] + poly[i] + poly[i + 1]) / 3.0
    if area > EPS:
        return area, wsum / area
    return area, np.mean(poly, axis=0)


def contact_patch(vA, pA, vB, pB):
    """Returns dict or None (no patch)."""
    aA, bA = affine_from_tet(vA, pA)
    aB, bB = affine_from_tet(vB, pB)
    n = aA - aB
    c = bA - bB
    n_norm = np.linalg.norm(n)
    if n_norm < EPS:
        return None
    poly = plane_tet_intersection(vA, n, c)
    if len(poly) < 3:
        return None
    poly = clip_with_tet(poly, vB, n)
    if len(poly) < 3:
        return None
    area, centroid = polygon_area_centroid(poly)
    if area < EPS * EPS:
        return None
    nhat = n / n_norm
    g_A, g_B = -aA @ nhat, aB @ nhat
    valid_orientation = True
    if g_A <= 0 or g_B <= 0:
        if -g_A > 0 and -g_B > 0:
            nhat, g_A, g_B = -nhat, -g_A, -g_B
        else:
            valid_orientation = False
    return dict(
        verts=poly, area=area, centroid=centroid, normal=nhat,
        g_A=g_A, g_B=g_B, p_eq=aA @ centroid + bA,
        valid_orientation=valid_orientation,
    )
