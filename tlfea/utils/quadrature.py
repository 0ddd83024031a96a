"""Quadrature rules used by the element families.

Provides 1-D Gauss-Legendre rules (2..7 points) and the 5-point Keast rule for
quadratic tetrahedra. Mirrors the tables the reference keeps as Eigen
constants (`lib_utils/quadrature_utils.h:11-172`), but computed here instead
of hard-coded: Gauss-Legendre nodes/weights come from `numpy.polynomial`,
which reproduces the reference's printed constants to machine precision.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gauss_legendre_1d",
    "tensor_product_rule",
    "keast5_tet",
    "N_SHAPE_3243",
    "N_SHAPE_3443",
]

# Shape-function counts for the ANCF families (reference:
# lib_utils/quadrature_utils.h:24-25).
N_SHAPE_3243 = 8
N_SHAPE_3443 = 16


def gauss_legendre_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre rule on [-1, 1] -> (points, weights), float64."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def tensor_product_rule(n_xi: int, n_eta: int, n_zeta: int):
    """Tensor-product Gauss rule on [-1,1]^3.

    Returns (points (N,3), weights (N,)) with xi fastest-varying last — the
    iteration order is xi-major (outer), matching the reference's loop nesting
    over (xi, eta, zeta) in e.g. `lib_src/elements/ANCF3243Data.cu:200-288`.
    """
    xs, wx = gauss_legendre_1d(n_xi)
    ys, wy = gauss_legendre_1d(n_eta)
    zs, wz = gauss_legendre_1d(n_zeta)
    pts = []
    wts = []
    for i in range(n_xi):
        for j in range(n_eta):
            for k in range(n_zeta):
                pts.append((xs[i], ys[j], zs[k]))
                wts.append(wx[i] * wy[j] * wz[k])
    return np.asarray(pts, dtype=np.float64), np.asarray(wts, dtype=np.float64)


def tet_duffy_rule(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Positive-weight tet rule via the Duffy (collapsed-cube) transform.

    Maps an n^3 Gauss-Legendre product rule on [0,1]^3 to the unit right tet
    x+y+z <= 1. The Duffy Jacobian is polynomial, so the rule integrates
    polynomials of total degree <= 2n-4 exactly with all-positive weights —
    for n >= 4 this makes the T10 consistent mass (degree-4 integrand) exact
    and hence SPD, unlike the 5-point Keast rule the reference uses for mass
    (`FEAT10Data.cu:206-278`), whose negative weight renders M indefinite.

    Returns (points (n^3, 3) in tet natural coords, weights (n^3,)) with
    sum(w) = 1/6.
    """
    x, w = gauss_legendre_1d(n)
    x = 0.5 * (x + 1.0)  # [0, 1]
    w = 0.5 * w
    pts = []
    wts = []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                u, vq, t = x[i], x[j], x[k]
                # Duffy: (u, v, t) in cube -> tet
                xi = u
                eta = vq * (1.0 - u)
                zeta = t * (1.0 - u) * (1.0 - vq)
                jac = (1.0 - u) ** 2 * (1.0 - vq)
                pts.append((xi, eta, zeta))
                wts.append(w[i] * w[j] * w[k] * jac)
    return np.asarray(pts, dtype=np.float64), np.asarray(wts, dtype=np.float64)


def keast5_tet() -> tuple[np.ndarray, np.ndarray]:
    """5-point Keast rule for tetrahedra.

    Returns (bary (5,4), weights (5,)). Weights include the 1/6 reference-tet
    volume factor, as in the reference (`quadrature_utils.h:140-158`): the
    rule integrates f over the unit right tet as sum(w_q * f(q)) with
    sum(w) = 1/6.
    """
    bary = np.array(
        [
            [0.25, 0.25, 0.25, 0.25],
            [0.5, 1.0 / 6.0, 1.0 / 6.0, 1.0 / 6.0],
            [1.0 / 6.0, 0.5, 1.0 / 6.0, 1.0 / 6.0],
            [1.0 / 6.0, 1.0 / 6.0, 0.5, 1.0 / 6.0],
            [1.0 / 6.0, 1.0 / 6.0, 1.0 / 6.0, 0.5],
        ],
        dtype=np.float64,
    )
    w = np.array([-4.0 / 5.0, 9.0 / 20.0, 9.0 / 20.0, 9.0 / 20.0, 9.0 / 20.0]) / 6.0
    return bary, w
