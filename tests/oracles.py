"""Independent NumPy oracle implementations used to validate device kernels.

Straight-line scalar NumPy (no vmap/einsum tricks) implementing the published
formulas: SVK / Mooney-Rivlin first Piola stress, T10 internal force via
explicit per-element quadrature loops, consistent mass assembly. These mirror
the role the reference's Python prototypes play for its CUDA kernels
(`test-scripts/T10-tets/`, cited by kernels e.g. `FEAT10Data.cu:111-113`).
"""

import numpy as np

from tlfea.utils.quadrature import keast5_tet


def svk_P(F, lam, mu):
    E = 0.5 * (F.T @ F - np.eye(3))
    S = lam * np.trace(E) * np.eye(3) + 2.0 * mu * E
    return F @ S


def mr_P(F, mu10, mu01, kappa):
    C = F.T @ F
    I1 = np.trace(C)
    I2 = 0.5 * (I1**2 - np.trace(C @ C))
    J = np.linalg.det(F)
    FinvT = np.linalg.inv(F).T
    Jm23 = J ** (-2.0 / 3.0)
    Jm43 = J ** (-4.0 / 3.0)
    t1 = 2.0 * mu10 * Jm23
    t2 = 2.0 * mu01 * Jm43
    t3 = kappa * (J - 1.0) * J
    term1 = F - (I1 / 3.0) * FinvT
    term2 = I1 * F - F @ C - (2.0 * I2 / 3.0) * FinvT
    return t1 * term1 + t2 * term2 + t3 * FinvT


def kelvin_voigt_P(F, Fdot, eta, lam_d):
    Edot = 0.5 * (Fdot.T @ F + F.T @ Fdot)
    S_vis = 2.0 * eta * Edot + lam_d * np.trace(Edot) * np.eye(3)
    return F @ S_vis


def t10_shape_gradients(xi):
    """dN/d(natural) at a point xi=(x,y,z): returns (10, 3)."""
    L = np.array([1.0 - xi[0] - xi[1] - xi[2], xi[0], xi[1], xi[2]])
    dL = np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    dN = np.zeros((10, 3))
    for i in range(4):
        dN[i] = (4 * L[i] - 1) * dL[i]
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
    for k, (i, j) in enumerate(edges):
        dN[4 + k] = 4 * (L[i] * dL[j] + L[j] * dL[i])
    return dN


def t10_shape_functions(xi):
    L = np.array([1.0 - xi[0] - xi[1] - xi[2], xi[0], xi[1], xi[2]])
    N = np.zeros(10)
    for i in range(4):
        N[i] = L[i] * (2 * L[i] - 1)
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
    for k, (i, j) in enumerate(edges):
        N[4 + k] = 4 * L[i] * L[j]
    return N


def t10_internal_force(nodes_ref, conn, x_cur, v_cur, lam, mu, eta=0.0, lam_d=0.0):
    """Internal force with explicit loops; x_cur, v_cur: (n_nodes, 3)."""
    bary, w = keast5_tet()
    n_nodes = nodes_ref.shape[0]
    f = np.zeros((n_nodes, 3))
    for e in range(conn.shape[0]):
        idx = conn[e]
        X = nodes_ref[idx]
        xc = x_cur[idx]
        vc = v_cur[idx] if v_cur is not None else None
        for q in range(5):
            xi = bary[q, 1:]
            dN = t10_shape_gradients(xi)
            J = X.T @ dN  # (3, 3)
            detJ = np.linalg.det(J)
            gradN = np.linalg.solve(J.T, dN.T).T  # (10, 3)
            F = xc.T @ gradN
            P = svk_P(F, lam, mu)
            if vc is not None and (eta != 0.0 or lam_d != 0.0):
                Fdot = vc.T @ gradN
                P = P + kelvin_voigt_P(F, Fdot, eta, lam_d)
            dV = detJ * w[q]
            for a in range(10):
                f[idx[a]] += P @ gradN[a] * dV
    return f


def t10_mass_matrix(nodes_ref, conn, rho):
    """Dense assembled consistent mass (n_nodes, n_nodes)."""
    bary, w = keast5_tet()
    n = nodes_ref.shape[0]
    M = np.zeros((n, n))
    for e in range(conn.shape[0]):
        idx = conn[e]
        X = nodes_ref[idx]
        for q in range(5):
            xi = bary[q, 1:]
            dN = t10_shape_gradients(xi)
            detJ = np.linalg.det(X.T @ dN)
            N = t10_shape_functions(xi)
            for a in range(10):
                for b in range(10):
                    M[idx[a], idx[b]] += rho * N[a] * N[b] * detJ * w[q]
    return M
