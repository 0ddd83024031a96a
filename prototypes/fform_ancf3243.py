"""Standalone NumPy prototype of the ANCF3243 beam pipeline ("f-form").

Role: executable spec for the ANCF beam element + ALM solvers, mirroring the
reference's `test-scripts/3243-beam/f-form-3243-*.py` prototypes. Dense
NumPy: monomial basis, nodal-condition matrix inversion, per-QP gradients,
SVK internal force, consistent mass, the ALM gradient, and a NAG inner loop.
"""

from __future__ import annotations

import numpy as np

MONO = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 0), (1, 0, 1), (2, 0, 0), (3, 0, 0)]


def basis(u, v, w):
    return np.array([u**a * v**b * w**c for (a, b, c) in MONO])


def basis_grad(u, v, w):
    out = np.zeros((8, 3))
    for k, (a, b, c) in enumerate(MONO):
        out[k, 0] = a * u ** max(a - 1, 0) * v**b * w**c if a else 0.0
        out[k, 1] = b * u**a * v ** max(b - 1, 0) * w**c if b else 0.0
        out[k, 2] = c * u**a * v**b * w ** max(c - 1, 0) if c else 0.0
    return out


def b_matrix(L):
    """Nodal condition matrix at the two beam nodes (+-L/2, 0, 0)."""
    rows = []
    for u0 in (-L / 2.0, L / 2.0):
        rows.append(basis(u0, 0.0, 0.0))
        g = basis_grad(u0, 0.0, 0.0)
        rows.extend([g[:, 0], g[:, 1], g[:, 2]])
    return np.array(rows)


def gauss(n):
    return np.polynomial.legendre.leggauss(n)


class FForm3243:
    def __init__(self, coefs, conn, L, W, H, rho, lam, mu, dt, rho_alm, fixed=None):
        self.coefs = np.asarray(coefs, float)  # (4*n_nodes, 3)
        self.conn = np.asarray(conn, int)  # (E, 2) node ids
        self.L, self.W, self.H = L, W, H
        self.lam, self.mu = lam, mu
        self.dt, self.rho_alm = dt, rho_alm
        self.fixed = np.asarray(fixed, int) if fixed is not None else np.array([], int)
        self.n = self.coefs.shape[0]
        Binv_T = np.linalg.inv(b_matrix(L).T)

        # Stiffness rule 3x2x2, mass rule 6x2x2 (reference rules).
        def rule(nx, ny, nz):
            xs, wx = gauss(nx)
            ys, wy = gauss(ny)
            zs, wz = gauss(nz)
            pts, wts = [], []
            for i in range(nx):
                for j in range(ny):
                    for k in range(nz):
                        pts.append((xs[i], ys[j], zs[k]))
                        wts.append(wx[i] * wy[j] * wz[k])
            return np.array(pts), np.array(wts)

        self.coef_conn = np.stack(
            [self.conn[:, 0] * 4 + k for k in range(4)]
            + [self.conn[:, 1] * 4 + k for k in range(4)],
            axis=1,
        )  # (E, 8)

        def precompute(pts, wts):
            E = self.conn.shape[0]
            Qn = len(wts)
            gradN = np.zeros((E, Qn, 8, 3))
            dV = np.zeros((E, Qn))
            svals = np.zeros((Qn, 8))
            for q, (xi, eta, zeta) in enumerate(pts):
                u, v_, w_ = L * xi / 2, W * eta / 2, H * zeta / 2
                db = basis_grad(u, v_, w_) * np.array([L / 2, W / 2, H / 2])
                ds = Binv_T @ db  # (8, 3) d/d(xi,eta,zeta)
                svals[q] = Binv_T @ basis(u, v_, w_)
                for e in range(E):
                    X = self.coefs[self.coef_conn[e]]  # (8, 3)
                    J = X.T @ ds
                    detJ = np.linalg.det(J)
                    gradN[e, q] = np.linalg.solve(J.T, ds.T).T
                    dV[e, q] = detJ * wts[q]
            return gradN, dV, svals

        self.gradN, self.dV, _ = precompute(*rule(3, 2, 2))
        # Mass.
        pts, wts = rule(6, 2, 2)
        M = np.zeros((self.n, self.n))
        for q, (xi, eta, zeta) in enumerate(pts):
            u, v_, w_ = L * xi / 2, W * eta / 2, H * zeta / 2
            s = np.linalg.inv(b_matrix(L).T) @ basis(u, v_, w_)
            for e in range(self.conn.shape[0]):
                idx = self.coef_conn[e]
                X = self.coefs[idx]
                db = basis_grad(u, v_, w_) * np.array([L / 2, W / 2, H / 2])
                ds = np.linalg.inv(b_matrix(L).T) @ db
                detJ = np.linalg.det(X.T @ ds)
                M[np.ix_(idx, idx)] += rho * np.outer(s, s) * detJ * wts[q]
        self.M = M

    def f_int(self, x):
        f = np.zeros((self.n, 3))
        for e in range(self.conn.shape[0]):
            idx = self.coef_conn[e]
            for q in range(self.gradN.shape[1]):
                F = x[idx].T @ self.gradN[e, q]
                Em = 0.5 * (F.T @ F - np.eye(3))
                P = F @ (self.lam * np.trace(Em) * np.eye(3) + 2 * self.mu * Em)
                for a in range(8):
                    f[idx[a]] += P @ self.gradN[e, q, a] * self.dV[e, q]
        return f

    def grad(self, v, x_prev, v_prev, lam_dual, f_ext):
        x = x_prev + self.dt * v
        g = (self.M @ (v - v_prev)) / self.dt + self.f_int(x) - f_ext
        if len(self.fixed):
            c = x[self.fixed] - self.coefs[self.fixed]
            g[self.fixed] += self.dt * (lam_dual + self.rho_alm * c)
        return g
