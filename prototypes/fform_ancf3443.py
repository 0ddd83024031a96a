"""Standalone NumPy prototype of the ANCF3443 shell pipeline ("f-form").

Role: executable spec for the 4-node fully-parameterized shell element +
ALM gradient, mirroring the reference's `test-scripts/3443-shell/
f-form-3443-{nesterov,adamw}.py` prototypes (the last missing executable
spec from round 1). Dense NumPy, no JAX: 16-term monomial basis, 16x16
nodal-condition matrix inversion, per-QP physical gradients, SVK internal
force, consistent mass, the ALM gradient, and a NAG inner loop.
"""

from __future__ import annotations

import numpy as np

# Basis {1,u,v,w,uv,uw,vw,uvw,u^2,v^2,u^2 v,u v^2,u^3,v^3,u^3 v,u v^3}
# (reference `ANCF3443DataFunc.cuh:114-132`).
MONO = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    (2, 0, 0), (0, 2, 0), (2, 1, 0), (1, 2, 0),
    (3, 0, 0), (0, 3, 0), (3, 1, 0), (1, 3, 0),
]


def basis(u, v, w):
    return np.array([u**a * v**b * w**c for (a, b, c) in MONO])


def basis_grad(u, v, w):
    out = np.zeros((16, 3))
    for k, (a, b, c) in enumerate(MONO):
        out[k, 0] = a * u ** max(a - 1, 0) * v**b * w**c if a else 0.0
        out[k, 1] = b * u**a * v ** max(b - 1, 0) * w**c if b else 0.0
        out[k, 2] = c * u**a * v**b * w ** max(c - 1, 0) if c else 0.0
    return out


def b_matrix(L, W):
    """Nodal condition matrix: value + 3 gradients at the 4 midsurface
    corners (-,-), (+,-), (+,+), (-,+) (reference `cpu_utils.cc:213-217`
    corner order; conditions as in `ANCF3443_B12_matrix`)."""
    rows = []
    for u0, v0 in ((-L / 2, -W / 2), (L / 2, -W / 2), (L / 2, W / 2), (-L / 2, W / 2)):
        rows.append(basis(u0, v0, 0.0))
        g = basis_grad(u0, v0, 0.0)
        rows.extend([g[:, 0], g[:, 1], g[:, 2]])
    return np.array(rows)  # (16, 16)


def gauss(n):
    return np.polynomial.legendre.leggauss(n)


class FForm3443:
    """Dense-NumPy shell dynamics spec. coefs: (4*n_nodes, 3) node-major
    [r, r_u, r_v, r_w]; conn: (E, 4) corner node ids."""

    def __init__(self, coefs, conn, L, W, H, rho, lam, mu, dt, rho_alm, fixed=None):
        self.coefs = np.asarray(coefs, float)
        self.conn = np.asarray(conn, int)
        self.L, self.W, self.H = L, W, H
        self.lam, self.mu = lam, mu
        self.dt, self.rho_alm = dt, rho_alm
        self.fixed = np.asarray(fixed, int) if fixed is not None else np.array([], int)
        self.n = self.coefs.shape[0]
        Binv_T = np.linalg.inv(b_matrix(L, W).T)

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
            [self.conn[:, c] * 4 + k for c in range(4) for k in range(4)], axis=1
        )  # (E, 16) node-major coefficient ids

        half = np.array([L / 2, W / 2, H / 2])

        def precompute(pts, wts):
            E = self.conn.shape[0]
            Qn = len(wts)
            gradN = np.zeros((E, Qn, 16, 3))
            dV = np.zeros((E, Qn))
            for q, (xi, eta, zeta) in enumerate(pts):
                u, v_, w_ = half * (xi, eta, zeta)
                db = basis_grad(u, v_, w_) * half  # d/d(xi,eta,zeta)
                ds = Binv_T @ db  # (16, 3)
                for e in range(E):
                    X = self.coefs[self.coef_conn[e]]  # (16, 3)
                    J = X.T @ ds
                    gradN[e, q] = np.linalg.solve(J.T, ds.T).T
                    dV[e, q] = np.linalg.det(J) * wts[q]
            return gradN, dV

        # Stiffness rule 4x4x3, mass rule 7x7x3 (reference
        # `quadrature_utils.h:20-21`, `SyncedNewton.cu:101`).
        self.gradN, self.dV = precompute(*rule(4, 4, 3))
        pts, wts = rule(7, 7, 3)
        M = np.zeros((self.n, self.n))
        for q, (xi, eta, zeta) in enumerate(pts):
            u, v_, w_ = half * (xi, eta, zeta)
            s = Binv_T @ basis(u, v_, w_)
            db = basis_grad(u, v_, w_) * half
            ds = Binv_T @ db
            for e in range(self.conn.shape[0]):
                idx = self.coef_conn[e]
                X = self.coefs[idx]
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
                for a in range(16):
                    f[idx[a]] += P @ self.gradN[e, q, a] * self.dV[e, q]
        return f

    def grad(self, v, x_prev, v_prev, lam_dual, f_ext):
        x = x_prev + self.dt * v
        g = (self.M @ (v - v_prev)) / self.dt + self.f_int(x) - f_ext
        if len(self.fixed):
            c = x[self.fixed] - self.coefs[self.fixed]
            g[self.fixed] += self.dt * (lam_dual + self.rho_alm * c)
        return g

    def nag_step(self, x_prev, v_prev, lam_dual, f_ext, alpha, iters):
        """One backward-Euler step: NAG inner loop + single dual update
        (the reference f-form's solver structure)."""
        v_k = v_prev.copy()
        v_km1 = v_prev.copy()
        t = 1.0
        for _ in range(iters):
            t_next = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
            beta = (t - 1.0) / t_next
            y = v_k + beta * (v_k - v_km1)
            g = self.grad(y, x_prev, v_prev, lam_dual, f_ext)
            v_km1, v_k, t = v_k, y - alpha * g, t_next
        x = x_prev + self.dt * v_k
        if len(self.fixed):
            lam_dual = lam_dual + self.rho_alm * self.dt * (
                x[self.fixed] - self.coefs[self.fixed]
            )
        return x, v_k, lam_dual
