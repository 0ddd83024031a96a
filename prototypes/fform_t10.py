"""Standalone NumPy prototype of the T10 backward-Euler ALM pipeline.

Role: executable specification for the device solvers, mirroring the
reference's "f-form" NumPy prototypes (`test-scripts/T10-tets/*.py`) that
its CUDA kernels were written against. Implements, with plain loops and
dense algebra: shape functions, reference-gradient precompute, SVK stress,
internal force, consistent mass, the ALM gradient

    g(v) = M (v - v_prev)/h + f_int(x_prev + h v) - f_ext
           + h J^T (lam + rho c)

and two inner solvers (gradient descent with Nesterov momentum, and a dense
direct Newton), so full implicit steps can be cross-checked against the JAX
implementation end-to-end.
"""

from __future__ import annotations

import numpy as np

KEAST_BARY = np.array(
    [
        [0.25, 0.25, 0.25, 0.25],
        [0.5, 1 / 6, 1 / 6, 1 / 6],
        [1 / 6, 0.5, 1 / 6, 1 / 6],
        [1 / 6, 1 / 6, 0.5, 1 / 6],
        [1 / 6, 1 / 6, 1 / 6, 0.5],
    ]
)
KEAST_W = np.array([-4 / 5, 9 / 20, 9 / 20, 9 / 20, 9 / 20]) / 6.0
EDGES = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
DL = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])


def shape_grad(xi):
    L = np.array([1 - xi[0] - xi[1] - xi[2], xi[0], xi[1], xi[2]])
    dN = np.zeros((10, 3))
    for i in range(4):
        dN[i] = (4 * L[i] - 1) * DL[i]
    for k, (i, j) in enumerate(EDGES):
        dN[4 + k] = 4 * (L[i] * DL[j] + L[j] * DL[i])
    return dN


class FFormT10:
    def __init__(self, nodes, conn, rho, lam, mu, dt, rho_alm, fixed=None, mass_matrix=None):
        self.nodes = np.asarray(nodes, float)
        self.conn = np.asarray(conn, int)
        self.rho, self.lam, self.mu = rho, lam, mu
        self.dt, self.rho_alm = dt, rho_alm
        self.fixed = np.asarray(fixed, int) if fixed is not None else np.array([], int)
        self.n = self.nodes.shape[0]
        self._precompute()
        if mass_matrix is not None:
            # Externally supplied consistent mass (e.g. the SPD degree-exact
            # rule; the built-in keast5 mass is indefinite — a reference
            # quirk preserved for parity only).
            self.M = np.asarray(mass_matrix, float)
        else:
            self._mass()

    def _precompute(self):
        E = self.conn.shape[0]
        self.gradN = np.zeros((E, 5, 10, 3))
        self.dV = np.zeros((E, 5))
        for e in range(E):
            X = self.nodes[self.conn[e]]
            for q in range(5):
                dN = shape_grad(KEAST_BARY[q, 1:])
                J = X.T @ dN
                self.gradN[e, q] = np.linalg.solve(J.T, dN.T).T
                self.dV[e, q] = np.linalg.det(J) * KEAST_W[q]

    def _mass(self):
        # Dense consistent mass via the same 5-pt rule (reference parity).
        M = np.zeros((self.n, self.n))
        for e in range(self.conn.shape[0]):
            idx = self.conn[e]
            X = self.nodes[idx]
            for q in range(5):
                xi = KEAST_BARY[q, 1:]
                L = np.array([1 - xi.sum(), *xi])
                N = np.zeros(10)
                for i in range(4):
                    N[i] = L[i] * (2 * L[i] - 1)
                for k, (i, j) in enumerate(EDGES):
                    N[4 + k] = 4 * L[i] * L[j]
                detJ = np.linalg.det(X.T @ shape_grad(xi))
                M[np.ix_(idx, idx)] += self.rho * np.outer(N, N) * detJ * KEAST_W[q]
        self.M = M

    def f_int(self, x):
        f = np.zeros((self.n, 3))
        for e in range(self.conn.shape[0]):
            idx = self.conn[e]
            for q in range(5):
                F = x[idx].T @ self.gradN[e, q]
                Em = 0.5 * (F.T @ F - np.eye(3))
                P = F @ (self.lam * np.trace(Em) * np.eye(3) + 2 * self.mu * Em)
                for a in range(10):
                    f[idx[a]] += P @ self.gradN[e, q, a] * self.dV[e, q]
        return f

    def grad(self, v, x_prev, v_prev, lam_dual, f_ext):
        x = x_prev + self.dt * v
        g = (self.M @ (v - v_prev)) / self.dt + self.f_int(x) - f_ext
        if len(self.fixed):
            c = x[self.fixed] - self.nodes[self.fixed]
            g[self.fixed] += self.dt * (lam_dual + self.rho_alm * c)
        return g

    def step_nesterov(self, x_prev, v_prev, lam_dual, f_ext, alpha, iters):
        """One backward-Euler step, single outer, NAG inner loop."""
        v_k = v_prev.copy()
        v_km1 = v_prev.copy()
        t = 1.0
        for _ in range(iters):
            t_next = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
            beta = (t - 1) / t_next
            y = v_k + beta * (v_k - v_km1)
            g = self.grad(y, x_prev, v_prev, lam_dual, f_ext)
            v_km1, v_k, t = v_k, y - alpha * g, t_next
        x = x_prev + self.dt * v_k
        if len(self.fixed):
            lam_dual = lam_dual + self.rho_alm * self.dt * (x[self.fixed] - self.nodes[self.fixed])
        return x, v_k, lam_dual

    def step_newton_dense(self, x_prev, v_prev, lam_dual, f_ext, iters=10, fd_eps=1e-7):
        """Dense direct-solve Newton via finite-difference Hessian columns —
        slow but independent of any AD machinery."""
        v = v_prev.copy()
        nd = 3 * self.n
        for _ in range(iters):
            g = self.grad(v, x_prev, v_prev, lam_dual, f_ext).reshape(-1)
            if np.linalg.norm(g) < 1e-10:
                break
            H = np.zeros((nd, nd))
            for k in range(nd):
                dv = np.zeros(nd)
                dv[k] = fd_eps
                gp = self.grad(
                    v + dv.reshape(-1, 3), x_prev, v_prev, lam_dual, f_ext
                ).reshape(-1)
                H[:, k] = (gp - g) / fd_eps
            v = v - np.linalg.solve(0.5 * (H + H.T), g).reshape(-1, 3)
        x = x_prev + self.dt * v
        if len(self.fixed):
            lam_dual = lam_dual + self.rho_alm * (x[self.fixed] - self.nodes[self.fixed])
        return x, v, lam_dual
