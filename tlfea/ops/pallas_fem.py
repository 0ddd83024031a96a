"""Pallas TPU kernel for the fused FEM element contribution.

Computes, per element, the ALM residual contribution

    contrib = f_int,e(x, v) + M_e @ dv_dt

(SVK elastic stress + Kelvin-Voigt viscous stress + consistent mass) — the
compute core of `tlfea.elements.assembly.alm_residual_contributions` — as a
single Pallas kernel. The XLA einsum formulation keeps tensors with a
minor dimension of 3, wasting 125/128 VPU lanes; here the ELEMENT axis is
laid out as (8, 128) VPU tiles (sublane x lane) and all 3x3 tensor algebra
unrolls into full-tile vector FMAs, ~10x faster than the einsum path on TPU.

A hand-derived tangent kernel provides the directional derivative (exact
linearization of the same expressions), wired via `jax.custom_jvp` so the
Newton-PCG Hessian-vector products run through Pallas too.

Gather/scatter (x[conn], segment add) stay in XLA outside the kernel; inputs
arrive pre-gathered and element-transposed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas requires a TPU (or interpreter mode); import lazily-safe.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

__all__ = ["element_contrib", "prepare_tp", "tile_material", "PALLAS_OK"]

SUB, LANE = 8, 128
EBLK = SUB * LANE  # elements per grid block
SYM6 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]  # packed-symmetric


# --- 3x3-of-tiles algebra helpers (each entry is an (8,128) tile) ----------


def _mm(A, B):  # A B
    return [
        [A[i][0] * B[0][j] + A[i][1] * B[1][j] + A[i][2] * B[2][j] for j in range(3)]
        for i in range(3)
    ]


def _mtm(A, B):  # A^T B
    return [
        [A[0][i] * B[0][j] + A[1][i] * B[1][j] + A[2][i] * B[2][j] for j in range(3)]
        for i in range(3)
    ]


def _mmT(A, B):  # A B^T
    return [
        [A[i][0] * B[j][0] + A[i][1] * B[j][1] + A[i][2] * B[j][2] for j in range(3)]
        for i in range(3)
    ]


def _madd(*Ms):
    return [[sum(M[i][j] for M in Ms) for j in range(3)] for i in range(3)]


def _mscale(M, s):
    return [[M[i][j] * s for j in range(3)] for i in range(3)]


def _mT(M):
    return [[M[j][i] for j in range(3)] for i in range(3)]


def _tr(M):
    return M[0][0] + M[1][1] + M[2][2]


def _ddot(A, B):  # A : B
    return sum(A[i][j] * B[i][j] for i in range(3) for j in range(3))


def _svk_stress_rows(Du, Fdot, lam, mu, eta, lam_d):
    """Strain-safe total first Piola from the DISPLACEMENT gradient Du = F-I
    (3x3-of-tiles). E = (Du + Du^T + Du^T Du)/2 avoids the (F^T F - I)
    cancellation that floors float32 accuracy at small strains."""
    Em = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            s = Du[0][i] * Du[0][j] + Du[1][i] * Du[1][j] + Du[2][i] * Du[2][j]
            Em[i][j] = 0.5 * (Du[i][j] + Du[j][i] + s)
    trE = Em[0][0] + Em[1][1] + Em[2][2]
    # S = lam tr(E) I + 2 mu E  (+ viscous part)
    Smat = [[2.0 * mu * Em[i][j] for j in range(3)] for i in range(3)]
    for i in range(3):
        Smat[i][i] = Smat[i][i] + lam * trE
    if Fdot is not None:
        # Edot = (Fd^T F + F^T Fd)/2 with F = I + Du.
        Ed = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                s = Fdot[j][i] + Fdot[i][j]
                s = s + sum(Fdot[k][i] * Du[k][j] + Du[k][i] * Fdot[k][j] for k in range(3))
                Ed[i][j] = 0.5 * s
        trEd = Ed[0][0] + Ed[1][1] + Ed[2][2]
        for i in range(3):
            for j in range(3):
                Smat[i][j] = Smat[i][j] + 2.0 * eta * Ed[i][j]
            Smat[i][i] = Smat[i][i] + lam_d * trEd
    # P = (I + Du) S = S + Du S
    P = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            P[i][j] = Smat[i][j] + (
                Du[i][0] * Smat[0][j] + Du[i][1] * Smat[1][j] + Du[i][2] * Smat[2][j]
            )
    return P, Smat


def _svk_stress_tangent_rows(Du, dF, Fdot, dFdot, lam, mu, eta, lam_d):
    """dP: exact directional derivative of `_svk_stress_rows` in the
    displacement-gradient form. Du: primal Du = F - I; dF = dDu tangent;
    Fdot/dFdot: primal/tangent velocity gradients (or None)."""

    def mtm(A, B):  # A^T B
        return [
            [A[0][i] * B[0][j] + A[1][i] * B[1][j] + A[2][i] * B[2][j] for j in range(3)]
            for i in range(3)
        ]

    def madd(*Ms):
        return [[sum(M[i][j] for M in Ms) for j in range(3)] for i in range(3)]

    def mscale(M, s):
        return [[M[i][j] * s for j in range(3)] for i in range(3)]

    def mm(A, B):  # A B
        return [
            [A[i][0] * B[0][j] + A[i][1] * B[1][j] + A[i][2] * B[2][j] for j in range(3)]
            for i in range(3)
        ]

    def tr(M):
        return M[0][0] + M[1][1] + M[2][2]

    def mT(M):
        return [[M[j][i] for j in range(3)] for i in range(3)]

    # Primal E = (Du + Du^T + Du^T Du)/2 and S0 (strain-safe).
    Em = mscale(madd(Du, mT(Du), mtm(Du, Du)), 0.5)
    S0 = mscale(Em, 2.0 * mu)
    trE = tr(Em)
    for i in range(3):
        S0[i][i] = S0[i][i] + lam * trE

    # dE = (dF + dF^T + dF^T Du + Du^T dF)/2.
    dE = mscale(madd(dF, mT(dF), mtm(dF, Du), mtm(Du, dF)), 0.5)
    dS = mscale(dE, 2.0 * mu)
    trdE = tr(dE)
    for i in range(3):
        dS[i][i] = dS[i][i] + lam * trdE

    if Fdot is not None:
        # Edot = (Fd + Fd^T + Fd^T Du + Du^T Fd)/2 with F = I + Du.
        Ed = mscale(madd(Fdot, mT(Fdot), mtm(Fdot, Du), mtm(Du, Fdot)), 0.5)
        trEd = tr(Ed)
        for i in range(3):
            for j in range(3):
                S0[i][j] = S0[i][j] + 2.0 * eta * Ed[i][j]
            S0[i][i] = S0[i][i] + lam_d * trEd
        dEd = mscale(
            madd(
                dFdot, mT(dFdot),
                mtm(dFdot, Du), mtm(Du, dFdot),
                mtm(Fdot, dF), mtm(dF, Fdot),
            ),
            0.5,
        )
        trdEd = tr(dEd)
        for i in range(3):
            for j in range(3):
                dS[i][j] = dS[i][j] + 2.0 * eta * dEd[i][j]
            dS[i][i] = dS[i][i] + lam_d * trdEd

    # dP = dF S0 + F dS = dF S0 + dS + Du dS.
    return madd(mm(dF, S0), dS, mm(Du, dS))


class _SVKTile:
    """St. Venant-Kirchhoff tile algebra (`materials/svk.py`, reference
    `lib_src/materials/SVK.cuh`). Prep cache per QP: Du (9 rows), total
    second Piola S0 (9), velocity gradient Fd (9, damped only)."""

    name = "svk"

    def __init__(self, material):
        self.lam = float(material.lam)
        self.mu = float(material.mu)
        self.eta = float(material.eta_damp)
        self.lam_d = float(material.lam_damp)
        self.damped = (self.eta != 0.0) or (self.lam_d != 0.0)
        self.prep_rows = 27 if self.damped else 18

    def primal(self, Du, Fd, put=None):
        """Total first Piola from Du = F - I (and Fd when damped); `put`
        (local prep row, tile) caches the Hv-side primal state."""
        P, S0 = _svk_stress_rows(Du, Fd, self.lam, self.mu, self.eta, self.lam_d)
        if put is not None:
            for i in range(3):
                for j in range(3):
                    put(i * 3 + j, Du[i][j])
                    put(9 + i * 3 + j, S0[i][j])
                    if self.damped:
                        put(18 + i * 3 + j, Fd[i][j])
        return P

    def tangent(self, Du, dF, Fd, dFd):
        """Exact dP for arbitrary directions (dF, dFd) at primal (Du, Fd)."""
        return _svk_stress_tangent_rows(
            Du, dF, Fd, dFd, self.lam, self.mu, self.eta, self.lam_d
        )

    def hv(self, G, at, dt):
        """dP along the Newton direction chain dx = dt p (dF = dt G,
        dFd = G, G the contraction of p), with the primal read from the prep
        cache `at(local row)` — the specialized form that needs only ONE
        gradient contraction per Hv (see `_hv_body` docstring)."""
        lam, mu, eta, lam_d = self.lam, self.mu, self.eta, self.lam_d
        Du = [[at(i * 3 + j) for j in range(3)] for i in range(3)]
        S0 = [[at(9 + i * 3 + j) for j in range(3)] for i in range(3)]
        Fd = (
            [[at(18 + i * 3 + j) for j in range(3)] for i in range(3)]
            if self.damped
            else None
        )

        # sym2 = (G + G^T + G^T Du + Du^T G)/2 — shared by dE and dEdot.
        sym2 = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                s = G[i][j] + G[j][i]
                for k in range(3):
                    s = s + G[k][i] * Du[k][j] + Du[k][i] * G[k][j]
                sym2[i][j] = 0.5 * s
        tr_sym2 = sym2[0][0] + sym2[1][1] + sym2[2][2]

        # dS = dt (lam tr I + 2 mu) sym2  [elastic]
        dS = [[(2.0 * mu * dt) * sym2[i][j] for j in range(3)] for i in range(3)]
        for i in range(3):
            dS[i][i] = dS[i][i] + (lam * dt) * tr_sym2

        if self.damped:
            # dEdot = sym2 + dt (Fd^T G + G^T Fd)/2
            trX = None
            for i in range(3):
                for j in range(3):
                    xx = sum(Fd[k][i] * G[k][j] + G[k][i] * Fd[k][j] for k in range(3))
                    dEd = sym2[i][j] + (0.5 * dt) * xx
                    dS[i][j] = dS[i][j] + (2.0 * eta) * dEd
                    if i == j:
                        trX = dEd if trX is None else trX + dEd
            for i in range(3):
                dS[i][i] = dS[i][i] + lam_d * trX

        # dP = dt G S0 + dS + Du dS
        dP = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                s = dS[i][j]
                for k in range(3):
                    s = s + dt * G[i][k] * S0[k][j] + Du[i][k] * dS[k][j]
                dP[i][j] = s
        return dP


class _MRTile:
    """Compressible Mooney-Rivlin tile algebra (`materials/mooney_rivlin.py`,
    reference `lib_src/materials/MooneyRivlin.cuh:45-225`), with the exact
    cancellation-free J - 1 and a hand-derived directional tangent.

    Prep cache per QP: Du (9 rows), G = F^{-T} (9), scalars [J-1, I1, I2]
    (3), Fd (9, damped only). C, FC, and B = F F^T are RECOMPUTED per Hv
    (three tile matmuls) instead of cached: these kernels are DMA-bound
    (PERF_NOTES), so 27 fewer cached rows beat ~80 extra FMAs per QP.
    """

    name = "mr"

    def __init__(self, material):
        self.mu10 = float(material.mu10)
        self.mu01 = float(material.mu01)
        self.kappa = float(material.kappa)
        self.eta = float(material.eta_damp)
        self.lam_d = float(material.lam_damp)
        self.damped = (self.eta != 0.0) or (self.lam_d != 0.0)
        self.prep_rows = 30 if self.damped else 21

    def _elastic(self, Du):
        """Primal quantities from Du = F - I: (F, C, FC, G, I1, I2, Jm1).

        Jm1 = tr(Du) + c2(Du) + det(Du) is the exact J - 1 (no det(F) - 1
        cancellation; see `MooneyRivlin.first_piola_du`)."""
        F = [[Du[i][j] for j in range(3)] for i in range(3)]
        for i in range(3):
            F[i][i] = F[i][i] + 1.0
        trDu = Du[0][0] + Du[1][1] + Du[2][2]
        c2 = (
            Du[0][0] * Du[1][1] - Du[0][1] * Du[1][0]
            + Du[0][0] * Du[2][2] - Du[0][2] * Du[2][0]
            + Du[1][1] * Du[2][2] - Du[1][2] * Du[2][1]
        )
        detDu = (
            Du[0][0] * (Du[1][1] * Du[2][2] - Du[1][2] * Du[2][1])
            - Du[0][1] * (Du[1][0] * Du[2][2] - Du[1][2] * Du[2][0])
            + Du[0][2] * (Du[1][0] * Du[2][1] - Du[1][1] * Du[2][0])
        )
        Jm1 = trDu + c2 + detDu
        J = 1.0 + Jm1
        # Cofactor matrix of F; F^{-T} = cof / J.
        cof = [[None] * 3 for _ in range(3)]
        for i in range(3):
            i1, i2 = (i + 1) % 3, (i + 2) % 3
            for j in range(3):
                j1, j2 = (j + 1) % 3, (j + 2) % 3
                cof[i][j] = F[i1][j1] * F[i2][j2] - F[i1][j2] * F[i2][j1]
        invJ = 1.0 / J
        G = [[cof[i][j] * invJ for j in range(3)] for i in range(3)]
        C = _mtm(F, F)
        I1 = _tr(C)
        trC2 = sum(C[i][j] * C[j][i] for i in range(3) for j in range(3))
        I2 = 0.5 * (I1 * I1 - trC2)
        FC = _mm(F, C)
        return F, C, FC, G, I1, I2, Jm1

    def _viscous_S(self, F, Fd):
        """Kelvin-Voigt second Piola S_v = 2 eta Edot + lam_d tr(Edot) I,
        Edot = sym(Fd^T F) (`assembly.viscous_piola` convention)."""
        X = _mtm(Fd, F)
        Ed = [[0.5 * (X[i][j] + X[j][i]) for j in range(3)] for i in range(3)]
        trEd = _tr(Ed)
        Sv = [[(2.0 * self.eta) * Ed[i][j] for j in range(3)] for i in range(3)]
        for i in range(3):
            Sv[i][i] = Sv[i][i] + self.lam_d * trEd
        return Sv

    def primal(self, Du, Fd, put=None):
        F, C, FC, G, I1, I2, Jm1 = self._elastic(Du)
        J = 1.0 + Jm1
        J13 = jnp.cbrt(J)
        Jm23 = 1.0 / (J13 * J13)
        t1 = (2.0 * self.mu10) * Jm23
        t2 = (2.0 * self.mu01) * (Jm23 * Jm23)
        t3 = self.kappa * Jm1 * J
        c1 = I1 * (1.0 / 3.0)
        c2 = I2 * (2.0 / 3.0)
        P = [
            [
                t1 * (F[i][j] - c1 * G[i][j])
                + t2 * (I1 * F[i][j] - FC[i][j] - c2 * G[i][j])
                + t3 * G[i][j]
                for j in range(3)
            ]
            for i in range(3)
        ]
        if self.damped:
            P = _madd(P, _mm(F, self._viscous_S(F, Fd)))
        if put is not None:
            for i in range(3):
                for j in range(3):
                    put(i * 3 + j, Du[i][j])
                    put(9 + i * 3 + j, G[i][j])
                    if self.damped:
                        put(21 + i * 3 + j, Fd[i][j])
            put(18, Jm1)
            put(19, I1)
            put(20, I2)
        return P

    def _dP(self, F, C, FC, G, I1, I2, Jm1, dF, Fd, dFd, Sv):
        """Exact directional derivative of the total first Piola.

        Elastic part: with s = G : dF (= tr(F^{-1} dF), so dJ = J s),
          dG   = -G dF^T G
          dI1  = 2 F : dF;  dI2 = 2 (I1 F - FC) : dF
          dFC  = dF C + F dF^T F + (F F^T) dF
          dt1  = -(2/3) t1 s;  dt2 = -(4/3) t2 s;  dt3 = kappa (2J-1) J s
          dP   = dt1 T1 + t1 dT1 + dt2 T2 + t2 dT2 + dt3 G + t3 dG
        with T1 = F - (I1/3) G, T2 = I1 F - FC - (2 I2/3) G.
        Viscous part: dP += dF S_v + F dS_v, dS_v from
        dEdot = sym(dFd^T F + Fd^T dF)."""
        J = 1.0 + Jm1
        s = _ddot(G, dF)
        dG = _mscale(_mm(G, _mtm(dF, G)), -1.0)
        FdotdF = _ddot(F, dF)
        dI1 = 2.0 * FdotdF
        dI2 = 2.0 * (I1 * FdotdF - _ddot(FC, dF))
        B = _mmT(F, F)
        dFC = _madd(_mm(dF, C), _mm(F, _mtm(dF, F)), _mm(B, dF))
        J13 = jnp.cbrt(J)
        Jm23 = 1.0 / (J13 * J13)
        t1 = (2.0 * self.mu10) * Jm23
        t2 = (2.0 * self.mu01) * (Jm23 * Jm23)
        t3 = self.kappa * Jm1 * J
        dt1 = (-2.0 / 3.0) * t1 * s
        dt2 = (-4.0 / 3.0) * t2 * s
        dt3 = self.kappa * (2.0 * J - 1.0) * J * s
        c1 = I1 * (1.0 / 3.0)
        c2 = I2 * (2.0 / 3.0)
        dc1 = dI1 * (1.0 / 3.0)
        dc2 = dI2 * (2.0 / 3.0)
        dP = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                T1 = F[i][j] - c1 * G[i][j]
                dT1 = dF[i][j] - dc1 * G[i][j] - c1 * dG[i][j]
                T2 = I1 * F[i][j] - FC[i][j] - c2 * G[i][j]
                dT2 = (
                    dI1 * F[i][j] + I1 * dF[i][j] - dFC[i][j]
                    - dc2 * G[i][j] - c2 * dG[i][j]
                )
                dP[i][j] = (
                    dt1 * T1 + t1 * dT1 + dt2 * T2 + t2 * dT2
                    + dt3 * G[i][j] + t3 * dG[i][j]
                )
        if self.damped:
            X = _madd(_mtm(dFd, F), _mtm(Fd, dF))
            dEd = [[0.5 * (X[i][j] + X[j][i]) for j in range(3)] for i in range(3)]
            trdEd = _tr(dEd)
            dSv = [[(2.0 * self.eta) * dEd[i][j] for j in range(3)] for i in range(3)]
            for i in range(3):
                dSv[i][i] = dSv[i][i] + self.lam_d * trdEd
            dP = _madd(dP, _mm(dF, Sv), _mm(F, dSv))
        return dP

    def tangent(self, Du, dF, Fd, dFd):
        F, C, FC, G, I1, I2, Jm1 = self._elastic(Du)
        Sv = self._viscous_S(F, Fd) if self.damped else None
        return self._dP(F, C, FC, G, I1, I2, Jm1, dF, Fd, dFd, Sv)

    def hv(self, Gp, at, dt):
        """dP along dx = dt p (dF = dt Gp, dFd = Gp) from the prep cache."""
        Du = [[at(i * 3 + j) for j in range(3)] for i in range(3)]
        G = [[at(9 + i * 3 + j) for j in range(3)] for i in range(3)]
        Jm1, I1, I2 = at(18), at(19), at(20)
        Fd = (
            [[at(21 + i * 3 + j) for j in range(3)] for i in range(3)]
            if self.damped
            else None
        )
        F = [[Du[i][j] for j in range(3)] for i in range(3)]
        for i in range(3):
            F[i][i] = F[i][i] + 1.0
        C = _mtm(F, F)
        FC = _mm(F, C)
        dF = _mscale(Gp, dt)
        Sv = self._viscous_S(F, Fd) if self.damped else None
        return self._dP(F, C, FC, G, I1, I2, Jm1, dF, Fd, Gp, Sv)


def tile_material(material):
    """Tile-level (Pallas) algebra for a material pytree, or raise ValueError.

    The returned object is a static kernel-build-time parameter (all floats):
    primal(Du, Fd, put), tangent(Du, dF, Fd, dFd), hv(G, at, dt),
    prep_rows/damped metadata."""
    from tlfea.materials import SVK, MooneyRivlin

    if isinstance(material, SVK):
        return _SVKTile(material)
    if isinstance(material, MooneyRivlin):
        return _MRTile(material)
    raise ValueError(
        f"no Pallas tile algebra for material {type(material).__name__}"
    )


def _center(get, S, tmask):
    """Element-local centering of a per-slot channel accessor (see
    ElementBatch.trans_mask): returns centered (8,128)-tile values per
    (slot, channel), with the reference slot's entry None (exactly zero —
    its contraction term is skipped). Exact: translation-slot shape
    gradients sum to zero; removes the rigid-motion common mode that
    dominates f32 contraction noise at large displacement/strain ratios."""
    if tmask is None:
        return [[get(a, c) for c in range(3)] for a in range(S)]
    r = tmask.index(True)
    out = []
    for a in range(S):
        if a == r:
            out.append([None, None, None])
        elif tmask[a]:
            out.append([get(a, c) - get(r, c) for c in range(3)])
        else:
            out.append([get(a, c) for c in range(3)])
    return out


def _contract(vals, gn, q, S):
    """Du[i][j] = sum_a vals[a][i] * gn(q, a, j), skipping None (zero)."""
    M = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc = None
            for a in range(S):
                if vals[a][i] is None:
                    continue
                t = vals[a][i] * gn(q, a, j)
                acc = t if acc is None else acc + t
            M[i][j] = acc
    return M


def _body(pe_ref, gN_ref, dV_ref, Me_ref, out_ref, *, Q, S, mops, tangent, tmask=None):
    """Shared kernel body. In tangent mode, pe carries tangents and gN/dV/Me
    are the same static arrays; Du/Fdot of the PRIMAL are recomputed from the
    primal half of pe (rows S*9..S*18). Positions arrive as DISPLACEMENTS
    u = x - x_ref (node-space subtraction by the caller; see
    ElementBatch.x_ref), so Du = sum_a u_a x grad_N_a needs no reference
    loads at all. Tangents of u contribute dF directly."""
    W = 18 if tangent else 9
    damped = mops.damped

    def pget(a, c):  # (8,128) tile for slot a, channel c of the leading half
        return pe_ref[a * W + c]

    def pget2(a, c):  # second (primal) half in tangent mode
        return pe_ref[a * W + 9 + c]

    def gn(q, a, j):
        return gN_ref[(q * S + a) * 3 + j]

    fe = [[None] * 3 for _ in range(S)]
    # Centered per-slot operands, computed once outside the q loop: leading
    # half is tangents dF (tangent mode) or displacements (primal mode) —
    # the same contraction either way, and centering is exact for both.
    uc = _center(pget, S, tmask)
    vc = _center(lambda a, c: pget(a, 3 + c), S, tmask) if damped else None
    up = _center(pget2, S, tmask) if tangent else None
    vp = (
        _center(lambda a, c: pget2(a, 3 + c), S, tmask)
        if (tangent and damped)
        else None
    )
    for q in range(Q):
        F = _contract(uc, gn, q, S)
        Fd = _contract(vc, gn, q, S) if damped else None
        Fp = _contract(up, gn, q, S) if tangent else None
        Fdp = _contract(vp, gn, q, S) if (tangent and damped) else None

        if tangent:
            P = mops.tangent(Fp, F, Fdp, Fd)
        else:
            P = mops.primal(F, Fd)

        w = dV_ref[q]
        for a in range(S):
            for i in range(3):
                c = (P[i][0] * gn(q, a, 0) + P[i][1] * gn(q, a, 1) + P[i][2] * gn(q, a, 2)) * w
                fe[a][i] = c if fe[a][i] is None else fe[a][i] + c

    # Consistent-mass term on the dv channel of the leading half.
    for a in range(S):
        for i in range(3):
            acc = fe[a][i]
            for b in range(S):
                acc = acc + Me_ref[a * S + b] * pget(b, 6 + i)
            out_ref[a * 3 + i] = acc


def prepare_tp(elems, dtype=np.float32):
    """Host-side: element-transposed static arrays, padded to EBLK.

    Returns dict with gN_T (Q*S*3, Ebt, LANE), dV_T (Q, Ebt, LANE),
    Me_T (S*S, Ebt, LANE), E_pad, where Ebt = E_pad // LANE and the element
    axis is tiled as (..., sublane-block, lane).
    """
    gN = np.asarray(elems.grad_N, dtype=dtype)  # (E,Q,S,3)
    dV = np.asarray(elems.dV, dtype=dtype)  # (E,Q)
    Me = np.asarray(elems.mass_elem, dtype=dtype)  # (E,S,S)
    E, Q, S, _ = gN.shape
    E_pad = ((E + EBLK - 1) // EBLK) * EBLK

    def tp(a):
        # (E, rows...) -> (prod(rows), E_pad/LANE, LANE)
        flat = a.reshape(E, -1).T  # (rows, E)
        out = np.zeros((flat.shape[0], E_pad), dtype=dtype)
        out[:, :E] = flat
        return out.reshape(flat.shape[0], E_pad // LANE, LANE)

    return dict(
        gN_T=jnp.asarray(tp(gN)),
        dV_T=jnp.asarray(tp(dV)),
        Me_T=jnp.asarray(tp(Me)),
        E=E, E_pad=E_pad, Q=Q, S=S,
    )


def _pallas_call(kernel, n_out_rows, n_blocks, in_arrays, interpret=False):
    out_shape = jax.ShapeDtypeStruct(
        (n_out_rows, in_arrays[0].shape[1], LANE), in_arrays[0].dtype
    )
    in_specs = [
        pl.BlockSpec((a.shape[0], SUB, LANE), lambda b, r=a.shape[0]: (0, b, 0))
        for a in in_arrays
    ]
    out_spec = pl.BlockSpec((n_out_rows, SUB, LANE), lambda b: (0, b, 0))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*in_arrays)


def _wrap_body(body):
    def kernel(pe_ref, gN_ref, dV_ref, Me_ref, out_ref):
        body(pe_ref, gN_ref, dV_ref, Me_ref, out_ref)

    return kernel


def _precond_fe(pget, gn, dv_at, *, Q, S, lam, mu, tmask=None):
    """Per-(element, node) SVK diagonal tangent 3x3 blocks:

        K_aa[d,e] = sum_q svk_tangent_block(F_q, gradN_qa) * dV_q

    (the closed form of `SVK.tangent_diag_block`, reference `SVK.cuh:35-55`;
    the caller applies the uniform dt weight outside the kernel). Accessor
    form shared by the flat kernel (`_precond_body`) and the banded blocks
    kernel (`pallas_banded`): pget(a, c) reads displacement tiles, gn/dv_at
    the static element data. Returns fe[a][c] with c indexing the packed
    upper triangle (SYM6 order) — the block is symmetric, and 6 channels
    instead of 9 cut the out-transpose and scatter bytes by a third.
    """
    acc = [[[None] * 3 for _ in range(3)] for _ in range(S)]
    uc = _center(pget, S, tmask)
    for q in range(Q):
        F = _contract(uc, gn, q, S)
        for i in range(3):
            F[i][i] = F[i][i] + 1.0
        trFtF = sum(F[i][j] * F[i][j] for i in range(3) for j in range(3))
        trE = 0.5 * (trFtF - 3.0)
        FFT = [
            [sum(F[i][k] * F[j][k] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]
        w = dv_at(q)
        for a in range(S):
            h = [gn(q, a, 0), gn(q, a, 1), gn(q, a, 2)]
            Fh = [sum(F[i][j] * h[j] for j in range(3)) for i in range(3)]
            hij = h[0] * h[0] + h[1] * h[1] + h[2] * h[2]
            FhFh = Fh[0] * Fh[0] + Fh[1] * Fh[1] + Fh[2] * Fh[2]
            diag = lam * trE * hij + mu * FhFh - mu * hij
            for d in range(3):
                for e in range(d, 3):
                    K = (lam + mu) * Fh[d] * Fh[e] + mu * hij * FFT[d][e]
                    if d == e:
                        K = K + diag
                    K = K * w
                    prev = acc[a][d][e]
                    acc[a][d][e] = K if prev is None else prev + K
    return [[acc[a][d][e] for (d, e) in SYM6] for a in range(S)]


def _precond_body(pe_ref, gN_ref, dV_ref, out_ref, *, Q, S, lam, mu, tmask=None):
    """Flat-layout wrapper of `_precond_fe`: pe carries displacement
    channels only (S*3 rows); out is packed-symmetric (S*6, SYM6 order)."""
    fe = _precond_fe(
        lambda a, c: pe_ref[a * 3 + c],  # u = x - x_ref, by caller
        lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
        lambda q: dV_ref[q],
        Q=Q, S=S, lam=lam, mu=mu, tmask=tmask,
    )
    for a in range(S):
        for c in range(6):
            out_ref[a * 6 + c] = fe[a][c]


def make_precond_blocks(elems, material, dtype=np.float32, interpret=False, tpd=None):
    """Pallas kernel computing per-(element,node) SVK tangent diag blocks.

    Returns (fn, tpd): fn(xT (S*3, B, L)) -> (S*6, B, L) packed-symmetric
    channels (SYM6 order); the caller scatters, unpacks, and adds
    mass/constraint terms (see `solvers.common.precond_blocks`).

    Heavy elements run the same QP-chunked grid as `make_hv_kernels`.
    """
    if tpd is None:
        tpd = prepare_tp(elems, dtype=dtype)
    Q, S, E_pad = tpd["Q"], tpd["S"], tpd["E_pad"]
    n_blocks = E_pad // EBLK
    NC, Qc = qp_chunks(Q, S, 0)
    if NC == 1:
        body = partial(
            _precond_body, Q=Q, S=S, lam=float(material.lam), mu=float(material.mu),
            tmask=elems.trans_mask,
        )

        def kernel(pe_ref, gN_ref, dV_ref, out_ref):
            body(pe_ref, gN_ref, dV_ref, out_ref)

        def fn(uT):
            return _pallas_call(
                kernel, S * 6, n_blocks,
                [uT, tpd["gN_T"], tpd["dV_T"]],
                interpret=interpret,
            )

        return fn, tpd

    Q_pad = NC * Qc
    gN_c = _pad_q_rows(tpd["gN_T"], S * 3, Q, Q_pad)
    dV_c = _pad_q_rows(tpd["dV_T"], 1, Q, Q_pad)
    lam_f, mu_f = float(material.lam), float(material.mu)
    tmask = elems.trans_mask

    def kernel(pe_ref, gN_ref, dV_ref, out_ref):
        qc = pl.program_id(1)

        @pl.when(qc == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        fe = _precond_fe(
            lambda a, c: pe_ref[a * 3 + c],
            lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
            lambda q: dV_ref[q],
            Q=Qc, S=S, lam=lam_f, mu=mu_f, tmask=tmask,
        )
        for a in range(S):
            for c in range(6):
                out_ref[a * 6 + c] += fe[a][c]

    def fn(uT):
        B = uT.shape[1]
        ins = [uT, gN_c, dV_c]
        in_specs = [
            pl.BlockSpec((S * 3, SUB, LANE), lambda b, q: (0, b, 0)),
            pl.BlockSpec((Qc * S * 3, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((Qc, SUB, LANE), lambda b, q: (q, b, 0)),
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_blocks, NC),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((S * 6, SUB, LANE), lambda b, q: (0, b, 0)),
            out_shape=jax.ShapeDtypeStruct((S * 6, B, LANE), uT.dtype),
            interpret=interpret,
        )(*ins)

    return fn, tpd


def tangent_blocks(u, elems, fn, tpd, dt):
    """Scattered per-coefficient 3x3 tangent blocks via the Pallas kernel.

    u: node-level displacements (x - x_ref)."""
    S, E, E_pad = tpd["S"], tpd["E"], tpd["E_pad"]
    n = u.shape[0]
    ue = u[elems.conn]  # (E, S, 3)
    uT = jnp.transpose(ue, (1, 2, 0)).reshape(S * 3, E)
    uT = jnp.pad(uT, ((0, 0), (0, E_pad - E))).reshape(S * 3, E_pad // LANE, LANE)
    outT = fn(uT) * dt  # (S*6, B, L) packed-symmetric; dt weight applied here
    out = outT.reshape(S, 6, E_pad)[:, :, :E]
    sym_e = jnp.transpose(out, (2, 0, 1))  # (E, S, 6)
    sym = jnp.zeros((n, 6), dtype=u.dtype)
    sym = sym.at[elems.conn.reshape(-1)].add(sym_e.reshape(-1, 6))
    # Unpack SYM6 -> (n, 3, 3) after the scatter (small, node-sized).
    rows = jnp.stack(
        [
            jnp.stack([sym[:, 0], sym[:, 1], sym[:, 2]], axis=-1),
            jnp.stack([sym[:, 1], sym[:, 3], sym[:, 4]], axis=-1),
            jnp.stack([sym[:, 2], sym[:, 4], sym[:, 5]], axis=-1),
        ],
        axis=-2,
    )
    return rows


def make_element_contrib(elems, material, dtype=np.float32, interpret=False, tpd=None):
    """Build contrib(pe_T) -> out_T as a custom-jvp Pallas op.

    pe_T: (S*9, E_pad//LANE, LANE) element-transposed packed [x|v|dv] values.
    out_T: (S*3, E_pad//LANE, LANE).
    Materials with a tile algebra (`tile_material`: SVK, Mooney-Rivlin, each
    + Kelvin-Voigt) are supported; callers fall back to the XLA path for
    others.
    """
    if tpd is None:
        tpd = prepare_tp(elems, dtype=dtype)
    Q, S, E_pad = tpd["Q"], tpd["S"], tpd["E_pad"]
    n_blocks = E_pad // EBLK
    mops = tile_material(material)

    primal_body = partial(
        _body, Q=Q, S=S, mops=mops, tangent=False, tmask=elems.trans_mask,
    )
    tangent_body = partial(
        _body, Q=Q, S=S, mops=mops, tangent=True, tmask=elems.trans_mask,
    )

    @jax.custom_jvp
    def contrib(pe_T):
        return _pallas_call(
            _wrap_body(primal_body), S * 3, n_blocks,
            [pe_T, tpd["gN_T"], tpd["dV_T"], tpd["Me_T"]],
            interpret=interpret,
        )

    @contrib.defjvp
    def contrib_jvp(primals, tangents):
        (pe_T,) = primals
        (dpe_T,) = tangents
        out = contrib(pe_T)
        both = jnp.concatenate(
            [
                dpe_T.reshape(S, 9, *pe_T.shape[1:]),
                pe_T.reshape(S, 9, *pe_T.shape[1:]),
            ],
            axis=1,
        ).reshape(S * 18, *pe_T.shape[1:])
        dout = _pallas_call(
            _wrap_body(tangent_body), S * 3, n_blocks,
            [both, tpd["gN_T"], tpd["dV_T"], tpd["Me_T"]],
            interpret=interpret,
        )
        return out, dout

    return contrib, tpd


def _primal_fe(
    pget, gn, dv_at, me_at, prep_write,
    *, Q, S, mops, tmask=None, mass=True,
):
    """Core of the primal contribution + Hv-prep pass: returns the per-slot
    output tiles fe[a][i] (INCLUDING the Me dv/dt mass term) and emits the
    per-QP primal cache through `prep_write(row, tile)`. Shared by the
    flat-layout kernel (`_primal_prep_body`) and the banded fused kernel.

    pget(a, c): packed [u|v|dv] channel tile (c in 0..8); the per-q prep row
    layout is the material's (`tile_material`; `mops.prep_rows` rows).
    """
    PR = mops.prep_rows
    damped = mops.damped
    fe = [[None] * 3 for _ in range(S)]
    # pe position channels carry displacements u = x - x_ref; centered.
    uc = _center(pget, S, tmask)
    vc = _center(lambda a, c: pget(a, 3 + c), S, tmask) if damped else None
    for q in range(Q):
        Du = _contract(uc, gn, q, S)
        Fd = _contract(vc, gn, q, S) if damped else None

        P = mops.primal(
            Du, Fd, put=lambda r, t, base=q * PR: prep_write(base + r, t)
        )

        w = dv_at(q)
        for a in range(S):
            for i in range(3):
                c = (P[i][0] * gn(q, a, 0) + P[i][1] * gn(q, a, 1) + P[i][2] * gn(q, a, 2)) * w
                fe[a][i] = c if fe[a][i] is None else fe[a][i] + c

    if mass:
        for a in range(S):
            for i in range(3):
                acc = fe[a][i]
                for b in range(S):
                    acc = acc + me_at(a, b) * pget(b, 6 + i)
                fe[a][i] = acc
    else:
        zero = pget(0, 0) * 0.0
        for a in range(S):
            for i in range(3):
                if fe[a][i] is None:  # all-zero padded chunk
                    fe[a][i] = zero
    return fe


def _primal_prep_body(
    pe_ref, gN_ref, dV_ref, Me_ref, out_ref, prep_ref,
    *, Q, S, mops, tmask=None,
):
    """Primal contribution + Hv precomputation in one pass (flat layout).

    Identical physics to `_body(tangent=False)`; additionally stores, per
    quadrature point, the material's primal cache (e.g. Du + total second
    Piola for SVK; Du, F^{-T}, invariants for Mooney-Rivlin) — everything
    the specialized Hv tangent kernel (`_hv_body`) needs, so CG iterations
    never recompute primal state.
    """

    def prep_write(row, tile):
        prep_ref[row] = tile

    fe = _primal_fe(
        lambda a, c: pe_ref[a * 9 + c],
        lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
        lambda q: dV_ref[q],
        lambda a, b: Me_ref[a * S + b],
        prep_write,
        Q=Q, S=S, mops=mops, tmask=tmask,
    )
    for a in range(S):
        for i in range(3):
            out_ref[a * 3 + i] = fe[a][i]


def _hv_fe(
    pget, prep_at, gn, dv_at, me_at, dt,
    *, Q, S, mops, tmask=None, mass=True,
):
    """Core of the specialized Hessian-vector product: returns the per-slot
    element output tiles fe[a][i] (INCLUDING the (1/dt) Me p mass term) from
    accessor callables, so both the flat-layout kernel (`_hv_body`) and the
    banded fused-gather/scatter kernel (`pallas_banded`) share one algebra.

    pget(a, c): gathered direction tile; prep_at(row): per-QP primal cache
    row (material-defined layout, see `tile_material`); gn(q, a, j) /
    dv_at(q) / me_at(a, b): static element data tiles.
    """
    inv_dt = 1.0 / dt
    PR = mops.prep_rows

    fe = [[None] * 3 for _ in range(S)]
    pc = _center(pget, S, tmask)  # CG directions center exactly too
    for q in range(Q):
        G = _contract(pc, gn, q, S)
        dP = mops.hv(G, lambda r, base=q * PR: prep_at(base + r), dt)

        w = dv_at(q)
        for a in range(S):
            for i in range(3):
                c = (dP[i][0] * gn(q, a, 0) + dP[i][1] * gn(q, a, 1) + dP[i][2] * gn(q, a, 2)) * w
                fe[a][i] = c if fe[a][i] is None else fe[a][i] + c

    if mass:
        for a in range(S):
            for i in range(3):
                acc = None
                for b in range(S):
                    t = me_at(a, b) * pget(b, i)
                    acc = t if acc is None else acc + t
                fe[a][i] = fe[a][i] + inv_dt * acc
    return fe


def _hv_body(
    dt_ref, pT_ref, prep_ref, gN_ref, dV_ref, Me_ref, out_ref,
    *, Q, S, mops, tmask=None,
):
    """Specialized Hessian-vector product element kernel (flat layout).

    Directional derivative of the ALM element contribution along velocity
    direction p, using the chain dx = dt p, dv = p, d(dv/dt) = p/dt:

        dF    = dt G,  G = sum_a p_a (x) gradN_a
        dE    = dt sym2(G, Du),  sym2(G, D) = (G + G^T + G^T D + D^T G)/2
        dEdot = sym2(G, Du) + dt (Fd^T G + G^T Fd)/2
        dS    = lam tr(dE) I + 2 mu dE + lam_d tr(dEdot) I + 2 eta dEdot
        dP    = dt G S0 + (I + Du) dS
        out_a = sum_q dP gradN_qa dV_q + (1/dt) Me p

    Exactly the linearization `mops.tangent` computes (shown above for SVK),
    but with the primal state read from the prep buffer instead of
    recomputed per CG iteration, and only ONE gradient contraction (G)
    instead of four.
    Inputs: dt (1,1) SMEM scalar; pT (S*3 rows) the gathered raw direction.
    """
    dt = dt_ref[0, 0]
    fe = _hv_fe(
        lambda a, c: pT_ref[a * 3 + c],
        lambda row: prep_ref[row],
        lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
        lambda q: dV_ref[q],
        lambda a, b: Me_ref[a * S + b],
        dt,
        Q=Q, S=S, mops=mops, tmask=tmask,
    )
    for a in range(S):
        for i in range(3):
            out_ref[a * 3 + i] = fe[a][i]


def qp_chunks(Q, S, prep_rows, vmem_cap=4 * 1024 * 1024):
    """(NC, Qc): split the QP axis into NC chunks of Qc quadrature points so
    the per-grid-step static tables (gN chunk, dominated by Qc*S*3 rows)
    stay within `vmem_cap` double-buffered. NC == 1 for light elements
    (FEAT10: Q=5) — the unchunked kernels are byte-identical. Heavy
    elements (ANCF3443: Q=48, S=16 -> gN 9.4 MB/block) get NC > 1: without
    chunking the Mosaic compile blows the ~16 MB scoped-VMEM budget (the
    tpu_compile_helper crash at the 5k-element shell bench scale)."""
    row_bytes = SUB * LANE * 4 * 2  # double-buffered f32 rows
    rows_per_qp = S * 3 + 1 + prep_rows
    if rows_per_qp * Q * row_bytes <= 2 * vmem_cap:
        return 1, Q  # unchunked kernels fit (FEAT10, ANCF3243)
    qc = max(1, min(Q, vmem_cap // (row_bytes * rows_per_qp)))
    nc = -(-Q // qc)
    return nc, -(-Q // nc)


def _pad_q_rows(a, rows_per_q, Q, Q_pad):
    """Pad a Q-major (Q*rows_per_q, B, L) table to Q_pad QPs with zeros
    (zero dV -> padded QPs contribute exactly zero)."""
    if Q_pad == Q:
        return a
    return jnp.pad(a, ((0, (Q_pad - Q) * rows_per_q), (0, 0), (0, 0)))


def _primal_prep_chunked_body(pe_ref, gN_ref, dV_ref, Me_ref, out_ref,
                              prep_ref, *, Qc, S, mops, tmask=None):
    """QP-chunked `_primal_prep_body`: grid (blocks, chunks), out revisited
    across the minor chunk axis (zero-init on chunk 0; consistent-mass term
    added once there). Padded QPs carry zero gN/dV: Du = 0 -> F = I -> a
    well-defined rest-state prep row and a zero-weighted contribution."""
    qc = pl.program_id(1)

    @pl.when(qc == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    fe = _primal_fe(
        lambda a, c: pe_ref[a * 9 + c],
        lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
        lambda q: dV_ref[q],
        lambda a, b: Me_ref[a * S + b],
        lambda row, tile: prep_ref.__setitem__(row, tile),
        Q=Qc, S=S, mops=mops, tmask=tmask, mass=False,
    )
    for a in range(S):
        for i in range(3):
            out_ref[a * 3 + i] += fe[a][i]

    @pl.when(qc == 0)
    def _():
        # Consistent-mass dv term, q-independent: added exactly once.
        for a in range(S):
            for i in range(3):
                acc = None
                for b in range(S):
                    t = Me_ref[a * S + b] * pe_ref[b * 9 + 6 + i]
                    acc = t if acc is None else acc + t
                out_ref[a * 3 + i] += acc


def _hv_chunked_body(dt_ref, pT_ref, prep_ref, gN_ref, dV_ref, Me_ref,
                     out_ref, *, Qc, S, mops, tmask=None):
    """QP-chunked `_hv_body` (same revisit-accumulation contract)."""
    qc = pl.program_id(1)
    dt = dt_ref[0, 0]

    @pl.when(qc == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    fe = _hv_fe(
        lambda a, c: pT_ref[a * 3 + c],
        lambda row: prep_ref[row],
        lambda q, a, j: gN_ref[(q * S + a) * 3 + j],
        lambda q: dV_ref[q],
        lambda a, b: Me_ref[a * S + b],
        dt,
        Q=Qc, S=S, mops=mops, tmask=tmask, mass=False,
    )
    for a in range(S):
        for i in range(3):
            out_ref[a * 3 + i] += fe[a][i]

    @pl.when(qc == 0)
    def _():
        inv_dt = 1.0 / dt
        for a in range(S):
            for i in range(3):
                acc = None
                for b in range(S):
                    t = Me_ref[a * S + b] * pT_ref[b * 3 + i]
                    acc = t if acc is None else acc + t
                out_ref[a * 3 + i] += inv_dt * acc


def make_hv_kernels(elems, material, dtype=np.float32, interpret=False, tpd=None):
    """Build (primal_prep_fn, hv_fn, n_prep_rows) for the specialized
    Newton-PCG Hessian-vector path (any `tile_material`, + Kelvin-Voigt).

    primal_prep_fn(pe_T (S*9, B, L)) -> (out_T (S*3, B, L), prep_T (PR, B, L))
    hv_fn(dt (1,1), p_T (S*3, B, L), prep_T) -> dout_T (S*3, B, L)

    Heavy elements (large Q*S, e.g. the 48-QP ANCF3443 shell) run a
    QP-chunked grid (blocks, chunks) so the static gN chunk fits VMEM; see
    `qp_chunks`. PR returned is the PADDED prep row count.
    """
    if tpd is None:
        tpd = prepare_tp(elems, dtype=dtype)
    Q, S, E_pad = tpd["Q"], tpd["S"], tpd["E_pad"]
    n_blocks = E_pad // EBLK
    mops = tile_material(material)
    NC, Qc = qp_chunks(Q, S, mops.prep_rows)
    Q_pad = NC * Qc
    PR = Q_pad * mops.prep_rows
    PRc = Qc * mops.prep_rows

    if NC == 1:
        pp_body = partial(
            _primal_prep_body, Q=Q, S=S, mops=mops, tmask=elems.trans_mask,
        )
        hv_body = partial(
            _hv_body, Q=Q, S=S, mops=mops, tmask=elems.trans_mask,
        )

        def primal_prep_fn(pe_T):
            B = pe_T.shape[1]
            outs = [
                jax.ShapeDtypeStruct((S * 3, B, LANE), pe_T.dtype),
                jax.ShapeDtypeStruct((PR, B, LANE), pe_T.dtype),
            ]
            ins = [pe_T, tpd["gN_T"], tpd["dV_T"], tpd["Me_T"]]
            in_specs = [
                pl.BlockSpec((a.shape[0], SUB, LANE), lambda b, r=a.shape[0]: (0, b, 0))
                for a in ins
            ]
            out_specs = [
                pl.BlockSpec((S * 3, SUB, LANE), lambda b: (0, b, 0)),
                pl.BlockSpec((PR, SUB, LANE), lambda b: (0, b, 0)),
            ]
            return pl.pallas_call(
                lambda *refs: pp_body(*refs),
                grid=(n_blocks,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=outs,
                interpret=interpret,
            )(*ins)

        def hv_fn(dt_arr, p_T, prep_T):
            B = p_T.shape[1]
            ins = [dt_arr, p_T, prep_T, tpd["gN_T"], tpd["dV_T"], tpd["Me_T"]]
            in_specs = [
                pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
            ] + [
                pl.BlockSpec((a.shape[0], SUB, LANE), lambda b, r=a.shape[0]: (0, b, 0))
                for a in ins[1:]
            ]
            return pl.pallas_call(
                lambda *refs: hv_body(*refs),
                grid=(n_blocks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((S * 3, SUB, LANE), lambda b: (0, b, 0)),
                out_shape=jax.ShapeDtypeStruct((S * 3, B, LANE), p_T.dtype),
                interpret=interpret,
            )(*ins)

        return primal_prep_fn, hv_fn, PR

    # ---- QP-chunked variants (grid = (blocks, chunks)) -------------------
    gN_c = _pad_q_rows(tpd["gN_T"], S * 3, Q, Q_pad)
    dV_c = _pad_q_rows(tpd["dV_T"], 1, Q, Q_pad)
    pp_body = partial(
        _primal_prep_chunked_body, Qc=Qc, S=S, mops=mops,
        tmask=elems.trans_mask,
    )
    hv_body = partial(
        _hv_chunked_body, Qc=Qc, S=S, mops=mops, tmask=elems.trans_mask,
    )

    def primal_prep_fn(pe_T):
        B = pe_T.shape[1]
        outs = [
            jax.ShapeDtypeStruct((S * 3, B, LANE), pe_T.dtype),
            jax.ShapeDtypeStruct((PR, B, LANE), pe_T.dtype),
        ]
        ins = [pe_T, gN_c, dV_c, tpd["Me_T"]]
        in_specs = [
            pl.BlockSpec((S * 9, SUB, LANE), lambda b, q: (0, b, 0)),
            pl.BlockSpec((Qc * S * 3, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((Qc, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((S * S, SUB, LANE), lambda b, q: (0, b, 0)),
        ]
        out_specs = [
            pl.BlockSpec((S * 3, SUB, LANE), lambda b, q: (0, b, 0)),
            pl.BlockSpec((PRc, SUB, LANE), lambda b, q: (q, b, 0)),
        ]
        return pl.pallas_call(
            lambda *refs: pp_body(*refs),
            grid=(n_blocks, NC),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs,
            interpret=interpret,
        )(*ins)

    def hv_fn(dt_arr, p_T, prep_T):
        B = p_T.shape[1]
        ins = [dt_arr, p_T, prep_T, gN_c, dV_c, tpd["Me_T"]]
        in_specs = [
            pl.BlockSpec((1, 1), lambda b, q: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S * 3, SUB, LANE), lambda b, q: (0, b, 0)),
            pl.BlockSpec((PRc, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((Qc * S * 3, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((Qc, SUB, LANE), lambda b, q: (q, b, 0)),
            pl.BlockSpec((S * S, SUB, LANE), lambda b, q: (0, b, 0)),
        ]
        return pl.pallas_call(
            lambda *refs: hv_body(*refs),
            grid=(n_blocks, NC),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((S * 3, SUB, LANE), lambda b, q: (0, b, 0)),
            out_shape=jax.ShapeDtypeStruct((S * 3, B, LANE), p_T.dtype),
            interpret=interpret,
        )(*ins)

    return primal_prep_fn, hv_fn, PR


def _to_tiles(mat, E, E_pad):
    """(rows, E) -> (rows, E_pad//LANE, LANE) zero-padded tile layout."""
    return jnp.pad(mat, ((0, 0), (0, E_pad - E))).reshape(
        mat.shape[0], E_pad // LANE, LANE
    )


def g_and_hvp(v, x_prev, v_prev, lam_dual, f_ext, dt, rho, system, u_prev=None):
    """ALM gradient + linear Hessian-vector operator via the specialized
    Pallas kernels: the primal pass stores per-QP (Du, S0, Fd) so each CG
    Hv costs ONE (E,S,3) gather + one tangent kernel + one scatter — no
    primal recompute, no tangent/primal concat (the round-1 custom-jvp path
    gathered 9 channels and re-derived F, Fdot per iteration).

    FixedCoefs / DensePins / LinearConstraints (or no) constraints; matches
    `grad_L` exactly. LinearConstraints (the reference's general CSR rows,
    `SyncedNewton.cu:556-801`) apply J^T(lam + rho c) to the gradient and
    dt^2 rho J^T J to the Hv through their static COO gathers — constant
    index arrays, so the CG critical path stays a single kernel + sparse
    axpy-scale work.
    """
    from tlfea.constraints import DensePins, FixedCoefs, LinearConstraints
    from tlfea.elements.assembly import node_ref

    elems = system.elems
    tpd = system.pallas
    S, E, E_pad = tpd.S, tpd.E, tpd.E_pad
    n = x_prev.shape[0]
    cons = system.constraints
    x_ref = node_ref(elems)
    if u_prev is None:
        u_prev = x_prev - x_ref
    dtype = v.dtype
    # Pallas kernels run in the working dtype (accuracy mode's wide u is an
    # XLA-path feature).
    u = (u_prev + dt * v).astype(dtype)

    packed = jnp.concatenate([u, v, (v - v_prev) / dt], axis=1)  # (n, 9)
    pe = packed[elems.conn]  # (E, S, 9)
    peT = _to_tiles(jnp.transpose(pe, (1, 2, 0)).reshape(S * 9, E), E, E_pad)
    outT, prepT = tpd.prep_fn(peT)
    out = outT.reshape(S, 3, E_pad)[:, :, :E]
    contrib_e = jnp.transpose(out, (2, 0, 1))  # (E, S, 3)
    idx = elems.conn.reshape(-1)
    vals = contrib_e.reshape(-1, 3)
    if isinstance(cons, FixedCoefs):
        c = cons.eval_c_u(u, x_ref)
        idx = jnp.concatenate([idx, cons.idx])
        vals = jnp.concatenate([vals, dt * (lam_dual + rho * c)], axis=0)
    # Wide accumulation for BOTH the residual and Hv scatters when requested
    # (System.accum_dtype): the Newton fixed point stalls at the noisier of
    # the two, so they must match.
    acc = jnp.dtype(system.accum_dtype) if system.accum_dtype else dtype
    g = (
        jnp.zeros((n, 3), dtype=acc).at[idx].add(vals.astype(acc))
        - f_ext.astype(acc)
    ).astype(dtype)
    pin_lin = None
    lin_fn = None  # callable Hv constraint term (general linear rows)
    if isinstance(cons, DensePins):
        # Dense pin algebra (no scatter): gradient dt*mask*(lam + rho c),
        # Hv dt^2 rho mask * p.
        c = cons.eval_c_u(u, x_ref)
        g = g + dt * cons.mask.astype(dtype) * (lam_dual.astype(dtype) + rho * c)
        pin_lin = (dt * dt * rho) * cons.mask.astype(dtype)
    elif isinstance(cons, LinearConstraints):
        c = cons.eval_c_u(u, x_ref).astype(dtype)
        g = g + dt * cons.apply_jt(
            (lam_dual.astype(dtype) + rho * c), n
        )

        def lin_fn(p, cons=cons, n=n):
            return (dt * dt * rho) * cons.apply_jt(cons._apply_j(p), n)

    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)

    def hvp(p):
        pT = _to_tiles(
            jnp.transpose(p[elems.conn], (1, 2, 0)).reshape(S * 3, E), E, E_pad
        )
        doutT = tpd.hv_fn(dt_arr, pT, prepT)
        dout = doutT.reshape(S, 3, E_pad)[:, :, :E]
        dvals = jnp.transpose(dout, (2, 0, 1)).reshape(-1, 3)
        didx = elems.conn.reshape(-1)
        if isinstance(cons, FixedCoefs):
            didx = jnp.concatenate([didx, cons.idx])
            dvals = jnp.concatenate(
                [dvals, (dt * dt * rho) * p[cons.idx]], axis=0
            )
        out = (
            jnp.zeros((n, 3), dtype=acc).at[didx].add(dvals.astype(acc))
        ).astype(dtype)
        if pin_lin is not None:
            out = out + pin_lin * p
        if lin_fn is not None:
            out = out + lin_fn(p)
        return out

    return g, hvp


class PallasContrib:
    """Static handle bundling the custom-jvp kernel with its layout metadata.

    Hashable by identity so it can live on `System` as a non-pytree field;
    build once per system (e.g. via `with_pallas`).
    """

    def __init__(self, fn, S: int, E: int, E_pad: int, precond_fn=None,
                 prep_fn=None, hv_fn=None, banded=None):
        self.fn = fn
        self.S = S
        self.E = E
        self.E_pad = E_pad
        self.precond_fn = precond_fn
        self.prep_fn = prep_fn  # primal contribution + per-QP Hv prep
        self.hv_fn = hv_fn  # specialized tangent kernel
        self.banded = banded  # pallas_banded.BandedHandle or None

    def __getitem__(self, key):  # dict-compat for tpd-style access
        return getattr(self, key if key != "E_pad" else "E_pad")


def with_pallas(system, dtype=np.float32, interpret=False, banded=False,
                banded_hv_dtype=None):
    """Return a copy of `system` that routes its residual through the Pallas
    element kernel (materials with a tile algebra: SVK, Mooney-Rivlin).

    banded: "auto" additionally builds the banded fused gather/kernel/scatter
    Hv + primal kernels (`tlfea.ops.pallas_banded`) when the mesh's node
    numbering is banded enough (window fits VMEM); True forces it (raises if
    infeasible); False (default) skips it. The Newton solver prefers the
    banded path when present (one kernel per Hessian-vector product — no XLA
    gather/scatter/transpose ops on the CG critical path). Opt-in because
    the in-kernel gather/scatter loops are prohibitively slow under
    interpret mode (CPU tests); production TPU entry points enable it.
    """
    from tlfea.materials import SVK

    tile_material(system.material)  # raises ValueError if unsupported
    if banded:
        # Pre-sort elements by min node so the banded kernels can SHARE the
        # canonical static tables below (element order is semantically
        # irrelevant; a second table copy is ~100 MB of closure constants
        # at 100k elems and overflows the remote-compile request).
        from tlfea.ops import pallas_banded

        system = system.replace(elems=pallas_banded.sort_elements(system.elems))
    # One shared static-array dict: the element tables (grad_N, dV, Me) are
    # closure constants inside the jitted kernels, and every copy rides the
    # remote-compile request (the axon tunnel rejects bodies past a few
    # hundred MB — ~100 MB per copy at 100k elems).
    tpd = prepare_tp(system.elems, dtype=dtype)
    contrib, _ = make_element_contrib(
        system.elems, system.material, dtype=dtype, interpret=interpret, tpd=tpd
    )
    # The closed-form diag-block preconditioner kernel is SVK-specific;
    # other materials use the XLA `tangent_diag_block` fallback in
    # `solvers.common.precond_blocks` (built once per Newton step, so the
    # XLA path is off the CG critical path).
    pfn = None
    if isinstance(system.material, SVK):
        pfn, _ = make_precond_blocks(
            system.elems, system.material, dtype=dtype, interpret=interpret,
            tpd=tpd,
        )
    prep_fn, hv_fn, _ = make_hv_kernels(
        system.elems, system.material, dtype=dtype, interpret=interpret, tpd=tpd
    )
    bnd = None
    if banded:
        try:
            bnd = pallas_banded.build_banded(
                system.elems, system.material, dtype=dtype,
                interpret=interpret, hv_dtype=banded_hv_dtype,
            )
        except pallas_banded.NotBandedError:
            if banded is True:
                raise
    handle = PallasContrib(
        contrib, tpd["S"], tpd["E"], tpd["E_pad"], precond_fn=pfn,
        prep_fn=prep_fn, hv_fn=hv_fn, banded=bnd,
    )
    return system.replace(pallas=handle)


def residual_contributions(u, v, dv_dt, elems, contrib, tpd, extra_idx=None, extra_vals=None, accum_dtype=None):
    """Full fused residual using the Pallas kernel: gather -> transpose ->
    kernel -> transpose -> scatter. Drop-in equal to
    `assembly.alm_residual_contributions` for SVK materials.

    u: node-level displacements (x - x_ref; see ElementBatch.x_ref).
    extra_idx/extra_vals: optional additional (C,) indices / (C, 3) values
    folded into the single scatter-add (used for pin-constraint forces so a
    gradient costs exactly one gather + one scatter)."""
    S, E, E_pad = (
        (tpd["S"], tpd["E"], tpd["E_pad"])
        if isinstance(tpd, dict)
        else (tpd.S, tpd.E, tpd.E_pad)
    )
    n = u.shape[0]
    packed = jnp.concatenate([u, v, dv_dt], axis=1)  # (n, 9)
    pe = packed[elems.conn]  # (E, S, 9)
    peT = jnp.transpose(pe, (1, 2, 0)).reshape(S * 9, E)
    peT = jnp.pad(peT, ((0, 0), (0, E_pad - E)))
    peT = peT.reshape(S * 9, E_pad // LANE, LANE)
    outT = contrib(peT)  # (S*3, E_pad//LANE, LANE)
    out = outT.reshape(S, 3, E_pad)[:, :, :E]  # (S, 3, E)
    contrib_e = jnp.transpose(out, (2, 0, 1))  # (E, S, 3)
    idx = elems.conn.reshape(-1)
    vals = contrib_e.reshape(-1, 3)
    if extra_idx is not None:
        idx = jnp.concatenate([idx, extra_idx])
        vals = jnp.concatenate([vals, extra_vals], axis=0)
    # Optional wide accumulation: at high stiffness the per-slot forces are
    # ~1e5x the net nodal value, so an f32 scatter floors the residual at
    # ~1% of the load (see System.accum_dtype). The downcast of the SMALL
    # net result is harmless.
    acc = jnp.dtype(accum_dtype) if accum_dtype else u.dtype
    res = jnp.zeros((n, 3), dtype=acc)
    return res.at[idx].add(vals.astype(acc)).astype(u.dtype)
