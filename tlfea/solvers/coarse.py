"""Two-level (aggregation) preconditioner for Newton-PCG.

Block-Jacobi handles the high-frequency end of the spectrum; for stiff or
slender structures the low-frequency (long-wavelength) modes dominate
kappa and CG stalls (observed: CG hitting its cap on slender-beam problems).
This adds a coarse correction in the classic additive two-level form

    z = B_jacobi(r) + R A_c^{-1} R^T r,

with piecewise-constant prolongation R over spatial node aggregates and the
exact Galerkin coarse operator A_c = R^T H R assembled from per-element
tangent/mass blocks (SVK closed form, reference `SVK.cuh:35-55` generalized
to off-diagonal node pairs) and Cholesky-factorized on device once per inner
solve. The coarse apply per CG iteration is one segment-sum, one small dense
triangular solve pair, and one gather.

The reference has no analog (its Newton uses a direct factorization); this
is the TPU-native answer to the same robustness need.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tlfea.elements.assembly import ElementBatch, deformation_gradient

__all__ = ["CoarseSetup", "build_aggregates", "coarse_operator", "make_two_level_precond"]


@struct.dataclass
class CoarseSetup:
    agg: jnp.ndarray  # (n_coef,) int32 cluster id
    n_agg: int = struct.field(pytree_node=False)


def build_aggregates(x_ref: np.ndarray, target_cluster: int = 48) -> CoarseSetup:
    """Spatial-grid aggregation of coefficients into ~target_cluster-size
    clusters (host, NumPy)."""
    x_ref = np.asarray(x_ref, dtype=np.float64)
    n = x_ref.shape[0]
    n_agg_target = max(1, n // target_cluster)
    lo = x_ref.min(axis=0)
    ext = np.maximum(x_ref.max(axis=0) - lo, 1e-12)
    # Grid resolution ~ cube root of target cluster count, scaled per axis by
    # extent so cells are roughly isotropic.
    rel = ext / ext.max()
    k = (n_agg_target / max(rel.prod(), 1e-12)) ** (1.0 / 3.0)
    dims = np.maximum(1, np.round(k * rel)).astype(int)
    cell = np.minimum(
        ((x_ref - lo) / (ext / dims)).astype(int), dims - 1
    )
    keys = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    uniq, agg = np.unique(keys, return_inverse=True)
    return CoarseSetup(agg=jnp.asarray(agg.astype(np.int32)), n_agg=int(len(uniq)))


def _svk_pair_blocks(F, grad_N, dV, lam, mu, dt):
    """Full per-element tangent blocks K[e, a, b, 3, 3] = sum_q dt dV
    svk_tangent(F_q; h_a, h_b) (reference `svk_compute_tangent_block`,
    `SVK.cuh:35-55`, for all (a, b) node pairs)."""
    Fh = jnp.einsum("eqij,eqaj->eqai", F, grad_N)  # (E,Q,S,3)
    hij = jnp.einsum("eqaj,eqbj->eqab", grad_N, grad_N)
    FhFh = jnp.einsum("eqai,eqbi->eqab", Fh, Fh)  # Fh_b . Fh_a
    trE = 0.5 * (jnp.sum(F * F, axis=(-2, -1)) - 3.0)  # (E,Q)
    FFT = jnp.einsum("eqik,eqjk->eqij", F, F)
    eye = jnp.eye(3, dtype=F.dtype)
    w = dt * dV  # (E,Q)

    # Each term contracts the QP axis inside the einsum, so the only
    # (E,S,S,3,3) array is the accumulated output. ('x' = element axis;
    # 'd','c' = the 3x3 block indices.)
    K = lam * jnp.einsum("xq,xqad,xqbc->xabdc", w, Fh, Fh)
    K = K + mu * jnp.einsum("xq,xqbd,xqac->xabdc", w, Fh, Fh)
    K = K + mu * jnp.einsum("xq,xqab,xqdc->xabdc", w, hij, FFT)
    # Kronecker-delta terms combined: [(lam trE - mu) h_ab + mu FhFh] delta.
    scal = jnp.einsum("xq,xqab->xab", w * (lam * trE - mu), hij)
    scal = scal + mu * jnp.einsum("xq,xqab->xab", w, FhFh)
    K = K + scal[..., None, None] * eye
    return K  # (E, S, S, 3, 3)


def coarse_operator(x, elems: ElementBatch, material, cons, setup: CoarseSetup, dt, rho):
    """Assemble A_c = R^T H R -> (n_agg, 3, n_agg, 3) dense."""
    F = deformation_gradient(x, elems)
    Kb = _svk_pair_blocks(F, elems.grad_N, elems.dV, material.lam, material.mu, dt)
    # Mass blocks: (M/h)_ab = mass_elem/dt on the diagonal of the 3x3.
    eye = jnp.eye(3, dtype=x.dtype)
    Mb = (elems.mass_elem / dt)[..., None, None] * eye  # (E,S,S,3,3)
    Hb = Kb + Mb

    agg = setup.agg
    ca = agg[elems.conn]  # (E, S)
    E, S = ca.shape
    na = setup.n_agg
    rows = jnp.repeat(ca, S, axis=1).reshape(-1)  # (E*S*S,)
    cols = jnp.tile(ca, (1, S)).reshape(-1)
    vals = Hb.reshape(-1, 3, 3)
    A = jnp.zeros((na, na, 3, 3), dtype=x.dtype)
    A = A.at[rows, cols].add(vals)

    if cons is not None and hasattr(cons, "idx"):
        pen = jnp.zeros((na,), dtype=x.dtype).at[agg[cons.idx]].add(dt * dt * rho)
        A = A.at[jnp.arange(na), jnp.arange(na)].add(pen[:, None, None] * eye)

    Ad = jnp.transpose(A, (0, 2, 1, 3)).reshape(3 * na, 3 * na)
    # Regularize: coarse correction need not be exact, must be SPD.
    diag_scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(Ad))), 1e-30)
    Ad = 0.5 * (Ad + Ad.T) + (1e-6 * diag_scale) * jnp.eye(3 * na, dtype=x.dtype)
    return Ad


def make_two_level_precond(blocks, chol, setup: CoarseSetup):
    """Additive two-level preconditioner apply: r -> B_j r + R A_c^{-1} R^T r.

    blocks: (n_coef, 3, 3) SPD block-Jacobi blocks; chol: Cholesky factor of
    the dense coarse operator.
    """
    from tlfea.ops.linalg import solve3x3

    agg = setup.agg
    na = setup.n_agg

    def apply(r):
        z = solve3x3(blocks, r, eps=1e-30)
        rc = jnp.zeros((na, 3), dtype=r.dtype).at[agg].add(r)  # R^T r
        zc = jax.scipy.linalg.cho_solve((chol, True), rc.reshape(-1))
        return z + zc.reshape(na, 3)[agg]  # + R zc

    return apply
