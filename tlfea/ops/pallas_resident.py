"""Single-kernel resident Newton-PCG inner solve for single-block meshes.

The reference runs its first-order solvers as ONE persistent cooperative
CUDA kernel with `grid.sync()` between phases (`SyncedNesterov.cu:95-379`,
SURVEY P5) because kernel-launch latency would otherwise dominate small
problems. The TPU analogue of that cost is per-op issue latency inside the
jitted while nest: at the 1k bench scale (864 elems) a device trace
measured the step ~85% IDLE — ~200 small XLA ops at ~5 us issue cost each,
with the Hv kernel itself only 6.75 us (benchmarks/profile_trace_100k.py,
TLFEA_SCALE=1k). No amount of kernel speed fixes that; the op COUNT must
collapse.

This module is the TPU-native cooperative kernel: for meshes whose banded
build produced a SINGLE element block and a SINGLE node window (~<= 1024
elements, n <= W nodes — everything resident in VMEM), the ENTIRE inner
Newton solve (per-iteration primal gradient, Eisenstat-Walker forcing,
block-Jacobi PCG with the negative-curvature guard, residual-norm
backtracking, convergence control) runs inside ONE `pallas_call`. Per
step the XLA graph then issues ~one op instead of ~200.

Semantics: bit-for-bit the same math as `newton._newton_inner` on the
banded path with `coarse=None` (same `_primal_fe`/`_hv_fe` algebra cores,
same CG recurrences and guards, same EW formulas). The coarse-space
correction is intentionally NOT supported — at this scale extra CG
iterations cost ~8 us each in-kernel, cheaper than the coarse apply's own
op chain (measured: 1k step time identical at CG 10-with-coarse vs
22-without).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tlfea.ops.pallas_fem import PALLAS_OK, SUB, _hv_fe, _primal_fe
from tlfea.ops.pallas_banded import (
    ROW, _store_fe, _window_gather, _window_scatter, to_windows,
)

if PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["eligible", "newton_inner_resident"]


def eligible(bnd, cons_dense_ok: bool, coarse) -> bool:
    """Resident-kernel gate: single element block, single node window
    (carry half never written -> whole state fits VMEM), dense-expressible
    constraints, no coarse correction."""
    return (
        bnd is not None
        and getattr(bnd, "n_blocks", 0) == 1
        and getattr(bnd, "n_wins", 0) == 1
        and getattr(bnd, "mesh", None) is None  # not the sharded handle
        and cons_dense_ok
        and coarse is None
    )


def _kernel(
    wb_r, first_r, r0_r, fid_r, ranges_r,
    scal_ref, vwin_ref, upwin_ref, vpwin_ref, fwin_ref, pawin_ref,
    plwin_ref, ibwin_ref, inv_ref, *rest,
    Q, S, mops, tmask, K, RT, WR2, I_cap, P_comb, PR,
    max_inner, cg_max, ls_max, interp,
):
    if P_comb:
        (comb_ref, cl_ref, gN_ref, dV_ref, Me_ref,
         vout_ref, fstat_ref, istat_ref,
         win9_ref, pwin_ref, owin_ref, prep_ref, fes_ref) = rest
    else:
        comb_ref = None
        (cl_ref, gN_ref, dV_ref, Me_ref,
         vout_ref, fstat_ref, istat_ref,
         win9_ref, pwin_ref, owin_ref, prep_ref, fes_ref) = rest

    dtype = vwin_ref.dtype
    b = 0
    dt = scal_ref[0]
    inner_atol = scal_ref[1]
    cg_rtol = scal_ref[2]
    ew_eta_max = scal_ref[3]
    inner_rtol = scal_ref[4]
    tiny = jnp.asarray(np.finfo(np.float32 if dtype == jnp.float32 else np.float64).tiny, dtype)
    eps_floor = jnp.asarray(
        1e-30 if dtype == jnp.float64 else 1e-18, dtype)

    up = upwin_ref[0]          # (3*WR2, ROW) u_prev channels
    vp = vpwin_ref[0]
    fx = fwin_ref[0]
    pa = pawin_ref[0]
    plv = plwin_ref[0]         # (WR2, ROW) pin_lin
    pl3 = jnp.concatenate([plv, plv, plv], axis=0)
    ib = ibwin_ref[0]          # (9*WR2, ROW) inv_blocks channels (row-major ij)

    def dot(a, c):
        return jnp.sum(a * c)

    def bj(r):
        # z_i = sum_j inv_blocks[i, j] * r_j  (padding rows are zero blocks)
        zs = []
        for i in range(3):
            acc = None
            for j in range(3):
                t = ib[(3 * i + j) * WR2:(3 * i + j + 1) * WR2] \
                    * r[j * WR2:(j + 1) * WR2]
                acc = t if acc is None else acc + t
            zs.append(acc)
        return jnp.concatenate(zs, axis=0)

    def scatter_into_owin():
        owin_ref[...] = jnp.zeros(owin_ref.shape, dtype)
        _window_scatter(b, owin_ref, fes_ref, inv_ref, fid_r, ranges_r,
                        S, RT, WR2, I_cap, dtype,
                        comb_ref=comb_ref, P_comb=P_comb)

    def grad(v):
        """Exact `g_and_hvp_banded` gradient (primal kernel + dense pin
        fold - f_ext); also refreshes the Hv prep cache in `prep_ref`."""
        u = up + dt * v
        win9_ref[0, 0:3 * WR2, :] = u
        win9_ref[0, 3 * WR2:6 * WR2, :] = v
        win9_ref[0, 6 * WR2:9 * WR2, :] = (v - vp) / dt
        pu = _window_gather(b, win9_ref, cl_ref, r0_r, S, 9, K, WR2, dtype,
                            interp=interp)

        def prep_write(row, tile):
            prep_ref[0, pl.ds(row * SUB, SUB), :] = tile.astype(prep_ref.dtype)

        fe = _primal_fe(
            lambda a, c: pu[a][c],
            lambda q, a, j: gN_ref[0, pl.ds(((q * S + a) * 3 + j) * SUB, SUB), :],
            lambda q: dV_ref[0, pl.ds(q * SUB, SUB), :],
            lambda a, bb: Me_ref[0, pl.ds((a * S + bb) * SUB, SUB), :],
            prep_write,
            Q=Q, S=S, mops=mops, tmask=tmask,
        )
        _store_fe(fes_ref, fe, S)
        scatter_into_owin()
        return owin_ref[0] + pa + pl3 * u - fx

    def hvp(p):
        pwin_ref[0, :, :] = p
        pg = _window_gather(b, pwin_ref, cl_ref, r0_r, S, 3, K, WR2, dtype,
                            interp=interp)
        fe = _hv_fe(
            lambda a, c: pg[a][c],
            lambda row: prep_ref[0, pl.ds(row * SUB, SUB), :],
            lambda q, a, j: gN_ref[0, pl.ds(((q * S + a) * 3 + j) * SUB, SUB), :],
            lambda q: dV_ref[0, pl.ds(q * SUB, SUB), :],
            lambda a, bb: Me_ref[0, pl.ds((a * S + bb) * SUB, SUB), :],
            dt,
            Q=Q, S=S, mops=mops, tmask=tmask,
        )
        _store_fe(fes_ref, fe, S)
        scatter_into_owin()
        return owin_ref[0] + dt * pl3 * p

    def pcg(bvec, eta):
        """`newton._pcg` verbatim on window values (block-Jacobi precond)."""
        x0 = jnp.zeros_like(bvec)
        r0v = bvec
        z0 = bj(r0v)
        rz0 = dot(r0v, z0)
        bnorm = jnp.sqrt(dot(bvec, bvec))
        tol2 = (eta * bnorm) ** 2
        tol2 = jnp.maximum(tol2, eps_floor * jnp.maximum(bnorm, 1.0) ** 2)

        def cond(c):
            _, r, _, _, rz, k, _ = c
            ok = jnp.logical_and(dot(r, r) > tol2, rz > 0)
            return jnp.logical_and(k < cg_max, ok)

        def body(c):
            x, r, p, z, rz, k, neg = c
            hp = hvp(p)
            denom = dot(p, hp)
            good = denom > 0
            alpha = jnp.where(good, rz / jnp.where(good, denom, 1.0), 0.0)
            neg = jnp.logical_or(neg, jnp.logical_not(good))
            x = x + alpha * p
            r = r - alpha * hp
            z = bj(r)
            rz_new = jnp.where(good, dot(r, z), 0.0)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z + beta * p
            return (x, r, p, z, rz_new, k + 1, neg)

        x, _, _, _, _, k, neg = jax.lax.while_loop(
            cond, body,
            (x0, r0v, z0, z0, rz0, jnp.asarray(0, jnp.int32),
             jnp.asarray(False)),
        )
        return x, k, neg

    def newton_cond(c):
        _, k, done, *_ = c
        return jnp.logical_and(k < max_inner, jnp.logical_not(done))

    def newton_body(c):
        v, k, done, ng, ng0, ngp, cgt = c
        g = grad(v)
        ng_new = jnp.sqrt(dot(g, g))
        ng0 = jnp.where(k == 0, ng_new, ng0)
        conv = jnp.logical_or(
            ng_new < inner_atol,
            jnp.logical_and(inner_rtol > 0.0, ng_new <= inner_rtol * ng0),
        )
        emax = jnp.maximum(ew_eta_max, cg_rtol)
        ratio = ng_new / jnp.maximum(ngp, tiny)
        eta = jnp.clip(0.9 * ratio * ratio, cg_rtol, emax)
        eta = jnp.where(k == 0, emax, eta)

        def do_cg(_):
            dv, it, neg = pcg(-g, eta)
            return dv, it, neg

        def skip(_):
            return (jnp.zeros_like(v), jnp.asarray(0, jnp.int32),
                    jnp.asarray(False))

        dv, cg_it, neg = jax.lax.cond(conv, skip, do_cg, None)
        dv_norm = jnp.sqrt(dot(dv, dv))
        suspicious = jnp.logical_or(neg, ~jnp.isfinite(dv_norm))

        def take_full(args):
            vv, dvv, _ = args
            return vv + dvv

        def backtrack(args):
            vv, dvv, gn0 = args

            def ls_cond(cc):
                t, j, _bt, _bg, dn = cc
                return jnp.logical_and(j < ls_max, ~dn)

            def ls_body(cc):
                t, j, best_t, best_gn, _ = cc
                gt = grad(vv + t * dvv)
                gn = jnp.sqrt(dot(gt, gt))
                better = gn < best_gn
                best_t = jnp.where(better, t, best_t)
                best_gn = jnp.where(better, gn, best_gn)
                dn = gn <= (1.0 - 1e-4 * t) * gn0
                return (t * 0.5, j + 1, best_t, best_gn, dn)

            one = jnp.ones((), dtype)
            _, _, best_t, _, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (one, jnp.asarray(0, jnp.int32), jnp.zeros((), dtype), gn0,
                 jnp.asarray(False)),
            )
            return vv + best_t * dvv

        if ls_max > 0:
            v = jax.lax.cond(suspicious, backtrack, take_full,
                             (v, dv, ng_new))
        else:
            v = v + dv
        k = k + jnp.where(conv, 0, 1)
        return (v, k, conv, ng_new, ng0, ng_new, cgt + cg_it)

    big = jnp.asarray(jnp.inf, dtype)
    v_fin, iters, _, norm_g, norm_g0, _, cg_tot = jax.lax.while_loop(
        newton_cond, newton_body,
        (vwin_ref[0], jnp.asarray(0, jnp.int32), jnp.asarray(False),
         big, big, big, jnp.asarray(0, jnp.int32)),
    )
    vout_ref[0, :, :] = v_fin
    fstat_ref[0] = norm_g
    # First-iteration ||g|| (carry slot ng0): the one history entry the
    # resident path can export — `newton_inner_resident` surfaces it as
    # hist[0] so rest-gradient telemetry checks (the TPU miscompile pin,
    # tests/test_banded_tpu_regression.py) keep working on this path.
    fstat_ref[1] = norm_g0
    istat_ref[0] = iters
    istat_ref[1] = cg_tot


def newton_inner_resident(v0, f_ext, params, system, inv_blocks0,
                          u_prev, v_prev, bdata, pin_terms):
    """Run the full inner Newton solve in one kernel (see module doc).

    Same return contract as `newton._newton_inner`: (v, n_it, norm_g,
    cg_total, hist) — hist is NaN-filled (per-iteration ||g|| telemetry is
    not exported from the resident kernel).

    pin_terms: (pin_aff (n,3), pin_lin (n,1)) dense fields or None.
    """
    bnd = system.pallas.banded
    if bdata is None:
        bdata = bnd.data
    interpret = bool(getattr(bnd, "interpret", False))
    dtype = v0.dtype
    n = v0.shape[0]
    WR2, I_cap, P_comb, S, Q, PR = (
        bnd.WR2, bnd.I_cap, bnd.P_comb, bnd.S, bnd.Q, bnd.PR)
    PR_pad = bnd.PR_pad

    if pin_terms is None:
        pin_aff = jnp.zeros((n, 3), dtype)
        pin_lin = jnp.zeros((n, 1), dtype)
    else:
        pin_aff, pin_lin = pin_terms

    vwin = to_windows(v0, bnd)
    upwin = to_windows(u_prev.astype(dtype), bnd)
    vpwin = to_windows(v_prev, bnd)
    fwin = to_windows(f_ext, bnd)
    pawin = to_windows(pin_aff, bnd)
    plwin = to_windows(pin_lin, bnd)
    ibwin = to_windows(inv_blocks0.reshape(n, 9).astype(dtype), bnd)

    scal = jnp.stack([
        jnp.asarray(params.dt, dtype), jnp.asarray(params.inner_atol, dtype),
        jnp.asarray(params.cg_rtol, dtype),
        jnp.asarray(params.ew_eta_max, dtype),
        jnp.asarray(params.inner_rtol, dtype),
    ]).astype(dtype)

    body = partial(
        _kernel, Q=Q, S=S, mops=bnd.mops, tmask=system.elems.trans_mask,
        K=bnd.K, RT=bnd.RT, WR2=WR2, I_cap=I_cap, P_comb=P_comb, PR=PR,
        max_inner=params.max_inner, cg_max=params.cg_max_iter,
        ls_max=params.ls_max, interp=interpret,
    )

    def _indb(b, *s):
        return (b, 0, 0)

    def _bspec(rows):
        return pl.BlockSpec((1, rows * SUB, ROW), _indb)

    comb_specs = ([pl.BlockSpec((1, P_comb * S * SUB, ROW), _indb)]
                  if P_comb else [])
    comb_in = ((bdata["comb"],) if P_comb else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # scal
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),       # v0
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),       # u_prev
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),       # v_prev
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),       # f_ext
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),       # pin_aff
            pl.BlockSpec((1, WR2, ROW), _indb),           # pin_lin
            pl.BlockSpec((1, 9 * WR2, ROW), _indb),       # inv_blocks
            pl.BlockSpec((1, I_cap * SUB, ROW), _indb),   # inv
            *comb_specs,
            _bspec(S),           # cl
            _bspec(Q * S * 3),   # gN
            _bspec(Q),           # dV
            _bspec(S * S),       # Me
        ],
        out_specs=[
            pl.BlockSpec((1, 3 * WR2, ROW), _indb),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 9 * WR2, ROW), dtype),  # win9
            pltpu.VMEM((1, 3 * WR2, ROW), dtype),  # pwin
            pltpu.VMEM((1, 3 * WR2, ROW), dtype),  # owin
            pltpu.VMEM((1, PR_pad * SUB, ROW), bnd.prep_dtype),  # prep
            pltpu.VMEM((3 * S * SUB, ROW), dtype),  # fes
        ],
    )
    voutw, fstat, istat = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 3 * WR2, ROW), dtype),
            jax.ShapeDtypeStruct((2,), dtype),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        interpret=interpret,
    )(bnd.pre["wb"], bnd.pre["first"], bnd.pre["r0"], bnd.pre["fid"],
      bnd.pre["ranges"],
      scal, vwin, upwin, vpwin, fwin, pawin, plwin, ibwin,
      bdata["inv"], *comb_in, bdata["cl"], bdata["gN"], bdata["dV"],
      bdata["Me"])

    from tlfea.ops.pallas_banded import from_windows

    v = from_windows(voutw, bnd)
    hist = jnp.full((params.max_inner + 1,), jnp.nan, dtype=dtype)
    hist = hist.at[0].set(fstat[1])  # first-iteration ||g|| (see _kernel)
    return v, istat[0], fstat[0], istat[1], hist
