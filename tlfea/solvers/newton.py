"""Matrix-free Newton-PCG implicit solver — the TPU-native replacement for
the reference's `SyncedNewtonSolver` + cuDSS direct sparse Cholesky
(`lib_src/solvers/SyncedNewton.cu:909-1394`).

Why not a direct solve: there is no sparse factorization on TPU, and the
reference's per-iteration pattern (assemble global CSR -> factorize -> solve)
is host-orchestrated with device->host norm readbacks every inner iteration
(`SyncedNewton.cu:1063-1074`). Here the Newton system

    H delta_v = -g,   H = M/h + h K_t(x) [+ C_visc] + h^2 rho J^T J

is solved by preconditioned conjugate gradients where H @ p is an exact
Hessian-vector product `jax.jvp(grad_L, v, p)` — no global matrix, no
sparsity analysis (the reference's `AnalyzeHessianSparsity`,
`SyncedNewton.cu:546-907`, has no equivalent here because nothing is
assembled). The preconditioner is block-Jacobi with analytic per-node 3x3
tangent blocks. The entire ALM step (outer dual loop, inner Newton loop,
inner-inner PCG loop) is a single jitted computation using `lax.while_loop`
with on-device predicates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from tlfea.ops.linalg import inv3x3
from tlfea.solvers.common import (
    StepState, System, grad_L, precond_blocks, flat_norm, constraint_values,
)

__all__ = ["NewtonParams", "step", "make_step", "make_rollout"]


@struct.dataclass
class NewtonParams:
    """Tolerances/iteration caps (reference: `SyncedNewton.cuh:29-33`)."""

    dt: jnp.ndarray = 1e-3
    rho: jnp.ndarray = 1e6  # ALM penalty
    inner_atol: jnp.ndarray = 1e-7
    inner_rtol: jnp.ndarray = 0.0
    outer_tol: jnp.ndarray = 1e-8
    max_outer: int = struct.field(pytree_node=False, default=4)
    max_inner: int = struct.field(pytree_node=False, default=20)
    cg_rtol: jnp.ndarray = 1e-4  # CG tolerance floor
    cg_max_iter: int = struct.field(pytree_node=False, default=200)
    # Newton warm-start: initial iterate v0 = v + predict * dv with dv the
    # previous step's velocity increment (StepState.dv). predict=1 is
    # constant-acceleration extrapolation — measured Newton 3 -> 2 / CG
    # halved per converged bench step; the converged solution is unchanged
    # (it's only the iterate's starting point). Set 0.0 to disable.
    predict: jnp.ndarray = 1.0
    # Trust-region-style step bound: rescale each Newton update so
    # ||dv||_2 <= max_dv (0 = unbounded, the default). Superseded by the
    # scale-free `ls_max` backtracking safeguard below (kept for
    # compatibility / A-B experiments; both may be active).
    max_dv: jnp.ndarray = 0.0
    # Residual-norm backtracking safeguard (scale-free globalization,
    # replaces per-scene `max_dv` tuning — VERDICT-r2 item 7). The SVK
    # tangent is INDEFINITE under strong compression (contact onset); CG's
    # negative-curvature guard stops iterating but still returns the
    # partial step, which can be unboundedly bad — one such step was
    # measured teleporting a self-contact run from vmax 1.5 to 1e19 m/s.
    # When CG reports it hit non-positive curvature (the only source of
    # such directions — an SPD solve always yields a descent direction for
    # ||g||), the update is backtracked: try t = 1, 1/2, ... 2^-(ls_max-1),
    # accept the first t with ||g(v + t dv)|| <= (1 - 1e-4 t) ||g(v)||,
    # else take the best t seen. Costs one extra gradient evaluation per
    # TRIAL, and nothing at all on healthy steps (lax.cond). 0 disables.
    ls_max: int = struct.field(pytree_node=False, default=8)
    # Eisenstat-Walker adaptive forcing (choice 2): per-Newton-iteration CG
    # tolerance eta_k = clamp(0.9 (||g_k||/||g_{k-1}||)^2, cg_rtol,
    # ew_eta_max). Early Newton iterations then use loose CG solves (SURVEY
    # hard part #1 mitigation); set ew_eta_max = 0 to disable.
    ew_eta_max: jnp.ndarray = 0.5


def _pcg(hvp, precond, b, rtol, max_iter):
    """Preconditioned CG for H x = b; returns (x, n_iters, final ||r||,
    neg_curv) — neg_curv flags that an H-conjugate direction with
    non-positive curvature was encountered (indefinite H; the returned x is
    the partial iterate and needs a globalization safeguard).

    hvp: p -> H @ p; precond: r -> M^{-1} r; all over (n_coef, 3) arrays.
    """

    def dot(a, c):
        return jnp.sum(a * c)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    bnorm = flat_norm(b)
    tol2 = (rtol * bnorm) ** 2

    # Numerical floor: even with tol = 0 (fixed-budget benchmarking), stop
    # once the residual reaches f32/f64 noise — running CG past convergence
    # corrupts the iterate (denominators underflow).
    eps_floor = jnp.asarray(1e-30 if b.dtype == jnp.float64 else 1e-18, b.dtype)
    tol2 = jnp.maximum(tol2, eps_floor * jnp.maximum(bnorm, 1.0) ** 2)

    def cond(carry):
        _, r, _, _, rz, k, _ = carry
        ok = jnp.logical_and(dot(r, r) > tol2, rz > 0)
        return jnp.logical_and(k < max_iter, ok)

    def body(carry):
        x, r, p, z, rz, k, neg = carry
        hp = hvp(p)
        denom = dot(p, hp)
        # Non-positive curvature (or breakdown): take no step and terminate
        # via the rz guard next round.
        good = denom > 0
        alpha = jnp.where(good, rz / jnp.where(good, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.where(good, dot(r, z), 0.0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, z, rz_new, k + 1, jnp.logical_or(neg, ~good))

    x, r, _, _, _, k, neg = jax.lax.while_loop(
        cond, body, (x0, r0, p0, z0, rz0, 0, jnp.asarray(False))
    )
    return x, k, flat_norm(r), neg


def _newton_inner(v0, x_prev, v_prev, lam, f_ext, params: NewtonParams, system: System, coarse=None, inv_blocks=None, u_prev=None, bdata=None):
    """Inner Newton loop at fixed duals; returns (v, iters, ||g||).

    inv_blocks: optional precomputed inverted block-Jacobi blocks (n, 3, 3)
    — pass to reuse a (possibly slightly stale) preconditioner across steps
    (see `make_rollout`); staleness only affects CG iteration count, never
    correctness.
    u_prev: stored displacement state (StepState.u) for full f32
    displacement-scale resolution; falls back to x_prev - x_ref.
    """
    from tlfea.constraints import DensePins, FixedCoefs, LinearConstraints

    dt, rho = params.dt, params.rho

    def g_of(v):
        return grad_L(v, x_prev, v_prev, lam, f_ext, dt, rho, system, u_prev=u_prev)

    # Specialized Pallas Hv path: the primal pass caches per-QP (Du, S0, Fd)
    # so each CG Hessian-vector product is one (E,S,3) gather + one tangent
    # kernel + one scatter (no primal recompute / 9-channel tangent pack —
    # see `pallas_fem.g_and_hvp`). Falls back to jax.linearize otherwise.
    cons_ok = (system.constraints is None
               or isinstance(system.constraints,
                             (FixedCoefs, DensePins, LinearConstraints)))
    use_pallas_hv = (
        system.pallas is not None
        and getattr(system.pallas, "hv_fn", None) is not None
        and cons_ok
    )
    # Banded fused path: one Pallas kernel per gradient / Hv, with the
    # gather+scatter inside the kernel (pallas_banded). Preferred when the
    # mesh was banded enough at build time; the wide-accumulation accuracy
    # mode stays on the flat path (its scatters run in accum_dtype).
    # Independent of the flat hv_fn gate: sharded flagship systems
    # (`parallel.shard_banded.shard_flagship`) carry ONLY banded kernels.
    use_banded = (
        system.pallas is not None
        and getattr(system.pallas, "banded", None) is not None
        and cons_ok
        and not system.accum_dtype
    )

    # Dense pin-constraint fields for the banded path, expanded ONCE here —
    # OUTSIDE the Newton/CG while_loop nest. Inside the nest the ALM pin
    # term is then pure dense math (`pin_aff + pin_lin * u`): a scatter of
    # the scan-carried dual `lam` into the banded kernel's output inside
    # the nest miscompiles on TPU for some table layouts (see
    # `g_and_hvp_banded`'s pin_terms docstring for the probe evidence).
    pin_terms = None
    if use_banded and isinstance(system.constraints, FixedCoefs):
        from tlfea.elements.assembly import node_ref

        cons = system.constraints
        x_ref = node_ref(system.elems)
        n = x_ref.shape[0]
        zero3 = jnp.zeros((n, 3), v0.dtype)
        lam_dense = zero3.at[cons.idx].set(lam.astype(v0.dtype))
        # Same f32 grouping as FixedCoefs.eval_c_u: the displacement-scale
        # (target - x_ref) is one term, never rounded against coordinates.
        tgt_dense = zero3.at[cons.idx].set(
            (cons.target - x_ref[cons.idx]).astype(v0.dtype)
        )
        pinmask = jnp.zeros((n, 1), v0.dtype).at[cons.idx].set(1.0)
        pin_terms = (dt * (lam_dense - rho * tgt_dense), dt * rho * pinmask)
    elif use_banded and isinstance(system.constraints, DensePins):
        # DensePins fields are ALREADY the dense formulation — no scatter
        # even here, so membership/target updates stay trace-free on the
        # banded path (the whole point of DensePins; `_cons_closure`
        # constant-pinning is unnecessary because no indices are traced).
        from tlfea.elements.assembly import node_ref

        cons = system.constraints
        x_ref = node_ref(system.elems)
        mask = cons.mask.astype(v0.dtype)
        tgt_u = mask * (cons.target - x_ref).astype(v0.dtype)
        pin_terms = (dt * (mask * lam.astype(v0.dtype) - rho * tgt_u),
                     dt * rho * mask)
    elif use_banded and isinstance(system.constraints, LinearConstraints):
        # General linear rows (the reference's CSR constraints,
        # `SyncedNewton.cu:556-801`) on the banded fast path. Split
        #   g_cons = dt J^T(lam + rho c(u)) = dt J^T(lam + rho c0)
        #            + dt rho J^T J u,      c0 = J x_ref - b,
        # so the SCAN-CARRIED dual only enters the affine field expanded
        # here, OUTSIDE the Newton/CG while nest (the banded miscompile rule
        # — PERF_NOTES instance #2: a scatter of carry-traced data inside
        # the nest corrupts the solve; indexed ops on loop-local values with
        # constant COO indices measured clean).
        from tlfea.elements.assembly import node_ref

        cons = system.constraints
        x_ref = node_ref(system.elems)
        n = x_ref.shape[0]
        c0 = (cons._apply_j(x_ref) - cons.b).astype(v0.dtype)
        aff = dt * cons.apply_jt(lam.astype(v0.dtype) + rho * c0, n)

        def _lin(p, cons=cons, n=n):
            return dt * rho * cons.apply_jt(cons._apply_j(p), n)

        pin_terms = (aff, _lin)

    # Single-kernel resident inner solve (SURVEY P5 — the reference's
    # persistent cooperative kernel, as ONE pallas_call): for single-block /
    # single-window banded meshes the whole Newton-PCG inner loop runs
    # in-kernel, collapsing ~200 small XLA ops per step (measured ~85%
    # device-idle at the 1k bench scale) to one call. Identical math —
    # same algebra cores, CG recurrences, EW forcing, and backtracking
    # (see ops/pallas_resident). Not taken when a coarse preconditioner is
    # supplied (extra CG iterations are cheaper in-kernel than the coarse
    # apply's op chain at this scale) or when `max_dv` is in use (legacy
    # opt-in bound; the ls_max safeguard is active in-kernel).
    if use_banded:
        import numpy as _np

        from tlfea.ops import pallas_resident

        pt_dense = (pin_terms if pin_terms is None or not callable(pin_terms[1])
                    else False)
        cons_dense_ok = (system.constraints is None and pt_dense is None) or (
            pt_dense is not None and pt_dense is not False
        )
        # The legacy ||dv|| rescale (params.max_dv) has no in-kernel
        # counterpart; a traced max_dv counts as in-use (advisor r4 #2).
        max_dv_off = _np.isscalar(params.max_dv) and float(params.max_dv) == 0.0
        if max_dv_off and pallas_resident.eligible(
                system.pallas.banded, cons_dense_ok, coarse):
            if inv_blocks is None:
                blocks0 = precond_blocks(v0, x_prev, dt, rho, system,
                                         u_prev=u_prev, bdata=bdata)
                inv_blocks_r = inv3x3(blocks0, eps=1e-30)
            else:
                inv_blocks_r = inv_blocks
            return pallas_resident.newton_inner_resident(
                v0, f_ext, params, system, inv_blocks_r, u_prev, v_prev,
                bdata, pt_dense,
            )

    def linearize_g(v):
        if use_banded:
            from tlfea.ops.pallas_banded import g_and_hvp_banded

            return g_and_hvp_banded(v, x_prev, v_prev, lam, f_ext, dt, rho,
                                    system, u_prev=u_prev, bdata=bdata,
                                    pin_terms=pin_terms)
        if use_pallas_hv:
            from tlfea.ops.pallas_fem import g_and_hvp

            return g_and_hvp(v, x_prev, v_prev, lam, f_ext, dt, rho, system,
                             u_prev=u_prev)
        return jax.linearize(g_of, v)

    # Frozen block-Jacobi preconditioner: assembled once per inner solve at
    # the incoming iterate (tangent blocks are the most expensive single
    # computation in the step; freshness barely affects CG quality). The
    # reference's cuDSS analog is REFACTORIZATION reuse
    # (`SyncedNewton.cu:1101-1108`).
    if inv_blocks is None:
        blocks0 = precond_blocks(v0, x_prev, dt, rho, system, u_prev=u_prev,
                                 bdata=bdata)
        # Invert once per inner solve: the block-Jacobi apply sits on the CG
        # critical path, and a 3x3 matvec per iteration beats re-running the
        # adjugate solve every iteration.
        inv_blocks0 = inv3x3(blocks0, eps=1e-30)
    else:
        inv_blocks0 = inv_blocks

    def bj_apply(r):
        return jnp.einsum("nij,nj->ni", inv_blocks0, r)

    if coarse is not None and hasattr(coarse, "apply"):
        # Frozen two-level correction (CoarsePrecond): matmul-based apply,
        # no per-solve assembly (see tlfea.solvers.coarse).
        def precond(r):
            return bj_apply(r) + coarse.apply(r)

    elif coarse is not None:
        # Legacy per-solve Galerkin assembly (CoarseSetup): exact at the
        # current iterate, expensive — kept for validation.
        from tlfea.solvers.coarse import coarse_operator, make_two_level_precond

        Ac = coarse_operator(
            x_prev + dt * v0, system.elems, system.material,
            system.constraints, coarse, dt, rho,
        )
        chol = jax.scipy.linalg.cho_factor(Ac, lower=True)[0]
        precond = make_two_level_precond(
            precond_blocks(v0, x_prev, dt, rho, system, u_prev=u_prev), chol, coarse
        )
    else:
        precond = bj_apply

    tiny = jnp.asarray(jnp.finfo(v0.dtype).tiny, v0.dtype)

    def cond(carry):
        v, k, done, *_ = carry
        return jnp.logical_and(k < params.max_inner, jnp.logical_not(done))

    def body(carry):
        v, k, done, norm_g, norm_g0, norm_g_prev, cg_total, hist = carry
        # One primal gradient evaluation per Newton iteration; CG applies its
        # tangent-only linearization (the round-1 jvp path recomputed the
        # full primal residual inside every Hessian-vector product).
        g, hvp = linearize_g(v)
        norm_g_new = flat_norm(g)
        norm_g0 = jnp.where(k == 0, norm_g_new, norm_g0)
        # Per-iteration ||g|| telemetry (the reference prints these every
        # inner iteration, `SyncedNewton.cu:1065`; recorded on-device).
        hist = hist.at[k].set(norm_g_new)
        conv = jnp.logical_or(
            norm_g_new < params.inner_atol,
            jnp.logical_and(
                params.inner_rtol > 0.0, norm_g_new <= params.inner_rtol * norm_g0
            ),
        )
        # Eisenstat-Walker forcing (choice 2): eta_k = 0.9 (g_k/g_{k-1})^2,
        # clipped to [cg_rtol, ew_eta_max] — loose CG early, tight as Newton
        # converges. First iteration has no history: use the loose end.
        emax = jnp.maximum(params.ew_eta_max, params.cg_rtol)
        ratio = norm_g_new / jnp.maximum(norm_g_prev, tiny)
        eta = jnp.clip(0.9 * ratio * ratio, params.cg_rtol, emax)
        eta = jnp.where(k == 0, emax, eta)

        def do_cg(_):
            dv, it, _r, neg = _pcg(hvp, precond, -g, eta, params.cg_max_iter)
            return dv, jnp.asarray(it, jnp.int32), neg

        def skip(_):
            return jnp.zeros_like(v), jnp.asarray(0, jnp.int32), jnp.asarray(False)

        dv, cg_iters, neg_curv = jax.lax.cond(conv, skip, do_cg, None)
        # Bounded step (params.max_dv): legacy opt-in rescale. No-op at the
        # default max_dv == 0 (the ls_max safeguard below is the principled
        # replacement).
        dv_norm = flat_norm(dv)
        bound_on = params.max_dv > 0
        scale = jnp.where(
            jnp.logical_and(bound_on, dv_norm > params.max_dv),
            params.max_dv / jnp.maximum(dv_norm, tiny),
            jnp.ones((), dv.dtype),
        )
        dv = scale * dv

        # Scale-free globalization (NewtonParams.ls_max): a Newton direction
        # from an SPD solve is always a descent direction for ||g|| — only
        # when CG encountered NON-POSITIVE curvature (or produced non-finite
        # values) can the partial step be arbitrarily bad, so only then pay
        # for a residual-norm backtracking search. lax.cond keeps the search
        # entirely off the healthy-step execution path.
        suspicious = jnp.logical_or(neg_curv, ~jnp.isfinite(dv_norm))

        def take_full(vdvg):
            vv, dvv, _ = vdvg
            return vv + dvv

        def backtrack(vdvg):
            vv, dvv, gn0 = vdvg

            def ls_cond(c):
                t, j, _bt, _bg, done = c
                return jnp.logical_and(j < params.ls_max, ~done)

            def ls_body(c):
                t, j, best_t, best_gn, _ = c
                # Gradient-only evaluation on the fast path (the linearized
                # hvp half is unused and DCE'd by XLA).
                gn = flat_norm(linearize_g(vv + t * dvv)[0])
                better = gn < best_gn  # False for NaN: best stays as-is
                best_t = jnp.where(better, t, best_t)
                best_gn = jnp.where(better, gn, best_gn)
                done = gn <= (1.0 - 1e-4 * t) * gn0
                return (t * 0.5, j + 1, best_t, best_gn, done)

            # best starts at (t=0, ||g(v)||): if EVERY trial fails the
            # sufficient-decrease test (or all trial gradients are NaN — a
            # non-finite dv makes every vv + t*dvv non-finite), the fallback
            # step is ZERO, never a residual-increasing or NaN update. A
            # rejected step costs one wasted inner iteration; the previous
            # fallback (best_t = t_min = 2^-(ls_max-1), relative) still
            # teleported the iterate by 1/128 of an unbounded CG direction.
            one = jnp.ones((), vv.dtype)
            _, _, best_t, _, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (one, jnp.asarray(0, jnp.int32), jnp.zeros((), vv.dtype),
                 gn0, jnp.asarray(False)),
            )
            return vv + best_t * dvv

        if params.ls_max > 0:
            v = jax.lax.cond(suspicious, backtrack, take_full,
                             (v, dv, norm_g_new))
        else:
            v = v + dv
        k = k + jnp.where(conv, 0, 1)
        return (v, k, conv, norm_g_new, norm_g0, norm_g_new, cg_total + cg_iters, hist)

    hist0 = jnp.full((params.max_inner + 1,), jnp.nan, dtype=v0.dtype)
    big = jnp.asarray(jnp.inf, v0.dtype)
    init = (v0, jnp.asarray(0, jnp.int32), jnp.asarray(False), big, big, big,
            jnp.asarray(0, jnp.int32), hist0)
    v, iters, _, norm_g, _, _, cg_total, hist = jax.lax.while_loop(cond, body, init)
    return v, iters, norm_g, cg_total, hist


def _step(system: System, state: StepState, params: NewtonParams, f_ext, coarse=None, inv_blocks=None, bdata=None):
    """One backward-Euler step; returns (new_state, diagnostics dict)."""
    from tlfea.elements.assembly import node_ref

    x_prev = state.x
    x_ref = node_ref(system.elems)
    # Displacement is the primary state (StepState.u); derive it once when
    # stepping a hand-built state that only carries absolute positions.
    u_prev = state.u if state.u is not None else x_prev - x_ref
    cons = system.constraints

    # Warm-start iterate (see NewtonParams.predict). v_prev (the physics,
    # entering the inertia/damping terms) stays state.v regardless.
    v_init = state.v
    if state.dv is not None:
        v_init = state.v + params.predict * state.dv

    def outer_body(carry):
        v, v_prev, lam, k, _, newton_tot, cg_tot, hist_all, _ok = carry
        v, n_it, norm_g, cg_it, hist = _newton_inner(
            v, x_prev, v_prev, lam, f_ext, params, system, coarse, inv_blocks,
            u_prev=u_prev, bdata=bdata,
        )
        hist_all = hist_all.at[k].set(hist)  # per-outer row, nothing dropped
        # Inner loop exits either converged or at the iteration budget; a
        # budget exit means v is NOT the backward-Euler solution this step.
        ok = n_it < params.max_inner
        v_prev = v
        if cons is not None:
            c = constraint_values(cons, x_prev, v, params.dt, system.elems,
                                  u_prev=u_prev)
            lam = lam + params.rho * c  # Newton dual update (SyncedNewton.cu:470-481)
            norm_c = flat_norm(c)
        else:
            norm_c = jnp.zeros((), dtype=v.dtype)
        return (v, v_prev, lam, k + 1, norm_c, newton_tot + n_it, cg_tot + cg_it, hist_all, ok)

    def outer_cond(carry):
        _, _, _, k, norm_c, _, _, _, _ = carry
        unconverged = jnp.logical_or(k == 0, norm_c >= params.outer_tol)
        return jnp.logical_and(k < params.max_outer, unconverged)

    hist0 = jnp.full((params.max_outer, params.max_inner + 1), jnp.nan,
                     dtype=state.v.dtype)
    init = (
        v_init, state.v, state.lam, jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, dtype=state.v.dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), hist0,
        jnp.asarray(False),
    )
    v, _, lam, outers, norm_c, newton_tot, cg_tot, hist, ok = (
        jax.lax.while_loop(outer_cond, outer_body, init)
    )
    u = u_prev + params.dt * v  # displacement-scale state update (exact)
    # Derived geometry for collision/IO consumers; keeps the state dtype
    # even when u is carried wide (mixed-precision accuracy mode).
    x = (x_ref + u).astype(x_prev.dtype)
    # Warm-start safety: only feed the NEXT step's extrapolation when this
    # step actually converged. A budget-exhausted solve from a predicted
    # start feeds its error into the next prediction — measured to compound
    # into divergence on stiff large-dt runs (beam collapsing 60x past the
    # static sag). Zeroing dv makes the next step start cold, breaking the
    # feedback loop at zero extra cost.
    dv_next = jnp.where(ok, v - state.v, jnp.zeros_like(v))
    new_state = StepState(x=x, v=v, lam=lam, u=u, dv=dv_next)
    diag = {
        "outer_iters": outers,
        "newton_iters": newton_tot,
        "cg_iters": cg_tot,
        "norm_c": norm_c,
        # Flattened (max_outer, max_inner+1) per-Newton ||g|| telemetry —
        # every outer iteration's row, row-major, NaN-padded (the reference
        # prints these every inner iteration, `SyncedNewton.cu:1065`).
        "norm_g_history": hist.reshape(-1),
    }
    return new_state, diag


_step_jit = jax.jit(_step)
# Per-constraints-object jits for Pallas systems (TPU miscompile workaround,
# see `_cons_closure`): the pin arrays must be jaxpr CONSTANTS, so each
# distinct FixedCoefs gets its own executable. Values hold (fn, cons) — the
# cons reference keeps id() stable for the cache's lifetime.
_step_jit_by_cons: dict = {}


def step(system: System, state, params: NewtonParams, f_ext, coarse=None):
    """Jitted one-off step. Production loops should use `make_step` /
    `make_rollout` (one trace per system). Threads the banded kernels'
    static tables host-side so they enter the jit as arguments, never as
    executable constants (see `_banded_data`). Pallas systems re-trace per
    distinct constraints object (`_cons_closure` workaround)."""
    cons_c = _cons_closure(system)
    if cons_c is None:
        return _step_jit(system, state, params, f_ext, coarse,
                         bdata=_banded_data(system))
    ent = _step_jit_by_cons.get(id(cons_c))
    if ent is None or ent[1] is not cons_c:

        @jax.jit
        def _fc(sys_, state, params, f_ext, co, bd):
            return _step(sys_.replace(constraints=cons_c), state, params,
                         f_ext, co, bdata=bd)

        _step_jit_by_cons[id(cons_c)] = ent = (_fc, cons_c)
    return ent[0](system, state, params, f_ext, coarse,
                  _banded_data(system))


def _banded_data(system: System):
    """The banded kernels' static device tables as a pytree, or None.

    `System.pallas` is a static (non-pytree) field, so anything it holds
    compiles into the jaxpr as constants; the banded scatter schedule alone
    is 100s of MB at 100k elems, which overflows the axon remote-compile
    request (HTTP 413). Factories thread this through their jits as an
    argument instead.
    """
    bnd = getattr(system.pallas, "banded", None) if system.pallas is not None else None
    return None if bnd is None else bnd.data


def _cons_closure(system: System):
    """Constraints to CLOSE OVER (jaxpr constants) instead of tracing, or None.

    TPU miscompile workaround, isolated on jax 0.8-era TPU backends: with the
    banded Pallas kernels (primal + Hv) inside a `lax.while_loop` body, a
    TRACED `FixedCoefs` (its `idx` gather/scatter indices and `target`) makes
    the ALM pin terms read corrupted data — the measured gradient picks up a
    deterministic dt*rho*O(|x_ref|) ghost-constraint term (bisected: elements
    / material / banded tables traced are all fine; constraints traced flips
    it). Closing over the two tiny arrays (~KBs — no remote-compile-size or
    layout-padding concern, unlike element tables) sidesteps it. Scoped to
    systems with BANDED kernels (the flat Pallas path measured clean under
    the same bisect); plain-XLA and flat-Pallas systems keep traced
    constraints so `Simulation` can retarget without retracing.
    """
    if system.pallas is None or getattr(system.pallas, "banded", None) is None:
        return None
    from tlfea.constraints import FixedCoefs, LinearConstraints

    if isinstance(system.constraints, (FixedCoefs, LinearConstraints)):
        # LinearConstraints COO arrays are tiny (KBs) and their gathers run
        # inside the while nest on the banded path — the same traced-index
        # exposure class as FixedCoefs, so they get the same constant-pin
        # treatment. Retargeting (changing b) therefore recompiles on the
        # banded path; use DensePins for retargeting scenes.
        return system.constraints
    return None


def make_step(system: System, params: NewtonParams, coarse=None):
    """Return a jitted step(state, f_ext) closure over a fixed system.

    coarse: optional `tlfea.solvers.coarse.CoarsePrecond` (frozen two-level)
    or legacy `CoarseSetup`, enabling the two-level preconditioner (SVK
    systems). Passed into the jit as an ARGUMENT pytree, not a closure
    constant: closure arrays ride inside the compile request, and the axon
    remote-compile tunnel rejects bodies past ~100s of MB (HTTP 413) — the
    dense (na, n) Agg matrix alone is ~300 MB at 100k elems. The banded
    kernels' static tables (`system.pallas.banded.data` — the scatter
    schedule is the other 100s-of-MB offender at 100k) ride as an argument
    for the same reason.
    """
    bdata = _banded_data(system)
    cons_c = _cons_closure(system)

    @jax.jit
    def _fc(sys_, state, f_ext, co, bd):
        if cons_c is not None:
            # Pin arrays as constants — TPU while-loop miscompile workaround
            # (see `_cons_closure`); the traced copy is pruned as unused.
            sys_ = sys_.replace(constraints=cons_c)
        return _step(sys_, state, params, f_ext, co, bdata=bd)

    # `system` itself also enters as an ARGUMENT pytree: closed over, its
    # element arrays (grad_N alone is 58 MB at 100k elems) become constant
    # literals, which (a) bloat the remote-compile MLIR past the helper's
    # limits and (b) get materialized with padded tiled layouts on device
    # (measured 20.5x expansion: 1.16 GB for grad_N) — the round-2 100k OOM.
    return lambda state, f_ext: _fc(system, state, f_ext, coarse, bdata)


def make_rollout(system: System, params: NewtonParams, n_steps: int, coarse=None,
                 precond_refresh: int = 1):
    """Jitted sustained rollout: `roll(state, f_ext) -> (state, (newton_iters,
    cg_iters))` chaining `n_steps` backward-Euler steps in one `lax.scan`.

    precond_refresh=K freezes the inverted block-Jacobi preconditioner for K
    consecutive steps (the blocks change slowly between steps; assembling
    them is ~8.5 ms at 10.6k elems vs ~1 ms per CG iteration — PERF_NOTES).
    Staleness only affects CG iteration counts, never the converged solution.
    The production-shape API: per-step dispatch over the axon tunnel costs
    more than a whole step, so benchmarks and long runs should scan.
    """
    refresh = max(int(precond_refresh), 1)

    # `system`, `coarse`, and the banded tables all enter as jit ARGUMENT
    # pytrees (see make_step: closure arrays become constant literals, which
    # bloat the remote-compile request past its limits AND materialize with
    # padded tiled layouts on device — 20.5x expansion measured at 100k).
    bdata = _banded_data(system)
    cons_c = _cons_closure(system)

    @jax.jit
    def _roll(sys_, state: StepState, f_ext, co, bd):
        if cons_c is not None:
            # TPU while-loop miscompile workaround — see `_cons_closure`.
            sys_ = sys_.replace(constraints=cons_c)

        def fresh_inv(st):
            return inv3x3(
                precond_blocks(st.v, st.x, params.dt, params.rho, sys_,
                               u_prev=st.u, bdata=bd),
                eps=1e-30,
            )

        def body(carry, k):
            st, inv_b = carry
            if refresh > 1:
                inv_b = jax.lax.cond(
                    k % refresh == 0, lambda s, b: fresh_inv(s), lambda s, b: b,
                    st, inv_b,
                )
            ns, d = _step(sys_, st, params, f_ext, co, inv_blocks=inv_b,
                          bdata=bd)
            return (ns, inv_b), (d["newton_iters"], d["cg_iters"])

        if refresh > 1:
            inv0 = fresh_inv(state)
            (s, _), its = jax.lax.scan(
                body, (state, inv0), jnp.arange(n_steps)
            )
        else:
            def body1(st, _):
                ns, d = _step(sys_, st, params, f_ext, co, bdata=bd)
                return ns, (d["newton_iters"], d["cg_iters"])

            s, its = jax.lax.scan(body1, state, None, length=n_steps)
        return s, its

    def roll(state: StepState, f_ext):
        # Normalize OPTIONAL state fields on the host, before the jit
        # boundary: _roll's output state always carries u and dv arrays, so a
        # None-field input would give the warmup call a different pytree
        # structure than every chained call — a second trace/compile that
        # lands inside whatever the caller is timing (measured as a phantom
        # 150x "regression" when dv was first added).
        if state.u is None:
            from tlfea.elements.assembly import node_ref

            state = state.replace(u=state.x - node_ref(system.elems))
        if state.dv is None:
            state = state.replace(dv=jnp.zeros_like(state.v))
        return _roll(system, state, f_ext, coarse, bdata)

    return roll


def make_coupled_rollout(system: System, params: NewtonParams, n_steps: int,
                         force_fn, coarse=None, precond_refresh: int = 1):
    """Jitted collision-coupled rollout: `roll(state, f_base) -> (state,
    (newton_iters, cg_iters), any_overflow)` chaining n_steps of
    [f_ext = f_base + force_fn(x, v); backward-Euler step] in one lax.scan.

    force_fn(x, v) -> (f_col (n,3), overflow bool) — e.g. a closure over
    `HydroelasticCollision.step`. The overflow flags are OR-reduced across
    the scan and returned for the caller's capacity check (the deferred
    overflow contract of `Simulation`, amortized over the whole rollout).

    Why: the host-driven Simulation loop pays ~4 dispatches per step
    (collision phases + solve); on the axon tunnel each round trip is
    ~25-30 ms, which dominated the sphere-drop bench (device work ~6 ms).
    Production collision runs should scan exactly like the dry solver
    rollouts.
    """
    refresh = max(int(precond_refresh), 1)
    bdata = _banded_data(system)
    cons_c = _cons_closure(system)

    @jax.jit
    def _roll(sys_, state: StepState, f_base, co, bd):
        if cons_c is not None:
            sys_ = sys_.replace(constraints=cons_c)

        def fresh_inv(st):
            return inv3x3(
                precond_blocks(st.v, st.x, params.dt, params.rho, sys_,
                               u_prev=st.u, bdata=bd),
                eps=1e-30,
            )

        def body(carry, k):
            st, inv_b, ovf = carry
            if refresh > 1:
                inv_b = jax.lax.cond(
                    k % refresh == 0, lambda s, b: fresh_inv(s),
                    lambda s, b: b, st, inv_b,
                )
            f_col, o = force_fn(st.x, st.v)
            ns, d = _step(sys_, st, params, f_base + f_col, co,
                          inv_blocks=inv_b if refresh > 1 else None, bdata=bd)
            return (ns, inv_b, jnp.logical_or(ovf, o)), (
                d["newton_iters"], d["cg_iters"])

        inv0 = fresh_inv(state)
        (s, _, ovf), its = jax.lax.scan(
            body, (state, inv0, jnp.asarray(False)), jnp.arange(n_steps)
        )
        return s, its, ovf

    def roll(state: StepState, f_base):
        if state.u is None:
            from tlfea.elements.assembly import node_ref

            state = state.replace(u=state.x - node_ref(system.elems))
        if state.dv is None:
            state = state.replace(dv=jnp.zeros_like(state.v))
        return _roll(system, state, f_base, coarse, bdata)

    return roll


def stepper(params, coarse=None):
    """Jitted step(system, state, f_ext) — the `Simulation` contract; the
    system is a pytree argument, so constraint targets / material parameters
    may change between calls without retracing. The static `system.pallas`
    handle's banded tables are re-extracted per call and threaded as a jit
    argument (`System.pallas` is a static field, so its arrays would
    otherwise become jaxpr constants — HTTP 413 at 100k elems).

    Pallas systems (`system.pallas` set) instead RE-TRACE whenever the
    constraints object changes: their pin arrays must be jaxpr constants
    (`_cons_closure` TPU workaround), so per-step constraint retargeting on
    a Pallas system recompiles — use the XLA path for prescribed-motion
    scenes, or retarget in coarse epochs."""

    @jax.jit
    def _f(system, state, f_ext, co, bd):
        return _step(system, state, params, f_ext, co, bdata=bd)

    cache: dict = {}

    def call(system, state, f_ext):
        cons_c = _cons_closure(system)
        bd = _banded_data(system)
        if cons_c is None:
            return _f(system, state, f_ext, coarse, bd)
        ent = cache.get(id(cons_c))
        if ent is None or ent[1] is not cons_c:

            @jax.jit
            def _fc(sys_, state, f_ext, co, bd):
                return _step(sys_.replace(constraints=cons_c), state, params,
                             f_ext, co, bdata=bd)

            cache[id(cons_c)] = ent = (_fc, cons_c)
        return ent[0](system, state, f_ext, coarse, bd)

    return call
