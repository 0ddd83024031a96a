"""Banded fused gather/kernel/scatter path (`tlfea.ops.pallas_banded`).

Parity target: `pallas_fem.g_and_hvp` / `jax.linearize(grad_L)` — the banded
kernels move the gather/scatter inside the kernel but must be bit-for-bit
the same physics (same shared algebra cores). Kernel parity runs in
interpreter mode (slow, exact); host-side banding prep is covered fast.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_banded, pallas_fem
from tlfea.solvers import System
from tlfea.solvers.common import grad_L
from tlfea.utils.tetmesh import box_t10_mesh

DTYPE = np.float64


def _problem(nx, ny, nz, L=1.0, reorder=False, mat=None):
    nodes, conn = box_t10_mesh(L, 0.3, 0.3, nx, ny, nz)
    if reorder:
        from tlfea.utils.reorder import apply_node_order, rcm_order

        nodes, conn = apply_node_order(nodes, conn, rcm_order(conn, len(nodes)))
    lam, mu = lame_from_E_nu(1e7, 0.3)
    if mat is None:
        mat = SVK(
            lam=jnp.asarray(lam, DTYPE), mu=jnp.asarray(mu, DTYPE),
            eta_damp=jnp.asarray(1e3, DTYPE), lam_damp=jnp.asarray(1e3, DTYPE),
        )
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=DTYPE)
    system = System(
        elems=elems, material=mat,
        constraints=FixedCoefs.from_indices(fixed, nodes.astype(DTYPE)),
    )
    return nodes, system, fixed


def _rand_state(nodes, fixed, seed=0):
    rng = np.random.default_rng(seed)
    n = nodes.shape[0]
    return dict(
        x_prev=jnp.asarray(nodes, DTYPE),
        u_prev=jnp.zeros((n, 3), DTYPE),
        v=jnp.asarray(rng.normal(size=(n, 3)) * 0.1, DTYPE),
        v_prev=jnp.asarray(rng.normal(size=(n, 3)) * 0.1, DTYPE),
        lam_dual=jnp.asarray(rng.normal(size=(len(fixed), 3)), DTYPE),
        p=jnp.asarray(rng.normal(size=(n, 3)), DTYPE),
    )


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))


def test_build_banded_metadata():
    """Host prep invariants: permutation validity, local indices in-window,
    non-decreasing window assignment, chunk ranges covering every index."""
    _, system, _ = _problem(8, 2, 2)
    bnd = pallas_banded.build_banded(system.elems, system.material, dtype=DTYPE)
    E, S = np.asarray(system.elems.conn).shape
    order = np.asarray(bnd.order)
    assert sorted(order.tolist()) == list(range(E))
    conn_s = np.asarray(system.elems.conn)[order]
    mins = conn_s.min(axis=1)
    assert (np.diff(mins) >= 0).all(), "elements must be sorted by min node"
    assert bnd.W % 1024 == 0 and bnd.W >= bnd.span
    assert bnd.n_wins * bnd.W + bnd.W >= int(system.elems.n_coef)


@pytest.mark.parametrize("reorder", [False, True])
def test_scatter_schedule_emulation(reorder):
    """NumPy emulation of the kernel's shuffle-table scatter against a
    direct scatter-add — validates the host-built item schedule EXACTLY
    (the device kernel is pure plumbing around these index tables). The
    reorder=True case has multiple blocks AND windows."""
    from tlfea.ops.pallas_fem import EBLK, LANE, SUB

    _, system, _ = _problem(16, 4, 4, L=2.0, reorder=reorder)
    elems = system.elems
    bnd = pallas_banded.build_banded(elems, system.material, dtype=DTYPE)
    sch = bnd.sched
    conn_s = np.asarray(elems.conn)[np.asarray(bnd.order)].astype(np.int64)
    E, S = conn_s.shape
    ROW = pallas_banded.ROW
    rng = np.random.default_rng(3)

    # Index decomposition: wb*W + r*ROW + q must reproduce the connectivity.
    cl = sch["cl"]
    r, q = cl // ROW, cl % ROW
    w_abs = np.repeat(sch["wb"], EBLK)[:E, None] * bnd.W + cl[:E]
    assert (w_abs == conn_s).all()
    # K bounds every (block, slot) row range (gather one-hot depth).
    for b in range(bnd.n_blocks):
        rr = r[b * EBLK:(b + 1) * EBLK]
        assert (rr.max(axis=0) - rr.min(axis=0) + 1 <= bnd.K).all()

    # Scatter emulation: walk the item tables exactly as the kernel does.
    fe = rng.normal(size=(bnd.n_blocks, S, SUB, LANE, 3))
    fe_orig = fe.copy()  # the direct-scatter reference uses raw values
    # In-row combine passes first (simultaneous-update semantics per pass,
    # matching the kernel's read-then-write of the whole (SUB, ROW) tile).
    if bnd.P_comb:
        comb5 = sch["comb"].reshape(bnd.n_blocks, bnd.P_comb, S, SUB, ROW)
        for b in range(bnd.n_blocks):
            for p in range(bnd.P_comb):
                for a in range(S):
                    old = fe[b, a].copy()  # (SUB, LANE, 3)
                    cb = comb5[b, p, a]  # (SUB, ROW)
                    ok = cb >= 0
                    src = np.where(ok, cb, 0)
                    gathered = old[np.arange(SUB)[:, None], src]
                    fe[b, a] = old + np.where(ok[..., None], gathered, 0.0)
    acc = np.zeros(((bnd.n_wins + 2) * bnd.W, 3))
    inv4 = sch["inv"].reshape(bnd.n_blocks, bnd.I_cap, SUB, ROW)
    for b in range(bnd.n_blocks):
        for rt in range(bnd.RT):
            start, cnt = sch["ranges"][b, rt]
            for i in range(start, start + cnt):
                f = sch["fid"][b, i]
                a, s = f // SUB, f % SUB
                sr_idx, pos_idx = np.nonzero(inv4[b, i] >= 0)
                lanes = inv4[b, i][sr_idx, pos_idx]
                w = (rt * SUB + sr_idx) * ROW + pos_idx
                np.add.at(acc, sch["wb"][b] * bnd.W + w, fe[b, a, s, lanes])
    ref = np.zeros_like(acc)
    eids = np.arange(E)
    for a in range(S):
        np.add.at(
            ref, conn_s[:, a],
            fe_orig[eids // EBLK, a, (eids % EBLK) // LANE, eids % LANE],
        )
    assert np.allclose(acc, ref, atol=1e-12), "scatter schedule mismatch"


def test_build_banded_rejects_wide_band():
    _, system, _ = _problem(8, 2, 2)
    with pytest.raises(pallas_banded.NotBandedError):
        pallas_banded.build_banded(
            system.elems, system.material, dtype=DTYPE, w_cap=64
        )


def test_with_pallas_banded_auto_fallback():
    """banded="auto" must degrade to a flat-only handle when the window cap
    is exceeded — never raise out of with_pallas."""
    _, system, _ = _problem(8, 2, 2)
    psys = pallas_fem.with_pallas(system, dtype=DTYPE, interpret=True)
    assert psys.pallas.banded is None  # default off


@pytest.mark.slow
def test_banded_matches_linearize():
    """g and H@p from the banded fused kernels == jax.linearize(grad_L),
    single-block interpret-mode parity (exact). Multi-block/multi-window
    device behavior (revisit accumulation, carry halves, visited mask) is
    covered fast by `test_scatter_schedule_emulation` (exact host-schedule
    emulation) and on real TPUs by `benchmarks/profile_banded.py`, which
    asserts parity at 10.6k elems / 11 blocks / 6 windows — the multi-block
    interpret compile is pathologically slow on CPU (>25 min)."""
    nodes, system, fixed = _problem(8, 2, 2)
    system = pallas_fem.with_pallas(
        system, dtype=DTYPE, interpret=True, banded=True
    )
    st = _rand_state(nodes, fixed)
    f_ext = jnp.zeros((nodes.shape[0], 3), DTYPE).at[:, 2].add(
        lumped_mass(system.elems) * DTYPE(-9.81)
    )
    dt, rho = DTYPE(1e-3), DTYPE(1e6)

    g_ref, hvp_ref = jax.linearize(
        lambda vv: grad_L(vv, st["x_prev"], st["v_prev"], st["lam_dual"],
                          f_ext, dt, rho, system, u_prev=st["u_prev"]),
        st["v"],
    )
    g_b, hvp_b = pallas_banded.g_and_hvp_banded(
        st["v"], st["x_prev"], st["v_prev"], st["lam_dual"], f_ext, dt, rho,
        system, u_prev=st["u_prev"],
    )
    assert _rel(g_b, g_ref) < 1e-12
    assert _rel(hvp_b(st["p"]), hvp_ref(st["p"])) < 1e-12


@pytest.mark.slow
def test_banded_matches_linearize_mooney_rivlin():
    """Mooney-Rivlin through the banded fused kernels (tile algebra
    `pallas_fem._MRTile`: cancellation-free J-1, cached F^{-T}/invariants,
    hand-derived directional tangent) == jax.linearize(grad_L) on the XLA
    einsum path. Exact-arithmetic interpret-mode parity in f64."""
    from tlfea.materials import MooneyRivlin

    mat = MooneyRivlin(
        mu10=jnp.asarray(2.0e5, DTYPE), mu01=jnp.asarray(5.0e4, DTYPE),
        kappa=jnp.asarray(1.0e6, DTYPE),
        eta_damp=jnp.asarray(1e2, DTYPE), lam_damp=jnp.asarray(1e2, DTYPE),
    )
    nodes, system, fixed = _problem(8, 2, 2, mat=mat)
    system = pallas_fem.with_pallas(
        system, dtype=DTYPE, interpret=True, banded=True
    )
    st = _rand_state(nodes, fixed)
    f_ext = jnp.zeros((nodes.shape[0], 3), DTYPE).at[:, 2].add(
        lumped_mass(system.elems) * DTYPE(-9.81)
    )
    dt, rho = DTYPE(1e-3), DTYPE(1e6)

    g_ref, hvp_ref = jax.linearize(
        lambda vv: grad_L(vv, st["x_prev"], st["v_prev"], st["lam_dual"],
                          f_ext, dt, rho, system, u_prev=st["u_prev"]),
        st["v"],
    )
    g_b, hvp_b = pallas_banded.g_and_hvp_banded(
        st["v"], st["x_prev"], st["v_prev"], st["lam_dual"], f_ext, dt, rho,
        system, u_prev=st["u_prev"],
    )
    assert _rel(g_b, g_ref) < 1e-11
    assert _rel(hvp_b(st["p"]), hvp_ref(st["p"])) < 1e-11


@pytest.mark.slow
def test_banded_linear_constraints_pin_terms_split():
    """General LinearConstraints on the banded fast path (VERDICT-r3 item
    6): the production split (affine half dt J^T(lam + rho c0) expanded
    outside the while nest + loop-local dt rho J^T J u, exactly what
    newton._newton_inner precomputes) must equal jax.linearize(grad_L) on
    the XLA path. Interpret mode, f64 exact."""
    from tlfea.constraints import LinearConstraintBuilder

    nodes, system, _ = _problem(8, 2, 2)
    b = LinearConstraintBuilder()
    # Clamp the x=0 face through general rows (not FixedCoefs) + a weld.
    for n_id in np.nonzero(nodes[:, 0] < 1e-12)[0]:
        for d in range(3):
            b.fix_dof(int(n_id), d, float(nodes[n_id, d]))
    b.equate_dofs(int(nodes.shape[0] // 2), int(nodes.shape[0] // 2 + 1))
    cons = b.build(dtype=DTYPE)
    system = system.replace(constraints=cons)
    psystem = pallas_fem.with_pallas(
        system, dtype=DTYPE, interpret=True, banded=True
    )
    assert psystem.pallas.banded is not None

    rng = np.random.default_rng(11)
    n = nodes.shape[0]
    st = dict(
        x_prev=jnp.asarray(nodes, DTYPE), u_prev=jnp.zeros((n, 3), DTYPE),
        v=jnp.asarray(rng.normal(size=(n, 3)) * 0.1, DTYPE),
        v_prev=jnp.asarray(rng.normal(size=(n, 3)) * 0.1, DTYPE),
        p=jnp.asarray(rng.normal(size=(n, 3)), DTYPE),
    )
    lam_dual = jnp.asarray(rng.normal(size=(cons.n_rows,)), DTYPE)
    f_ext = jnp.asarray(rng.normal(size=(n, 3)), DTYPE)
    dt, rho = DTYPE(1e-3), DTYPE(1e6)

    g_ref, hvp_ref = jax.linearize(
        lambda vv: grad_L(vv, st["x_prev"], st["v_prev"], lam_dual, f_ext,
                          dt, rho, system, u_prev=st["u_prev"]),
        st["v"],
    )

    # The production pin_terms split (mirrors newton._newton_inner).
    from tlfea.elements.assembly import node_ref

    x_ref = node_ref(psystem.elems)
    c0 = (cons._apply_j(x_ref) - cons.b).astype(DTYPE)
    aff = dt * cons.apply_jt(lam_dual + rho * c0, n)
    lin = lambda p: dt * rho * cons.apply_jt(cons._apply_j(p), n)
    g_b, hvp_b = pallas_banded.g_and_hvp_banded(
        st["v"], st["x_prev"], st["v_prev"], lam_dual, f_ext, dt, rho,
        psystem, u_prev=st["u_prev"], pin_terms=(aff, lin),
    )
    assert _rel(g_b, g_ref) < 1e-11
    assert _rel(hvp_b(st["p"]), hvp_ref(st["p"])) < 1e-11


@pytest.mark.heavy
def test_banded_blocks_kernel_matches_xla():
    """Block-Jacobi assembly through the banded kernel (6-channel SYM6
    scatter) == the XLA-path `precond_blocks` (r4: the XLA `.at[conn].add`
    assembly was device-traced at 21 ms per refresh at 100k elems; the
    banded kernel replaces it on the production refresh path)."""
    from tlfea.solvers.common import precond_blocks

    nodes, system, fixed = _problem(8, 2, 2)
    psystem = pallas_fem.with_pallas(
        system, dtype=DTYPE, interpret=True, banded=True
    )
    assert psystem.pallas.banded.blocks_fn is not None
    st = _rand_state(nodes, fixed)
    dt, rho = DTYPE(1e-3), DTYPE(1e6)

    # XLA reference on the UN-banded system (banded gate off).
    b_ref = precond_blocks(st["v"], st["x_prev"], dt, rho, system,
                           u_prev=st["u_prev"])
    b_banded = precond_blocks(st["v"], st["x_prev"], dt, rho, psystem,
                              u_prev=st["u_prev"])
    assert b_banded.shape == b_ref.shape == (nodes.shape[0], 3, 3)
    assert _rel(b_banded, b_ref) < 1e-12
    # Symmetry (packed-symmetric channels unpacked to full blocks).
    assert _rel(b_banded, jnp.swapaxes(b_banded, -1, -2)) < 1e-12


@pytest.mark.heavy
def test_resident_inner_matches_newton_inner():
    """Single-kernel resident Newton solve (ops/pallas_resident) == the
    composed banded path: same algebra cores, CG recurrences, EW forcing —
    run a full implicit step both ways (the resident gate fires for this
    single-block mesh; monkeypatched off for the reference) and compare
    trajectories and iteration counts."""
    from tlfea.ops import pallas_resident
    from tlfea.solvers import newton

    nodes, system, fixed = _problem(8, 2, 2)
    psys = pallas_fem.with_pallas(
        system, dtype=DTYPE, interpret=True, banded=True
    )
    bnd = psys.pallas.banded
    assert bnd.n_blocks == 1 and bnd.n_wins == 1
    from tlfea.elements.assembly import lumped_mass as _lm
    from tlfea.solvers.common import StepState

    f_ext = jnp.zeros((nodes.shape[0], 3), DTYPE).at[:, 2].add(
        _lm(psys.elems) * DTYPE(-9.81)
    )
    state = StepState.rest(psys, nodes.astype(DTYPE))
    params = newton.NewtonParams(
        dt=DTYPE(1e-3), rho=DTYPE(1e6), inner_atol=DTYPE(1e-6),
        inner_rtol=DTYPE(0.0), outer_tol=DTYPE(0.0), max_outer=1,
        max_inner=4, cg_rtol=DTYPE(1e-3), cg_max_iter=40,
        ew_eta_max=DTYPE(0.5),
    )
    assert pallas_resident.eligible(bnd, True, None)
    s_res, d_res = newton._step(psys, state, params, f_ext,
                                bdata=newton._banded_data(psys))

    orig = pallas_resident.eligible
    try:
        pallas_resident.eligible = lambda *a, **k: False
        s_ref, d_ref = newton._step(psys, state, params, f_ext,
                                    bdata=newton._banded_data(psys))
    finally:
        pallas_resident.eligible = orig

    assert _rel(s_res.x, s_ref.x) < 1e-10
    assert _rel(s_res.v, s_ref.v) < 1e-8
    assert int(d_res["newton_iters"]) == int(d_ref["newton_iters"])
    # CG totals may differ by a knife-edge iteration (different summation
    # order in the in-kernel dots); they must agree closely.
    assert abs(int(d_res["cg_iters"]) - int(d_ref["cg_iters"])) <= 2
