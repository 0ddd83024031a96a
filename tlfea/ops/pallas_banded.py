"""Banded fused gather/kernel/scatter Pallas kernels for the Newton hot loop.

Parity: accelerates the same physics as `pallas_fem.g_and_hvp` (the
reference's per-iteration element force/Hessian kernels,
`lib_src/solvers/SyncedNewton.cu:1038-1120`); no new behavior.

Why: the flat Pallas path costs ~5 XLA ops per CG Hessian-vector product
(row gather -> layout transpose -> kernel -> transpose -> scatter-add), each
with a fixed ~0.3-0.75 ms floor that scales linearly past ~100k rows
(PERF_NOTES "Measured costs"). Here the gather and scatter happen INSIDE
the element kernel, built on the TPU's tile-local dynamic shuffle
(`tpu.dynamic_gather`, reachable as `jnp.take_along_axis` on shape-matched
(8,128) tiles — measured ~1 op):

- Elements are sorted by minimum node index; a block of 1024 elements then
  touches a window of `W` node rows. Windows ride into VMEM as ROW-WRAPPED
  tables (2W/128, 128) — entry [r, q] = value of node wb*W + r*128 + q — so
  a whole window costs ~tens of KB of VMEM regardless of W.
- In-window gather (per slot): split each connectivity tile into table row
  r = cl >> 7 and lane q = cl & 127; one-hot over the slot's K table rows
  (host-prefetched base, K = static per mesh): broadcast table row,
  lane-shuffle by q, select where r matches. ~K*13 vector ops per slot.
- In-window scatter: host-precomputed STATIC inverse-shuffle items. Each
  item holds, for one (slot, subrow) source row and one output row-tile, an
  (8,128) inverse index tile (source lane per output position, -1 = empty).
  The kernel broadcasts the source row, lane-shuffles it into output
  positions, and mask-adds — collisions become extra passes at the host.
  ~#incidences/128 items per block, 3 shuffles each.
- Window outputs overlap between consecutive blocks: each grid step writes
  its (3, 2W/128, 128) window at block index wb[b] (non-decreasing ->
  Pallas keeps the block resident across revisits and accumulates; a
  prefetched first-visit flag zero-inits it). The XLA combine adds each
  window's carry half into the next window's own half.

The element algebra is shared with the flat kernels (`pallas_fem._hv_fe`,
`_primal_fe`) — one implementation of the physics, two memory movements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tlfea.ops.pallas_fem import (
    EBLK, LANE, PALLAS_OK, SUB, _hv_fe, _primal_fe, tile_material,
)

if PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["BandedHandle", "NotBandedError", "build_banded", "g_and_hvp_banded"]

ROW = LANE  # nodes per window-table row
SC_U = 4  # scatter-loop unroll: independent accumulator chains (ILP)


class NotBandedError(Exception):
    """Mesh numbering is not banded enough for the windowed kernels."""


class BandedHandle:
    """Static (identity-hashed) bundle of banded-layout kernels + metadata.

    Lives on `PallasContrib.banded`; all device arrays it holds are closure
    constants of the jitted kernels.
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _blk_tiles(a, E, E_pad, dtype):
    """(E, rows...) -> (n_blocks, R*SUB, LANE) per-block CONTIGUOUS tiles:
    block b, row f*SUB + s, lane l = feature f of element b*EBLK + s*LANE + l.

    One contiguous DMA segment per grid step. The previous layout shared the
    flat kernels' (R, E_pad//LANE, LANE) tables and block-sliced the MIDDLE
    axis, which DMAs R strided 4 KB segments per block — measured as the
    dominant per-block cost once the shuffle loops were unrolled (the Hv
    kernel's touch-only DMA floor was ~80% of its total time at 100k)."""
    flat = np.asarray(a, dtype=dtype).reshape(E, -1)
    R = flat.shape[1]
    out = np.zeros((E_pad, R), dtype=dtype)
    out[:E] = flat
    nb = E_pad // EBLK
    return np.ascontiguousarray(
        out.reshape(nb, SUB, LANE, R).transpose(0, 3, 1, 2)
    ).reshape(nb, R * SUB, LANE)


def _build_combine(cl, E, n_blocks, S):
    """Host-scheduled in-row duplicate reduction (binary combine tree).

    Two elements in the same source row (block, slot a, subrow s) sharing a
    target node would force collision-rank item passes in the scatter (each
    rank is a full extra (8,128) shuffle item for <=128 lanes). Instead the
    kernel merges them IN the source row first: pass p adds lane
    comb[p, row, lane] into lane (-1 = no-op), a host-built binary tree per
    duplicate group, so only the group's first lane (the representative)
    carries the sum and enters the scatter schedule. Measured at 100k elems
    this cuts items/block 364 -> 146 with P=3 passes (max group size 6).

    Returns (comb (n_blocks, P*S*SUB, ROW) int32 or None, rep (E_pad, S)
    bool, P).
    """
    E_pad = n_blocks * EBLK
    rep = np.ones((E_pad, S), bool)
    rep[E:] = False  # padding lanes never scatter
    combs = []  # (p, b, a, s, lane) -> src lane
    P = 0
    for b in range(n_blocks):
        nreal = min(EBLK, E - b * EBLK)
        for a in range(S):
            w = cl[b * EBLK:b * EBLK + nreal, a]
            for s in range(SUB):
                seg = w[s * LANE:(s + 1) * LANE]
                if seg.size == 0:
                    continue
                order = np.argsort(seg, kind="stable")
                ws = seg[order]
                grp_new = np.ones(ws.size, bool)
                grp_new[1:] = ws[1:] != ws[:-1]
                starts = np.nonzero(grp_new)[0]
                sizes = np.diff(np.append(starts, ws.size))
                for st, m in zip(starts, sizes):
                    if m < 2:
                        continue
                    lanes = np.sort(order[st:st + m])
                    rep[b * EBLK + s * LANE + lanes[1:], a] = False
                    p = 0
                    stride = 1
                    while stride < m:
                        for i in range(0, m - stride, 2 * stride):
                            combs.append(
                                (p, b, a, s, lanes[i], lanes[i + stride])
                            )
                        p += 1
                        stride *= 2
                    P = max(P, p)
    if P == 0:
        return None, rep, 0
    comb = np.full((n_blocks, P, S, SUB, ROW), -1, np.int32)
    for p, b, a, s, dst, src in combs:
        comb[b, p, a, s, dst] = src
    return comb.reshape(n_blocks, P * S * SUB, ROW), rep, P


def _build_scatter_items(cl, E, n_blocks, S, RT, rep=None):
    """Static inverse-shuffle scatter schedule (vectorized host build).

    For every real (element lane, slot) pair the target window position is
    w = cl; tuples (block, target row-tile rt, source row fid = a*8 + s,
    collision rank) become items; each item is an (8,128) int32 tile mapping
    output (sublane, lane) -> source lane (-1 empty).

    rep: optional (E_pad, S) bool — only representative tuples (duplicate
    groups pre-combined in-row, `_build_combine`) enter the schedule, so
    every item is rank-free.

    Returns (inv (n_blocks, I_cap*8, 128) int32, fid (n_blocks, I_cap) int32,
    ranges (n_blocks, RT, 2) int32 [start, count], I_cap).
    """
    e_idx = np.arange(n_blocks * EBLK)
    valid = e_idx < E
    blk = e_idx // EBLK
    sub = (e_idx % EBLK) // LANE  # subrow s
    lane = e_idx % LANE

    # Flatten all (element, slot) tuples.
    valid_t = np.repeat(valid, S)
    if rep is not None:
        valid_t = valid_t & rep.reshape(-1)
    b_t = np.repeat(blk, S)[valid_t]
    s_t = np.repeat(sub, S)[valid_t]
    l_t = np.repeat(lane, S)[valid_t]
    a_t = np.tile(np.arange(S), n_blocks * EBLK)[valid_t]
    w_t = cl[e_idx.repeat(S)[valid_t], a_t]

    fid_t = a_t * SUB + s_t
    R_t = w_t // ROW
    rt_t = R_t // SUB
    sr_t = R_t % SUB
    pos_t = w_t % ROW

    # Collision rank: occurrence index among tuples sharing
    # (block, rt, fid, sr, pos) — each rank needs its own pass.
    key = (((b_t * RT + rt_t) * (S * SUB) + fid_t) * SUB + sr_t) * ROW + pos_t
    order = np.argsort(key, kind="stable")
    ks = key[order]
    newgrp = np.ones(ks.size, bool)
    newgrp[1:] = ks[1:] != ks[:-1]
    grp_start = np.nonzero(newgrp)[0]
    rank_sorted = np.arange(ks.size) - np.repeat(
        grp_start, np.diff(np.append(grp_start, ks.size))
    )
    rank = np.empty_like(rank_sorted)
    rank[order] = rank_sorted

    # Item identity: (block, rt, fid, rank) — all its tuples share one
    # source row and one output tile with unique (sr, pos) targets.
    item_key = ((b_t * RT + rt_t) * (S * SUB) + fid_t) * (
        int(rank.max()) + 1 if rank.size else 1
    ) + rank
    uniq, inv_map = np.unique(item_key, return_inverse=True)
    n_items = uniq.size
    it_b = np.zeros(n_items, np.int64)
    it_rt = np.zeros(n_items, np.int64)
    it_fid = np.zeros(n_items, np.int64)
    it_b[inv_map] = b_t
    it_rt[inv_map] = rt_t
    it_fid[inv_map] = fid_t

    # Order items by (block, rt) for the kernel's per-rt loops.
    it_order = np.argsort(it_b * RT + it_rt, kind="stable")
    it_rank = np.empty(n_items, np.int64)
    it_rank[it_order] = np.arange(n_items)
    # Per-block local item index.
    blk_of_sorted = it_b[it_order]
    blk_first = np.searchsorted(blk_of_sorted, np.arange(n_blocks))
    local = np.arange(n_items) - blk_first[blk_of_sorted]
    I_cap = int(local.max()) + 1 if n_items else 1

    inv = np.full((n_blocks, I_cap, SUB, ROW), -1, np.int32)
    fid_arr = np.zeros((n_blocks, I_cap), np.int32)
    fid_arr[blk_of_sorted, local] = it_fid[it_order].astype(np.int32)
    # Scatter tuple lanes into their item tiles.
    t_item_local = local[it_rank[inv_map]]
    t_item_blk = blk_of_sorted[it_rank[inv_map]]
    inv[t_item_blk, t_item_local, sr_t, pos_t] = l_t.astype(np.int32)

    ranges = np.zeros((n_blocks, RT, 2), np.int32)
    rt_sorted = it_rt[it_order]
    brt = blk_of_sorted * RT + rt_sorted
    starts = np.searchsorted(brt, np.arange(n_blocks * RT))
    ends = np.searchsorted(brt, np.arange(n_blocks * RT) + 1)
    ranges[:, :, 0] = (starts - blk_first.repeat(RT)).reshape(n_blocks, RT)
    ranges[:, :, 1] = (ends - starts).reshape(n_blocks, RT)

    inv, fid_arr, ranges, I_cap = _pad_items(inv, fid_arr, ranges, SC_U)

    return (
        inv.reshape(n_blocks, I_cap * SUB, ROW),
        fid_arr,
        ranges,
        I_cap,
    )


def _pad_items(inv, fid_arr, ranges, U):
    """Pad every (block, rt) item count to a multiple of U with inert items
    (inv = -1 everywhere, fid = 0), so the kernel's scatter loop can run U
    independent accumulator chains per iteration. The per-item dependency
    chain (SMEM fid -> dynamic fes slice -> lane shuffle -> mask-add into
    the carried accumulator) is otherwise fully serial — measured as the
    dominant per-block cost at 100k elems."""
    n_blocks, I_cap = fid_arr.shape
    counts = ranges[:, :, 1].astype(np.int64)
    counts_p = -(-counts // U) * U
    starts_p = np.zeros_like(counts_p)
    starts_p[:, 1:] = np.cumsum(counts_p[:, :-1], axis=1)
    I_cap_p = max(int(counts_p.sum(axis=1).max()) if n_blocks else U, U)

    inv_p = np.full((n_blocks, I_cap_p) + inv.shape[2:], -1, np.int32)
    fid_p = np.zeros((n_blocks, I_cap_p), np.int32)
    # Old -> new local index: new = starts_p + (old - starts), per (b, rt).
    b_i, rt_i = np.nonzero(counts)
    for b, rt in zip(b_i, rt_i):
        s, c = ranges[b, rt, 0], counts[b, rt]
        sp = starts_p[b, rt]
        inv_p[b, sp:sp + c] = inv[b, s:s + c]
        fid_p[b, sp:sp + c] = fid_arr[b, s:s + c]

    ranges_p = np.zeros_like(ranges)
    ranges_p[:, :, 0] = starts_p
    ranges_p[:, :, 1] = counts_p
    return inv_p, fid_p, ranges_p, I_cap_p


def sort_elements(elems):
    """Return a copy of the batch with elements sorted by min node index
    (identity-safe). Element order is semantically irrelevant (assembly is
    a commutative scatter-add); sorting up front lets the banded kernels
    SHARE the canonical static tables instead of holding permuted copies —
    at 100k elems a second copy is ~100 MB of closure constants, which
    alone can overflow the axon remote-compile request (HTTP 413)."""
    conn = np.asarray(elems.conn)
    order = np.argsort(conn.min(axis=1), kind="stable")
    if (order == np.arange(order.size)).all():
        return elems
    o = jnp.asarray(order)
    return elems.replace(
        conn=elems.conn[o], grad_N=elems.grad_N[o], dV=elems.dV[o],
        mass_elem=elems.mass_elem[o], xe_ref=elems.xe_ref[o],
    )


def build_banded(elems, material, dtype=np.float32, interpret=False,
                 w_cap=65536, force_w=None, tpd=None, hv_dtype=None):
    """Host-side banding analysis + kernel construction.

    Sorts elements by min node, derives the window width W (multiple of
    1024 so window tables tile cleanly) from the worst per-block node span,
    and precomputes the gather bases / scatter shuffle schedule. Raises
    NotBandedError when infeasible — callers fall back to the flat path.
    A bandwidth-reducing node order (`tlfea.utils.reorder.rcm_order`)
    shrinks W and the one-hot depth K but is not required.

    tpd: unused (kept for API compat) — the banded kernels now hold their
    own per-block contiguous table copies (see _blk_tiles); sharing the
    flat layout cost R strided DMA segments per block.

    hv_dtype: optional reduced storage dtype ("bfloat16") for the Hv
    kernel's static tables (gN/Me) and the prep cache. Primal tables stay
    `dtype` (converged physics exact); only the CG operator rounds — see
    the comment at the `hv_is_reduced` block.
    """
    if not PALLAS_OK:  # pragma: no cover
        raise NotBandedError("pallas unavailable")

    conn = np.asarray(elems.conn)
    E, S = conn.shape
    n = int(elems.n_coef)
    order = np.argsort(conn.min(axis=1), kind="stable").astype(np.int32)
    conn_s = conn[order].astype(np.int64)
    n_blocks = -(-E // EBLK)
    E_pad = n_blocks * EBLK

    lo = np.zeros(n_blocks, np.int64)
    hi = np.zeros(n_blocks, np.int64)
    for b in range(n_blocks):
        blk = conn_s[b * EBLK:(b + 1) * EBLK]
        lo[b] = blk.min()
        hi[b] = blk.max()
    span = int((hi - lo).max()) + 1
    # W multiple of SUB*ROW so the window table splits into whole row-tiles.
    unit = SUB * ROW
    W = int(force_w) if force_w else -(-span // unit) * unit
    if span > W:
        raise NotBandedError(f"forced W={W} < required span {span}")
    if W > w_cap:
        raise NotBandedError(
            f"node bandwidth {span} exceeds window cap {w_cap}"
        )
    wb = (lo // W).astype(np.int64)
    assert (hi < (wb + 2) * W).all()
    n_wins = max(int(wb.max()) + 1, -(-n // W))
    WR = W // ROW          # own-half table rows per window
    WR2 = 2 * WR           # full window table rows
    RT = WR2 // SUB        # output row-tiles per window

    # Element-local window indices in [0, 2W). Padding lanes replicate the
    # last real element (zero static data -> zero contributions); they are
    # EXCLUDED from the scatter schedule so they never consume passes.
    cl = np.empty((E_pad, S), np.int64)
    cl[:E] = conn_s - (wb.repeat(EBLK)[:E, None] * W)
    if E_pad > E:
        cl[E:] = cl[E - 1]
    assert cl.min() >= 0 and cl.max() < 2 * W

    # Gather bases: per (block, slot) the window-table row range of the
    # whole element tile; K = static one-hot depth (global max).
    cl4 = cl.reshape(n_blocks, EBLK, S)
    r4 = cl4 // ROW
    r0 = r4.min(axis=1).astype(np.int32)  # (n_blocks, S)
    K = int((r4.max(axis=1) - r0).max()) + 1

    comb_np, rep_np, P_comb = _build_combine(cl, E, n_blocks, S)
    inv_np, fid_np, ranges_np, I_cap = _build_scatter_items(
        cl, E, n_blocks, S, RT, rep=rep_np
    )

    mops = tile_material(material)

    # VMEM feasibility: a mesh can pass the w_cap span check yet blow the
    # ~16 MB scoped-VMEM budget per grid step (measured: the dragon item-
    # drop mesh in natural TetGen order builds W=26k / I_cap~1.2k and the
    # primal kernel OOMs AT COMPILE TIME with a 32.6 MB stack). Estimate
    # the primal step's resident blocks (x2 for pipeline double-buffering)
    # and refuse — callers fall back to the flat Pallas path, and a
    # bandwidth-reducing node order (utils.reorder) restores eligibility.
    Q_ = int(np.asarray(elems.grad_N).shape[1])
    PR_ = Q_ * mops.prep_rows + 1  # padded
    blk_bytes = ROW * SUB * 4 * (
        (9 + 3) * WR2 // SUB + PR_ + S + Q_ * S * 3 + Q_ + S * S
    ) + I_cap * SUB * ROW + P_comb * S * SUB * ROW * 2
    vmem_est = 2 * blk_bytes + 3 * S * SUB * ROW * 4  # + fes scratch
    # Budget 8 MB: the estimate undercounts Mosaic's stack (gather-loop
    # temporaries scale with K; measured 3x on the dragon mesh).
    if vmem_est > 8 * 1024 * 1024 or K > 64:
        raise NotBandedError(
            f"per-block VMEM estimate {vmem_est / 1e6:.1f} MB (W={W}, "
            f"K={K}, I_cap={I_cap}) exceeds the ~16 MB scoped budget — "
            "node ordering not banded enough (apply utils.reorder)"
        )

    first = np.ones(n_blocks, np.int32)
    first[1:] = (wb[1:] != wb[:-1]).astype(np.int32)
    visited = np.zeros(n_wins, bool)
    visited[np.unique(wb)] = True

    # Consistent-mass diagonal, assembled ON HOST once at build time: it is
    # constant element data, yet `assembly.mass_diag`'s 1M-row XLA
    # scatter-add was device-traced at 6.9 ms per block-Jacobi refresh at
    # 100k elems (the data never changes between refreshes). ~0.6 MB at
    # 146k nodes — fine as a closure constant.
    diag_np = np.einsum("eaa->ea", np.asarray(elems.mass_elem))
    md_np = np.zeros(n, diag_np.dtype)
    np.add.at(md_np, conn.reshape(-1), diag_np.reshape(-1))
    md = jnp.asarray(md_np)

    # Static element tables: per-block CONTIGUOUS layout (see _blk_tiles) —
    # independent of the flat kernels' tables (they enter jits as arguments,
    # so the old shared-copy closure-size constraint no longer applies).
    gN_T = jnp.asarray(_blk_tiles(np.asarray(elems.grad_N)[order], E, E_pad, dtype))
    dV_T = jnp.asarray(_blk_tiles(np.asarray(elems.dV)[order], E, E_pad, dtype))
    Me_T = jnp.asarray(_blk_tiles(np.asarray(elems.mass_elem)[order], E, E_pad, dtype))
    cl_T = jnp.asarray(
        np.ascontiguousarray(
            cl.reshape(n_blocks, SUB, LANE, S).transpose(0, 3, 1, 2)
        ).reshape(n_blocks, S * SUB, LANE).astype(np.int32)
    )
    # Scatter shuffle indices are source LANES (-1..127): int8 exact, 1/4
    # the DMA bytes of int32 (688 KB/block at 100k — the largest table).
    # Sublane alignment: I_cap*SUB % 32 == 0 (I_cap is padded to SC_U=4).
    assert inv_np.max() < ROW
    inv_T = jnp.asarray(inv_np.astype(np.int8))
    # Scalar-prefetch tables ride in SMEM, where every trailing row pads to
    # 512 B and middle dims to multiples of 8: shaped (99,12,2) `ranges`
    # alone padded 9.5 KB -> 792 KB at 100k elems and blew the 1 MB SMEM
    # budget (compile-time OOM). Flattened 1D they pad to ~nothing; kernels
    # index with static strides (I_cap, RT, S).
    fid_j = jnp.asarray(fid_np.reshape(-1))
    ranges_j = jnp.asarray(ranges_np.reshape(-1))
    wb_j = jnp.asarray(wb.astype(np.int32))
    first_j = jnp.asarray(first)
    r0_j = jnp.asarray(r0.reshape(-1))

    Q = int(np.asarray(elems.grad_N).shape[1])
    PR = Q * mops.prep_rows
    # Even row-group count so PR_pad*SUB is 16-aligned (bf16 tiling when
    # hv_dtype="bfloat16"; free in f32).
    PR_pad = PR + (PR % 2)

    phys = dict(Q=Q, S=S, mops=mops, tmask=elems.trans_mask)
    geom = dict(K=K, RT=RT, WR2=WR2, I_cap=I_cap, P_comb=P_comb)

    def _indb(b, *s):  # per-block data (items / element tables)
        return (b, 0, 0)

    def _indw(b, wb_r, *s):  # window-space blocks
        return (wb_r[b], 0, 0)

    def _bspec(rows, dt_=None):
        return pl.BlockSpec((1, rows * SUB, LANE), _indb)

    hv_body = partial(_hv_banded_body, **phys, **geom, PR=PR,
                      interp=interpret)
    primal_body = partial(_primal_banded_body, **phys, **geom,
                          interp=interpret)

    scratch = [pltpu.VMEM((3 * S * SUB, ROW), jnp.dtype(dtype))]

    # Large static tables travel as a PYTREE (`BandedHandle.data`): callers
    # inside jit must pass it through the jit boundary as an ARGUMENT
    # (newton threads system-derived `bdata`), because closure-captured
    # arrays ride the remote-compile request — the scatter schedule alone
    # is 100s of MB at 100k elems (HTTP 413). The prefetch scalars stay
    # closure constants (KBs).
    data = dict(inv=inv_T, cl=cl_T, gN=gN_T, dV=dV_T, Me=Me_T)
    comb_specs = []
    if P_comb:
        # Lane ids fit int16 (int8 needs 32-row alignment; P_comb*S*SUB is
        # only guaranteed a multiple of 16).
        data["comb"] = jnp.asarray(comb_np.astype(np.int16))
        comb_specs = [pl.BlockSpec((1, P_comb * S * SUB, ROW), _indb)]
    # Optional reduced-precision static tables for the Hv kernel ONLY: the
    # CG operator tolerates ~1e-3-relative table rounding (inexact-Newton:
    # the direction is solved to cg_rtol anyway and the PRIMAL gradient
    # stays f32-exact, so converged physics is unchanged — the perturbed
    # Hv stays symmetric/SPD because it is the exact Hessian of a slightly
    # perturbed element energy). Halves the gN/Me/prep DMA per Hv.
    hv_is_reduced = hv_dtype is not None and np.dtype(hv_dtype) != np.dtype(dtype)
    if hv_is_reduced:
        data["gNh"] = gN_T.astype(hv_dtype)
        data["Meh"] = Me_T.astype(hv_dtype)
    prep_dtype = np.dtype(hv_dtype) if hv_is_reduced else np.dtype(dtype)

    # Grid-parameterized call builders: `grid` is the number of element
    # blocks THIS call iterates (the full n_blocks single-device; a local
    # per-device slab under `tlfea.parallel.shard_banded`'s shard_map). The
    # prefetch tables (wb/first/r0/fid/ranges) arrive via `pre` so the
    # sharded path can pass device-LOCAL slices; out_shape stays the global
    # window count (every device owns a full window buffer, combined by
    # psum outside).
    def hv_call(pre, dt_arr, win3, prepT, data, grid=n_blocks):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dt (1,1)
                pl.BlockSpec((1, 3 * WR2, ROW), _indw),
                pl.BlockSpec((1, I_cap * SUB, ROW), _indb),
                *comb_specs,
                _bspec(S),            # cl
                _bspec(PR_pad),       # prep
                _bspec(Q * S * 3),    # gN
                _bspec(Q),            # dV
                _bspec(S * S),        # Me
            ],
            out_specs=pl.BlockSpec((1, 3 * WR2, ROW), _indw),
            scratch_shapes=scratch,
        )
        comb_in = (data["comb"],) if P_comb else ()
        gN_in = data["gNh"] if hv_is_reduced else data["gN"]
        Me_in = data["Meh"] if hv_is_reduced else data["Me"]
        return pl.pallas_call(
            hv_body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_wins, 3 * WR2, ROW), win3.dtype),
            interpret=interpret,
        )(pre["wb"], pre["first"], pre["r0"], pre["fid"], pre["ranges"],
          dt_arr, win3, data["inv"], *comb_in, data["cl"], prepT,
          gN_in, data["dV"], Me_in)

    def primal_call(pre, win9, data, grid=n_blocks):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 9 * WR2, ROW), _indw),
                pl.BlockSpec((1, I_cap * SUB, ROW), _indb),
                *comb_specs,
                _bspec(S),            # cl
                _bspec(Q * S * 3),    # gN
                _bspec(Q),            # dV
                _bspec(S * S),        # Me
            ],
            out_specs=[
                pl.BlockSpec((1, 3 * WR2, ROW), _indw),
                _bspec(PR_pad),
            ],
            scratch_shapes=scratch,
        )
        comb_in = (data["comb"],) if P_comb else ()
        return pl.pallas_call(
            primal_body,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_wins, 3 * WR2, ROW), win9.dtype),
                jax.ShapeDtypeStruct(
                    (grid, PR_pad * SUB, LANE), prep_dtype),
            ],
            interpret=interpret,
        )(pre["wb"], pre["first"], pre["r0"], pre["fid"], pre["ranges"],
          win9, data["inv"], *comb_in, data["cl"], data["gN"], data["dV"],
          data["Me"])

    # Block-Jacobi assembly kernel (SVK closed-form diag blocks — same gate
    # as pallas_fem.make_precond_blocks). 6 packed-symmetric channels
    # through the same window scatter schedule as the 3-channel force
    # kernels; caller combines windows and unpacks (see `blocks_banded`).
    from tlfea.materials import SVK as _SVK

    if isinstance(material, _SVK):
        blocks_body = partial(
            _blocks_banded_body, Q=Q, S=S, lam=float(material.lam),
            mu=float(material.mu), tmask=elems.trans_mask, **geom,
            interp=interpret,
        )

        def blocks_call(pre, win3, data, grid=n_blocks):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((1, 3 * WR2, ROW), _indw),
                    pl.BlockSpec((1, I_cap * SUB, ROW), _indb),
                    *comb_specs,
                    _bspec(S),            # cl
                    _bspec(Q * S * 3),    # gN
                    _bspec(Q),            # dV
                ],
                out_specs=pl.BlockSpec((1, 6 * WR2, ROW), _indw),
                scratch_shapes=[
                    pltpu.VMEM((6 * S * SUB, ROW), jnp.dtype(dtype))
                ],
            )
            comb_in = (data["comb"],) if P_comb else ()
            return pl.pallas_call(
                blocks_body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (n_wins, 6 * WR2, ROW), win3.dtype),
                interpret=interpret,
            )(pre["wb"], pre["first"], pre["r0"], pre["fid"], pre["ranges"],
              win3, data["inv"], *comb_in, data["cl"], data["gN"],
              data["dV"])
    else:
        blocks_call = None

    pre0 = dict(wb=wb_j, first=first_j, r0=r0_j, fid=fid_j, ranges=ranges_j)

    def hv_fn(dt_arr, win3, prepT, data):
        return hv_call(pre0, dt_arr, win3, prepT, data)

    def primal_fn(win9, data):
        return primal_call(pre0, win9, data)

    if blocks_call is not None:
        def blocks_fn(win3, data, _call=blocks_call):
            return _call(pre0, win3, data)
    else:
        blocks_fn = None

    return BandedHandle(
        hv_fn=hv_fn, primal_fn=primal_fn, data=data,
        blocks_fn=blocks_fn, blocks_call=blocks_call, md=md,
        hv_call=hv_call, primal_call=primal_call, pre=pre0,
        prep_dtype=prep_dtype, PR_pad=PR_pad, mops=mops,
        interpret=interpret,
        W=W, WR=WR, WR2=WR2, RT=RT, K=K, I_cap=I_cap, P_comb=P_comb,
        n_wins=n_wins, n_blocks=n_blocks, E=E, E_pad=E_pad, S=S, Q=Q,
        PR=PR, n=n, span=span, order=order,
        visited=jnp.asarray(visited.reshape(n_wins, 1, 1, 1)),
        # Host schedule (NumPy) — kept for tests/diagnostics.
        sched=dict(cl=cl, wb=wb, r0=r0, inv=inv_np, fid=fid_np,
                   ranges=ranges_np, first=first, comb=comb_np, rep=rep_np),
    )


# --------------------------------------------------------------------------
# Kernel bodies
# --------------------------------------------------------------------------


def _window_gather(b, win_ref, cl_ref, r0_r, S, n_chan, K, WR2, dtype,
                   interp=False):
    """Shuffle-table gather: pg[a][c] (8,128) element tiles.

    Per slot: r = cl >> log2(ROW) table row, q = cl & (ROW-1) lane; one-hot
    over the slot's K table rows, each: broadcast row -> lane-shuffle by q
    -> select where r matches. Channel c's table is win rows
    [c*WR2, (c+1)*WR2).

    interp: direct XLA gather instead of the one-hot loop — numerically
    identical (each output lane selects exactly one window value; no sums
    reorder), but K*S*n_chan unrolled one-hot rows (~2000 at production
    window widths: K tracks the BLOCK span, ~W/128 regardless of mesh)
    inline into the XLA module under interpret mode and blow CPU compile
    time from minutes to hours. Compiled-mode (TPU) always uses the
    one-hot path — Mosaic has no arbitrary-gather lowering.
    """
    if interp:
        pg = []
        for a in range(S):
            cl = cl_ref[0, pl.ds(a * SUB, SUB), :]
            acc = []
            for c in range(n_chan):
                flat = win_ref[0, c * WR2:(c + 1) * WR2, :].reshape(-1)
                acc.append(flat[cl].astype(dtype))
            pg.append(acc)
        return pg
    pg = []
    for a in range(S):
        cl = cl_ref[0, pl.ds(a * SUB, SUB), :]
        r = jax.lax.shift_right_logical(
            cl, jnp.asarray(ROW.bit_length() - 1, cl.dtype)
        )
        q = jnp.bitwise_and(cl, jnp.asarray(ROW - 1, cl.dtype))
        base = r0_r[b * S + a]  # flat (n_blocks*S,) — see build_banded
        acc = [jnp.zeros((SUB, LANE), dtype) for _ in range(n_chan)]
        for k in range(K):
            rk = base + k
            hit = r == rk
            for c in range(n_chan):
                row = win_ref[0, pl.ds(c * WR2 + rk, 1), :]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(row, (SUB, LANE)), q, axis=1
                )
                acc[c] = acc[c] + jnp.where(hit, g, 0.0)
        pg.append(acc)
    return pg


def _window_scatter(b, out_ref, fes_ref, inv_ref, fid_r, ranges_r,
                    S, RT, WR2, I_cap, dtype, comb_ref=None, P_comb=0,
                    n_chan=3):
    """Static inverse-shuffle scatter: per output row-tile, iterate its
    host-scheduled items; each broadcasts one fe source row, lane-shuffles
    it into output positions, and mask-adds (the n_chan channels share the
    index tile). Accumulates into the (revisited) window output block.

    fid_r/ranges_r are FLAT 1D SMEM tables (strides I_cap / RT*2): shaped,
    SMEM pads every trailing row to 512 B (1 MB budget blown at 100k).

    The loop body runs SC_U items per iteration on independent accumulator
    chains (host pads each (block, rt) count to a multiple of SC_U): a
    single carried accumulator serializes the SMEM-read -> dynamic-slice ->
    shuffle -> mask-add chain, which dominated per-block time at 100k."""
    FR = S * SUB  # fe scratch rows per channel

    # In-row duplicate combine (see _build_combine): P_comb tree passes
    # merge same-target lanes inside each source row so every scheduled
    # item below is rank-free (measured 2.5x fewer items at 100k elems).
    for p in range(P_comb):
        for a in range(S):
            # int16 table (see build_banded); shuffle indices need int32.
            cb = comb_ref[0, pl.ds((p * S + a) * SUB, SUB), :].astype(jnp.int32)
            ok = cb >= 0
            qi = jnp.where(ok, cb, 0)
            for c in range(n_chan):
                rows = fes_ref[pl.ds(c * FR + a * SUB, SUB), :]
                sh = jnp.take_along_axis(rows, qi, axis=1)
                fes_ref[pl.ds(c * FR + a * SUB, SUB), :] = (
                    rows + jnp.where(ok, sh, 0.0)
                )

    for rt in range(RT):
        start = ranges_r[(b * RT + rt) * 2]
        count = ranges_r[(b * RT + rt) * 2 + 1]  # multiple of SC_U

        def body(j, acc):
            out = list(acc)
            for u in range(SC_U):
                i = j * SC_U + u
                fid = fid_r[b * I_cap + i]
                # int8 table (see build_banded); shuffles need int32.
                idx = inv_ref[0, pl.ds(i * SUB, SUB), :].astype(jnp.int32)
                ok = idx >= 0
                qi = jnp.where(ok, idx, 0)
                for c in range(n_chan):
                    src = fes_ref[pl.ds(c * FR + fid, 1), :]
                    sh = jnp.take_along_axis(
                        jnp.broadcast_to(src, (SUB, ROW)), qi, axis=1
                    )
                    out[u * n_chan + c] = (
                        out[u * n_chan + c] + jnp.where(ok, sh, 0.0)
                    )
            return tuple(out)

        zero = jnp.zeros((SUB, ROW), dtype)
        acc = jax.lax.fori_loop(
            start // SC_U, (start + count) // SC_U, body,
            (zero,) * (n_chan * SC_U)
        )
        for c in range(n_chan):
            tot = acc[c]
            for u in range(1, SC_U):
                tot = tot + acc[u * n_chan + c]
            out_ref[0, pl.ds(c * WR2 + rt * SUB, SUB), :] += tot


def _store_fe(fes_ref, fe, S, n_chan=3):
    for c in range(n_chan):
        for a in range(S):
            fes_ref[(c * S + a) * SUB:(c * S + a + 1) * SUB, :] = fe[a][c]


def _hv_banded_body(
    wb_r, first_r, r0_r, fid_r, ranges_r,
    dt_ref, win_ref, inv_ref, *rest,
    Q, S, mops, tmask, PR, K, RT, WR2, I_cap, P_comb, interp=False,
):
    if P_comb:
        (comb_ref, cl_ref, prep_ref, gN_ref, dV_ref, Me_ref,
         out_ref, fes_ref) = rest
    else:
        comb_ref = None
        cl_ref, prep_ref, gN_ref, dV_ref, Me_ref, out_ref, fes_ref = rest
    b = pl.program_id(0)
    dt = dt_ref[0, 0]

    @pl.when(first_r[b] == 1)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    pg = _window_gather(b, win_ref, cl_ref, r0_r, S, 3, K, WR2,
                        win_ref.dtype, interp=interp)
    # Row-group reads from the per-block contiguous tables (_blk_tiles).
    # Reduced-precision tables (hv_dtype) promote to the window dtype at
    # first use — compute stays in the working dtype.
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
    _window_scatter(b, out_ref, fes_ref, inv_ref, fid_r, ranges_r,
                    S, RT, WR2, I_cap, win_ref.dtype,
                    comb_ref=comb_ref, P_comb=P_comb)


def _primal_banded_body(
    wb_r, first_r, r0_r, fid_r, ranges_r,
    win_ref, inv_ref, *rest,
    Q, S, mops, tmask, K, RT, WR2, I_cap, P_comb, interp=False,
):
    if P_comb:
        (comb_ref, cl_ref, gN_ref, dV_ref, Me_ref,
         out_ref, prep_ref, fes_ref) = rest
    else:
        comb_ref = None
        cl_ref, gN_ref, dV_ref, Me_ref, out_ref, prep_ref, fes_ref = rest
    b = pl.program_id(0)

    @pl.when(first_r[b] == 1)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    pu = _window_gather(b, win_ref, cl_ref, r0_r, S, 9, K, WR2,
                        win_ref.dtype, interp=interp)

    def prep_write(row, tile):
        # prep cache may be stored reduced (hv_dtype) — rounds at write.
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
    _window_scatter(b, out_ref, fes_ref, inv_ref, fid_r, ranges_r,
                    S, RT, WR2, I_cap, win_ref.dtype,
                    comb_ref=comb_ref, P_comb=P_comb)


def _blocks_banded_body(
    wb_r, first_r, r0_r, fid_r, ranges_r,
    win_ref, inv_ref, *rest,
    Q, S, lam, mu, tmask, K, RT, WR2, I_cap, P_comb, interp=False,
):
    """Block-Jacobi assembly kernel: in-window gather of u, per-(elem,node)
    SVK diagonal tangent blocks (packed-symmetric, 6 channels), in-window
    scatter. Replaces the XLA row-granular `.at[conn].add` in
    `solvers.common.precond_blocks` — a device trace measured that
    scatter-add at 21 ms per refresh at 100k elems (144.8k nodes), the
    single largest op in the production rollout profile."""
    if P_comb:
        comb_ref, cl_ref, gN_ref, dV_ref, out_ref, fes_ref = rest
    else:
        comb_ref = None
        cl_ref, gN_ref, dV_ref, out_ref, fes_ref = rest
    b = pl.program_id(0)

    @pl.when(first_r[b] == 1)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    pu = _window_gather(b, win_ref, cl_ref, r0_r, S, 3, K, WR2,
                        win_ref.dtype, interp=interp)
    from tlfea.ops.pallas_fem import _precond_fe

    fe = _precond_fe(
        lambda a, c: pu[a][c],
        lambda q, a, j: gN_ref[0, pl.ds(((q * S + a) * 3 + j) * SUB, SUB), :],
        lambda q: dV_ref[0, pl.ds(q * SUB, SUB), :],
        Q=Q, S=S, lam=lam, mu=mu, tmask=tmask,
    )
    _store_fe(fes_ref, fe, S, n_chan=6)
    _window_scatter(b, out_ref, fes_ref, inv_ref, fid_r, ranges_r,
                    S, RT, WR2, I_cap, win_ref.dtype,
                    comb_ref=comb_ref, P_comb=P_comb, n_chan=6)


# --------------------------------------------------------------------------
# XLA-side window plumbing + solver entry
# --------------------------------------------------------------------------


def to_windows(x, bnd):
    """(n, C) node array -> (n_wins, C*WR2, 128) overlapped row-wrapped
    window tables: window i, channel c, table row r, lane q = node value at
    row i*W + r*128 + q."""
    C = x.shape[1]
    total = (bnd.n_wins + 1) * bnd.W
    xp = jnp.pad(x, ((0, total - x.shape[0]), (0, 0)))
    xw = xp.reshape(bnd.n_wins + 1, bnd.WR, ROW, C)
    xw2 = jnp.concatenate([xw[:-1], xw[1:]], axis=1)  # (n_wins, WR2, ROW, C)
    return jnp.transpose(xw2, (0, 3, 1, 2)).reshape(
        bnd.n_wins, C * bnd.WR2, ROW
    )


def from_windows(outw, bnd, C=3):
    """Combine the kernel's overlapped window outputs into an (n, C) node
    array: own halves in place, carry halves shifted one window down.
    Never-visited windows hold uninitialized device memory — mask with
    `where` (multiplying could propagate NaNs)."""
    o = outw.reshape(bnd.n_wins, C, bnd.WR2, ROW)
    o = jnp.where(bnd.visited, o, 0.0)
    o = jnp.transpose(o, (0, 2, 3, 1))  # (n_wins, WR2, ROW, C)
    own = o[:, :bnd.WR].reshape(-1, C)
    carry = o[:, bnd.WR:].reshape(-1, C)
    res = jnp.pad(own, ((0, bnd.W), (0, 0))) + jnp.pad(
        carry, ((bnd.W, 0), (0, 0))
    )
    return res[:bnd.n]


def blocks_banded(u, bnd, bdata=None):
    """Scattered per-node SVK tangent blocks via the banded kernel:
    (n, 3) displacements -> (n, 6) packed-symmetric block sums (SYM6
    order, unweighted by dt — `solvers.common.precond_blocks` applies the
    dt factor, unpacks, and adds mass/viscous/constraint terms).

    Replaces the XLA gather + `.at[conn].add` assembly (measured 21 ms per
    refresh at 100k elems vs ~1 ms for this kernel — the device-trace
    finding that motivated it). bdata: the handle's table pytree threaded
    through the enclosing jit as an argument (see newton `_banded_data`).
    """
    if bnd.blocks_fn is None:
        raise ValueError("banded blocks kernel unavailable (non-SVK material)")
    win3 = to_windows(u, bnd)
    outw = bnd.blocks_fn(win3, bnd.data if bdata is None else bdata)
    return from_windows(outw, bnd, C=6)


def g_and_hvp_banded(v, x_prev, v_prev, lam_dual, f_ext, dt, rho, system,
                     u_prev=None, bdata=None, pin_terms=None):
    """ALM gradient + Hessian-vector operator via the banded fused kernels:
    the primal pass is ONE kernel (in-window gather of [u|v|dv], element
    algebra, in-window scatter, per-QP Hv prep), and each CG Hv is ONE
    kernel + the window reshapes — no row-granular XLA ops anywhere.

    Matches `pallas_fem.g_and_hvp` exactly (same shared algebra cores);
    FixedCoefs (or no) constraints, working-dtype accumulation only.

    bdata: the handle's `data` pytree threaded through the enclosing jit as
    an ARGUMENT (see newton.make_step) — without it the tables become jaxpr
    constants, which overflows the remote-compile request at 100k elems.

    pin_terms: optional (pin_aff (n,3), pin_lin (n,1)) DENSE pin-constraint
    fields precomputed OUTSIDE the solver's while_loop nest (see
    newton._newton_inner), with
        pin_aff = dt * (lam_dense - rho * tgt_dense)
        pin_lin = dt * rho * pinmask
    so the ALM pin gradient is the all-dense `pin_aff + pin_lin * u` and
    the Hv pin term `dt * pin_lin * p`. REQUIRED under `lax.scan` rollouts:
    the sparse alternative (`g.at[idx].add(dt*(lam + rho c))`, a scatter of
    the scan-carried dual into this kernel's output inside the CG/Newton
    while nest) miscompiles on TPU for some banded table layouts — the
    solve returns garbage dv while the SAME graph called outside scan is
    exact (probed at 10.6k elems: PCA-sorted node order corrupt, RCM
    clean; g/Hv/precond/PCG all bit-exact in isolation). Dense math makes
    the layout question moot and is also faster (no row-granular op on the
    CG path, PERF_NOTES cost model).
    """
    from tlfea.constraints import DensePins, FixedCoefs, LinearConstraints
    from tlfea.elements.assembly import node_ref

    bnd = system.pallas.banded
    if bdata is None:
        bdata = bnd.data
    elems = system.elems
    cons = system.constraints
    x_ref = node_ref(elems)
    if u_prev is None:
        u_prev = x_prev - x_ref
    dtype = v.dtype
    u = (u_prev + dt * v).astype(dtype)

    packed = jnp.concatenate([u, v, (v - v_prev) / dt], axis=1)  # (n, 9)
    outw, prepT = bnd.primal_fn(to_windows(packed, bnd), bdata)
    g = from_windows(outw, bnd)
    pin_lin = None
    lin_fn = None  # callable u-linear constraint term (general linear rows)
    if pin_terms is not None:
        pin_aff, lin = pin_terms
        if callable(lin):
            # General LinearConstraints recipe (see newton._newton_inner):
            # aff = dt J^T(lam + rho c0) expanded OUTSIDE the while nest
            # (the scan-carried dual never enters an indexed op inside it —
            # the miscompile rule below); lin(u) = dt rho J^T J u uses only
            # loop-local values with constant COO indices.
            g = g + pin_aff + lin(u)
            lin_fn = lin
        else:
            g = g + pin_aff + lin * u
            pin_lin = lin
    elif isinstance(cons, FixedCoefs):
        c = cons.eval_c_u(u, x_ref)
        g = g.at[cons.idx].add(dt * (lam_dual + rho * c))
        # Hv pin term without a scatter: the ALM pin Hessian is diagonal
        # (dt^2 rho at pinned nodes), so a dense node mask replaces the
        # row-granular scatter-add of the flat path.
        pinmask = jnp.zeros((g.shape[0], 1), dtype).at[cons.idx].set(1.0)
        pin_lin = dt * rho * pinmask
    elif isinstance(cons, DensePins):
        # Already dense: no scatter, trace-safe inside while_loop nests.
        c = cons.eval_c_u(u, x_ref)
        g = g + dt * cons.mask.astype(dtype) * (lam_dual.astype(dtype) + rho * c)
        pin_lin = dt * rho * cons.mask.astype(dtype)
    elif isinstance(cons, LinearConstraints):
        # Direct-call path (tests / one-off steps): general linear rows via
        # the static COO gathers. Production solves go through pin_terms
        # (newton precomputes the affine half outside the while nest).
        c = cons.eval_c_u(u, x_ref).astype(dtype)
        g = g + dt * cons.apply_jt((lam_dual.astype(dtype) + rho * c),
                                   g.shape[0])

        def lin_fn(p, cons=cons, n=g.shape[0]):
            return dt * rho * cons.apply_jt(cons._apply_j(p), n)

    g = g - f_ext

    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)

    def hvp(p):
        h = from_windows(bnd.hv_fn(dt_arr, to_windows(p, bnd), prepT, bdata), bnd)
        if pin_lin is not None:
            h = h + dt * pin_lin * p
        if lin_fn is not None:
            h = h + dt * lin_fn(p)
        return h

    return g, hvp
