"""Phase ablation of the banded Hv kernel: where does per-block time go?

Builds pallas_call variants with IDENTICAL grid/block specs (so every
variant DMAs the same blocks — differences isolate compute):
  dma     — touch-only body (pipeline + DMA floor)
  gather  — in-window shuffle gather only (S*K*3 one-hot rows)
  gfe     — gather + element Hv algebra (no scatter)
  scat    — scatter only (fes filled from window rows)
  full    — the production body

TLFEA_SCALE=1k|10k|100k (default 100k).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_banded, pallas_fem
from tlfea.ops.pallas_fem import LANE, SUB, _hv_fe
from tlfea.ops.pallas_banded import (
    ROW, _store_fe, _window_gather, _window_scatter, to_windows,
)
from tlfea.solvers import StepState, System
from tlfea.utils.reorder import apply_node_order, best_order
from tlfea.utils.tetmesh import box_t10_mesh

CONFIGS = {
    "1k": (1.0, 0.25, 0.25, 12, 4, 3),
    "10k": (2.0, 0.35, 0.3, 42, 7, 6),
    "100k": (4.0, 0.7, 0.6, 96, 16, 11),
}
scale = os.environ.get("TLFEA_SCALE", "100k")
dtype = np.float32
L, Wd, H, nx, ny, nz = CONFIGS[scale]
nodes, conn = box_t10_mesh(L, Wd, H, nx, ny, nz)
nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = pallas_fem.with_pallas(System(
    elems=elems, material=mat,
    constraints=FixedCoefs.from_indices(fixed := np.nonzero(nodes[:, 0] < 1e-12)[0],
                                        nodes.astype(dtype)),
), banded=True)
bnd = system.pallas.banded
print(f"[{scale}] E={bnd.E} blocks={bnd.n_blocks} W={bnd.W} K={bnd.K} "
      f"I_cap={bnd.I_cap} P_comb={bnd.P_comb}", flush=True)

state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
x = state.x
v = 0.1 * jax.random.normal(jax.random.PRNGKey(0), x.shape, dtype)
p = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype)
dt, rho = dtype(1e-3), dtype(1e7)

# Real prepT from one primal pass.
packed = jnp.concatenate([x - x, v, v], axis=1)
_, prepT = jax.jit(lambda w, d: bnd.primal_fn(w, d))(
    to_windows(jnp.concatenate([x - x, v, v * 0], axis=1), bnd), bnd.data)
jax.block_until_ready(prepT)

S, Q, K, RT, WR2, I_cap, P_comb, PR = (
    bnd.S, bnd.Q, bnd.K, bnd.RT, bnd.WR2, bnd.I_cap, bnd.P_comb, bnd.PR)
PR_pad = PR + (PR % 2)
phys = dict(Q=Q, S=S, mops=pallas_fem.tile_material(mat),
            tmask=elems.trans_mask)


def make_min_fn(with_tables):
    """Touch-only kernel with a REDUCED input set: win3 (+inv when
    with_tables) and nothing else. dma(full) vs these separates
    bytes-bound from grid-step-latency-bound."""
    def body(wb_r, first_r, win_ref, *rest):
        out_ref = rest[-1]
        b = pl.program_id(0)

        @pl.when(first_r[b] == 1)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        t = win_ref[0, pl.ds(0, SUB), :]
        if with_tables:
            t = t + rest[0][0, pl.ds(0, SUB), :].astype(win_ref.dtype)
        out_ref[0, pl.ds(0, SUB), :] += t

    in_specs = [pl.BlockSpec((1, 3 * WR2, ROW), _indw)]
    if with_tables:
        in_specs.append(pl.BlockSpec((1, I_cap * SUB, ROW), _indb))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bnd.n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3 * WR2, ROW), _indw),
    )
    sched = bnd.sched
    wb_j = jnp.asarray(sched["wb"].astype(np.int32))
    first_j = jnp.asarray(sched["first"].astype(np.int32))

    def fn(dt_arr, win3, prepT, data):
        args = (win3, data["inv"]) if with_tables else (win3,)
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bnd.n_wins, 3 * WR2, ROW),
                                           win3.dtype),
        )(wb_j, first_j, *args)
    return fn


def make_body(mode):
    def body(wb_r, first_r, r0_r, fid_r, ranges_r,
             dt_ref, win_ref, inv_ref, *rest):
        if P_comb:
            (comb_ref, cl_ref, prep_ref, gN_ref, dV_ref, Me_ref,
             out_ref, fes_ref) = rest
        else:
            comb_ref = None
            (cl_ref, prep_ref, gN_ref, dV_ref, Me_ref,
             out_ref, fes_ref) = rest
        b = pl.program_id(0)
        dtv = dt_ref[0, 0]

        @pl.when(first_r[b] == 1)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        dty = win_ref.dtype
        if mode in ("gather", "gfe", "full"):
            pg = _window_gather(b, win_ref, cl_ref, r0_r, S, 3, K, WR2, dty)
        if mode == "gather":
            tot = jnp.zeros((SUB, LANE), dty)
            for a in range(S):
                for c in range(3):
                    tot = tot + pg[a][c]
            out_ref[0, pl.ds(0, SUB), :] += tot
            return
        if mode in ("gfe", "full"):
            fe = _hv_fe(
                lambda a, c: pg[a][c],
                lambda row: prep_ref[0, pl.ds(row * SUB, SUB), :],
                lambda q, a, j: gN_ref[
                    0, pl.ds(((q * S + a) * 3 + j) * SUB, SUB), :],
                lambda q: dV_ref[0, pl.ds(q * SUB, SUB), :],
                lambda a, bb: Me_ref[0, pl.ds((a * S + bb) * SUB, SUB), :],
                dtv, **phys,
            )
            _store_fe(fes_ref, fe, S)
        if mode == "gfe":
            out_ref[0, pl.ds(0, SUB), :] += fes_ref[pl.ds(0, SUB), :]
            return
        if mode == "scat":
            # Fill fes cheaply from window rows (content irrelevant).
            for r in range(3 * S):
                fes_ref[pl.ds(r * SUB, SUB), :] = win_ref[0, pl.ds(0, SUB), :]
        if mode in ("scat", "full"):
            _window_scatter(b, out_ref, fes_ref, inv_ref, fid_r, ranges_r,
                            S, RT, WR2, I_cap, dty,
                            comb_ref=comb_ref, P_comb=P_comb)
    return body


def _ind0(b, *s):
    return (0, b, 0)


def _indb(b, *s):
    return (b, 0, 0)


def _indw(b, wb_r, *s):
    return (wb_r[b], 0, 0)


def make_fn(mode):
    comb_specs = ([pl.BlockSpec((1, P_comb * S * SUB, ROW), _indb)]
                  if P_comb else [])
    especs = [pl.BlockSpec((1, r * SUB, LANE), _indb)
              for r in [S, PR_pad, Q * S * 3, Q, S * S]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(bnd.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * WR2, ROW), _indw),
            pl.BlockSpec((1, I_cap * SUB, ROW), _indb),
            *comb_specs,
            *especs,
        ],
        out_specs=pl.BlockSpec((1, 3 * WR2, ROW), _indw),
        scratch_shapes=[pltpu.VMEM((3 * S * SUB, ROW), jnp.dtype(dtype))],
    )
    sched = bnd.sched
    wb_j = jnp.asarray(sched["wb"].astype(np.int32))
    first_j = jnp.asarray(sched["first"].astype(np.int32))
    r0_j = jnp.asarray(sched["r0"].reshape(-1).astype(np.int32))
    fid_j = jnp.asarray(sched["fid"].reshape(-1))
    ranges_j = jnp.asarray(sched["ranges"].reshape(-1))

    def fn(dt_arr, win3, prepT, data):
        comb_in = (data["comb"],) if P_comb else ()
        return pl.pallas_call(
            make_body(mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bnd.n_wins, 3 * WR2, ROW),
                                           win3.dtype),
            interpret=False,
        )(wb_j, first_j, r0_j, fid_j, ranges_j,
          dt_arr, win3, data["inv"], *comb_in, data["cl"], prepT,
          data["gN"], data["dV"], data["Me"])
    return fn


dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
win3 = to_windows(p, bnd)


def timeit(name, fn, iters=50):
    f = jax.jit(fn)
    out = f(dt_arr, win3, prepT, bnd.data)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(dt_arr, win3, prepT, bnd.data)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:10s} {ms:8.3f} ms", flush=True)
    return ms


timeit("dma_win", make_min_fn(False))
timeit("dma_wininv", make_min_fn(True))
timeit("dma", make_fn("dma"))
timeit("gather", make_fn("gather"))
timeit("gfe", make_fn("gfe"))
timeit("scat", make_fn("scat"))
timeit("full", make_fn("full"))
timeit("prod", lambda d, w, pT, da: bnd.hv_fn(d, w, pT, da))
