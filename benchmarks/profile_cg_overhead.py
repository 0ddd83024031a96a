"""Per-iteration CG overhead breakdown (everything EXCEPT the Hv kernel):
preconditioner applies, dots, axpys — the candidate fusion target once the
banded kernels shrink the Hessian-vector product itself.

Times, at TLFEA_SCALE=1k|10k|100k (default 10k): a 10-iteration PCG loop
with the REAL preconditioner but a trivial (identity) operator, the
block-Jacobi apply alone, the coarse apply alone, and the full real PCG
loop for reference. TLFEA_COARSE_MODE=dense|range, TLFEA_MAX_AGG.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_banded, pallas_fem
from tlfea.ops.linalg import inv3x3
from tlfea.solvers import StepState, System
from tlfea.solvers.common import precond_blocks
from tlfea.solvers.coarse import build_coarse_precond
from tlfea.solvers.newton import _pcg
from tlfea.utils.reorder import apply_node_order, best_order
from tlfea.utils.tetmesh import box_t10_mesh

CONFIGS = {
    "1k": (1.0, 0.25, 0.25, 12, 4, 3),
    "10k": (2.0, 0.35, 0.3, 42, 7, 6),
    "100k": (4.0, 0.7, 0.6, 96, 16, 11),
}
scale = os.environ.get("TLFEA_SCALE", "10k")
dtype = np.float32
L, Wd, H, nx, ny, nz = CONFIGS[scale]
nodes, conn = box_t10_mesh(L, Wd, H, nx, ny, nz)
nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
print(f"[{scale}] elems={conn.shape[0]} nodes={nodes.shape[0]}", flush=True)
lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = System(elems=elems, material=mat,
                constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
system = pallas_fem.with_pallas(system, banded=True)
bdata = system.pallas.banded.data
state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
x, v = state.x, jnp.zeros_like(state.x)
dt, rho = dtype(1e-3), dtype(1e7)
p = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype)

blocks = precond_blocks(v, x, dt, rho, system)
inv_b = inv3x3(blocks, eps=1e-30)
ckw = {}
if os.environ.get("TLFEA_COARSE_MODE") == "range":
    ckw["ranges"] = True
if os.environ.get("TLFEA_MAX_AGG"):
    ckw["max_agg"] = int(os.environ["TLFEA_MAX_AGG"])
if os.environ.get("TLFEA_COARSE_MM"):
    ckw["mm_dtype"] = os.environ["TLFEA_COARSE_MM"]  # e.g. bfloat16
if os.environ.get("TLFEA_COARSE_RANK"):
    ckw["rank"] = int(os.environ["TLFEA_COARSE_RANK"])
coarse = build_coarse_precond(system, x, float(dt), float(rho), **ckw)
_solve_tbl = next(t for t in (coarse.Ainv, coarse.Li, coarse.W) if t is not None)
print(f"coarse: n_agg={coarse.n_agg} solve_tbl={_solve_tbl.shape} "
      f"seg={coarse.seg} mm={coarse.mm_dtype}", flush=True)


def timeit(name, fn, *args, iters=30, inner=1):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3 / inner
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return ms


def bj(r):
    return jnp.einsum("nij,nj->ni", inv_b, r)


# Preconditioner (re)build cost — amortized over `precond_refresh` steps in
# production rollouts.
timeit("precond_blocks + inv3x3 (refresh cost)",
       lambda vv: inv3x3(precond_blocks(vv, x, dt, rho, system), eps=1e-30),
       v, iters=5)


def full_pre(r, co):
    return bj(r) + co.apply(r)


timeit("block-Jacobi apply", bj, p)
timeit("coarse apply", lambda r, co: co.apply(r), p, coarse)
timeit("bj+coarse apply", full_pre, p, coarse)

# Window plumbing (the banded path's per-Hv XLA cost outside the kernel)
bnd = system.pallas.banded
timeit("to_windows (3ch)", lambda q: pallas_banded.to_windows(q, bnd), p)
timeit("to+from_windows round trip",
       lambda q: pallas_banded.from_windows(
           pallas_banded.to_windows(q, bnd).reshape(
               bnd.n_wins, 3, bnd.WR2, 128)[:, :3].reshape(
               bnd.n_wins, 3 * bnd.WR2, 128), bnd), p)


def loop(pre, hvp, iters=10):
    def run(b, co):
        def pr(r):
            return pre(r, co)
        xx, k, _, _ = _pcg(hvp, pr, b, 0.0, iters)
        return xx
    return run


timeit("10-iter PCG, identity Hv, bj+coarse",
       loop(full_pre, lambda q: q), p, coarse, iters=10, inner=10)
timeit("10-iter PCG, identity Hv, bj only",
       loop(lambda r, co: bj(r), lambda q: q), p, coarse, iters=10, inner=10)
timeit("10-iter PCG, identity Hv, identity pre",
       loop(lambda r, co: r, lambda q: q), p, coarse, iters=10, inner=10)


def real_banded(b, co, bd):
    _, hv = pallas_banded.g_and_hvp_banded(v, x, v, state.lam, f_ext, dt,
                                           rho, system, bdata=bd)
    xx, k, _, _ = _pcg(hv, lambda r: full_pre(r, co), b, 0.0, 10)
    return xx


timeit("10-iter PCG, banded Hv, bj+coarse", real_banded, p, coarse, bdata,
       iters=10, inner=10)
timeit("10-iter PCG, banded Hv, bj only",
       lambda b, bd: _pcg(pallas_banded.g_and_hvp_banded(
           v, x, v, state.lam, f_ext, dt, rho, system, bdata=bd)[1],
           bj, b, 0.0, 10)[0],
       p, bdata, iters=10, inner=10)
if scale != "100k":
    def real_flat(b):
        _, hv = pallas_fem.g_and_hvp(v, x, v, state.lam, f_ext, dt, rho,
                                     system)
        xx, k, _, _ = _pcg(hv, lambda r: full_pre(r, coarse), b, 0.0, 10)
        return xx

    timeit("10-iter PCG, flat Hv, bj+coarse", real_flat, p, iters=10,
           inner=10)
