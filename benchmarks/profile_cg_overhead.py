"""Per-iteration CG overhead breakdown (everything EXCEPT the Hv kernel):
preconditioner applies, dots, axpys — the candidate fusion target once the
banded kernels shrink the Hessian-vector product itself.

Times, at the 10.6k bench problem: a 10-iteration PCG loop with the REAL
preconditioner but a trivial (identity) operator, the block-Jacobi apply
alone, the coarse apply alone, and the full real PCG loop for reference.
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
from tlfea.utils.reorder import apply_node_order, rcm_order
from tlfea.utils.tetmesh import box_t10_mesh

dtype = np.float32
nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
nodes, conn = apply_node_order(nodes, conn, rcm_order(conn, len(nodes)))
lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = System(elems=elems, material=mat,
                constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
system = pallas_fem.with_pallas(system, banded=True)
state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
x, v = state.x, jnp.zeros_like(state.x)
dt, rho = dtype(1e-3), dtype(1e7)
p = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype)

blocks = precond_blocks(v, x, dt, rho, system)
inv_b = inv3x3(blocks, eps=1e-30)
coarse = build_coarse_precond(system, x, float(dt), float(rho))


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


def full_pre(r):
    return bj(r) + coarse.apply(r)


timeit("block-Jacobi apply", bj, p)
timeit("coarse apply", lambda r: coarse.apply(r), p)
timeit("bj+coarse apply", full_pre, p)


def loop(pre, hvp, pp, iters=10):
    def run(b):
        x, k, _ = _pcg(hvp, pre, b, 0.0, iters)
        return x
    return run


timeit("10-iter PCG, identity Hv, bj+coarse", loop(full_pre, lambda q: q, p),
       p, iters=10, inner=10)
timeit("10-iter PCG, identity Hv, bj only", loop(bj, lambda q: q, p),
       p, iters=10, inner=10)
timeit("10-iter PCG, identity Hv, identity pre",
       loop(lambda r: r, lambda q: q, p), p, iters=10, inner=10)

# Real operator for reference (banded + flat)
g, hvp_b = pallas_banded.g_and_hvp_banded(v, x, v, state.lam, f_ext, dt, rho, system)


def real_banded(b):
    _, hv = pallas_banded.g_and_hvp_banded(v, x, v, state.lam, f_ext, dt,
                                           rho, system)
    xx, k, _ = _pcg(hv, full_pre, b, 0.0, 10)
    return xx


def real_flat(b):
    _, hv = pallas_fem.g_and_hvp(v, x, v, state.lam, f_ext, dt, rho, system)
    xx, k, _ = _pcg(hv, full_pre, b, 0.0, 10)
    return xx


timeit("10-iter PCG, banded Hv, bj+coarse", real_banded, p, iters=10, inner=10)
timeit("10-iter PCG, flat Hv, bj+coarse", real_flat, p, iters=10, inner=10)
