"""In-loop breakdown of the Newton-PCG step on TPU: what does one CG
iteration actually cost, and where does the 45 ms step go?

Times fixed-iteration while_loops (30 iters) with pieces swapped out:
  A. CG scaffold only (hvp = identity, precond = identity)
  B. + real Hv (specialized pallas path)
  C. + block-Jacobi precond matvec
  D. old custom-jvp Hv (linearize of grad_L) for comparison
  E. full _newton_inner (4 Newton iters)
  F. precond_blocks (once)
  G. full _step
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
from tlfea.ops import pallas_fem
from tlfea.ops.linalg import inv3x3
from tlfea.solvers import System, StepState, newton
from tlfea.solvers.common import grad_L, precond_blocks
from tlfea.utils.tetmesh import box_t10_mesh

dtype = np.float32
nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
print(f"elems={conn.shape[0]} nodes={nodes.shape[0]}")

lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
cons = FixedCoefs.from_indices(fixed, nodes.astype(dtype))
system = pallas_fem.with_pallas(
    System(elems=elems, material=mat, constraints=cons))
state = StepState.rest(system, nodes.astype(dtype))
m = lumped_mass(elems)
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(m * dtype(-9.81))

x = state.x
v = jnp.zeros_like(x)
dt = dtype(1e-3)
rho = dtype(1e7)
p0 = jax.random.normal(jax.random.PRNGKey(0), x.shape, dtype)

N_IT = 30


def timeit(name, fn, *args, iters=20, per=1):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {ms:8.3f} ms total   {ms / per:7.3f} ms/iter")
    return ms


def cg_like(hvp, precond, b):
    def body(carry):
        xx, r, p, z, rz, k = carry
        hp = hvp(p)
        denom = jnp.sum(p * hp)
        alpha = rz / jnp.where(denom > 0, denom, 1.0)
        xx = xx + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + beta * p
        return (xx, r, p, z, rz_new, k + 1)

    def cond(carry):
        return carry[-1] < N_IT

    z0 = precond(b)
    init = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0), 0)
    out = jax.lax.while_loop(cond, body, init)
    return out[0]


ident = lambda r: r

# A: scaffold only
timeit("A: CG scaffold (hvp=id, M=id) x30", lambda b: cg_like(ident, ident, b),
       p0, per=N_IT)

# B: + real specialized Hv
g, hvp = pallas_fem.g_and_hvp(v, x, v, state.lam, f_ext, dt, rho, system)


def run_b(b):
    gg, h = pallas_fem.g_and_hvp(v, x, v, state.lam, f_ext, dt, rho, system)
    return cg_like(h, ident, b)

timeit("B: CG + pallas Hv (M=id) x30", run_b, p0, per=N_IT)

# C: + block-jacobi precond
blocks = precond_blocks(v, x, dt, rho, system)
inv_b = inv3x3(blocks, eps=1e-30)


def run_c(b):
    gg, h = pallas_fem.g_and_hvp(v, x, v, state.lam, f_ext, dt, rho, system)
    ib = inv3x3(precond_blocks(v, x, dt, rho, system), eps=1e-30)
    return cg_like(h, lambda r: jnp.einsum("nij,nj->ni", ib, r), b)

timeit("C: CG + pallas Hv + BJ precond x30 (incl blocks)", run_c, p0, per=N_IT)

# D: old linearize path
def run_d(b):
    def g_of(vv):
        return grad_L(vv, x, v, state.lam, f_ext, dt, rho, system)
    gg, h = jax.linearize(g_of, v)
    return cg_like(h, ident, b)

timeit("D: CG + custom-jvp Hv (M=id) x30", run_d, p0, per=N_IT)

# F: precond blocks alone
timeit("F: precond_blocks + inv3x3 (once)",
       lambda vv: inv3x3(precond_blocks(vv, x, dt, rho, system), eps=1e-30), v)

# G: gradient alone (primal+prep)
timeit("G: g_and_hvp primal pass only",
       lambda vv: pallas_fem.g_and_hvp(vv, x, v, state.lam, f_ext, dt, rho, system)[0],
       v)

# E/H: full step
params = newton.NewtonParams(
    dt=dt, rho=rho, inner_atol=dtype(2.5e-2 * float(jnp.sqrt(jnp.sum(f_ext * f_ext)))),
    inner_rtol=dtype(0.0), outer_tol=dtype(0.0), max_outer=1, max_inner=4,
    cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5),
)
from tlfea.solvers.newton import _step

def run_h(s, f):
    ns, d = _step(system, s, params, f)
    return ns.x, d["cg_iters"], d["newton_iters"]

ms = timeit("H: full _step (converged)", run_h, state, f_ext)
out = jax.jit(run_h)(state, f_ext)
print(f"   newton={int(out[2])} cg={int(out[1])}")
