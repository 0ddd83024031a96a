"""Component-level timing of the Newton-PCG Hessian-vector-product path on
TPU — the round-2 perf target (VERDICT #2: per-Hv gather/scatter + layout
transposes are ~60% of CG time).

Times, per component, on the 10.6k-elem bench problem:
  gather, transpose-in, pallas primal, pallas tangent, transpose-out,
  scatter, full fused gradient, full Hv (linearized), precond apply.
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
from tlfea.solvers import System, StepState, newton
from tlfea.solvers.common import grad_L, precond_blocks
from tlfea.utils.tetmesh import box_t10_mesh

dtype = np.float32
nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
n_elem = conn.shape[0]
print(f"elems={n_elem} nodes={nodes.shape[0]}")

lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
cons = FixedCoefs.from_indices(fixed, nodes.astype(dtype))
system = System(elems=elems, material=mat, constraints=cons)
system = pallas_fem.with_pallas(system)
state = StepState.rest(system, nodes.astype(dtype))
m = lumped_mass(elems)
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(m * dtype(-9.81))

x = state.x
v = jnp.zeros_like(x)
dt = dtype(1e-3)
rho = dtype(1e7)
key = jax.random.PRNGKey(0)
p = jax.random.normal(key, x.shape, dtype)

tpd = system.pallas
S, E, E_pad = tpd.S, tpd.E, tpd.E_pad
LANE = pallas_fem.LANE
connd = elems.conn


def timeit(name, fn, *args, iters=30, inner=1):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3 / inner
    print(f"{name:42s} {ms:8.3f} ms")
    return ms


packed = jnp.concatenate([x, v, (v - v) / dt], axis=1)  # (n, 9)

# -- pieces --
timeit("gather packed[conn] (E,S,9)", lambda pk: pk[connd], packed)
timeit("gather p[conn] (E,S,3)", lambda pp: pp[connd], p)
pe = packed[connd]
timeit("transpose (E,S,9)->(S*9,E)",
       lambda a: jnp.transpose(a, (1, 2, 0)).reshape(S * 9, E), pe)
peT = jnp.pad(jnp.transpose(pe, (1, 2, 0)).reshape(S * 9, E),
              ((0, 0), (0, E_pad - E))).reshape(S * 9, E_pad // LANE, LANE)
timeit("pallas primal kernel", tpd.fn, peT)
both = jnp.concatenate([peT, peT], axis=0)
outT = tpd.fn(peT)
timeit("transpose out (S,3,Epad)->(E,S,3)",
       lambda o: jnp.transpose(o.reshape(S, 3, E_pad)[:, :, :E], (2, 0, 1)), outT)
contrib_e = jnp.transpose(outT.reshape(S, 3, E_pad)[:, :, :E], (2, 0, 1))
timeit("scatter-add (E*S rows)",
       lambda ce: jnp.zeros((x.shape[0], 3), dtype).at[connd.reshape(-1)].add(
           ce.reshape(-1, 3)), contrib_e)

# -- composites --
def g_of(vv):
    return grad_L(vv, x, v, state.lam, f_ext, dt, rho, system)

timeit("full fused gradient (pallas path)", g_of, v)

g, hvp = jax.linearize(g_of, v)


def hv(pp):
    _, hp = jax.jvp(g_of, (v,), (pp,))
    return hp

timeit("Hv via jvp (primal+tangent)", hv, p)


def hv10(pp):
    gg, f = jax.linearize(g_of, v)
    acc = pp
    for _ in range(10):
        acc = f(acc)
        acc = acc / jnp.maximum(jnp.sqrt(jnp.sum(acc * acc)), 1e-30)
    return acc

timeit("10x linearized Hv (amortized)", hv10, p, iters=10, inner=10)

timeit("precond_blocks (pallas)", lambda vv: precond_blocks(vv, x, dt, rho, system), v)

blocks = precond_blocks(v, x, dt, rho, system)
from tlfea.ops.linalg import solve3x3
timeit("precond apply solve3x3", lambda r: solve3x3(blocks, r, eps=1e-30), p)

# XLA (non-pallas) comparison
system_x = system.replace(pallas=None)

def g_of_x(vv):
    return grad_L(vv, x, v, state.lam, f_ext, dt, rho, system_x)

timeit("full fused gradient (XLA path)", g_of_x, v)


def hv10x(pp):
    gg, f = jax.linearize(g_of_x, v)
    acc = pp
    for _ in range(10):
        acc = f(acc)
        acc = acc / jnp.maximum(jnp.sqrt(jnp.sum(acc * acc)), 1e-30)
    return acc

timeit("10x linearized Hv (XLA path)", hv10x, p, iters=10, inner=10)
