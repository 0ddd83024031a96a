"""TPU A/B of the banded fused gather/kernel/scatter path vs the flat
Pallas path (gather -> transpose -> kernel -> transpose -> scatter).

Parity-checks on-device first (f32), then times the primal pass and
amortized chained Hessian-vector products both ways.

  TLFEA_SCALE=1k|10k|100k  (default 10k)
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
from tlfea.solvers import StepState, System
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
if os.environ.get("TLFEA_REORDER", "1") == "1":
    from tlfea.utils.reorder import apply_node_order, rcm_order

    nodes, conn = apply_node_order(nodes, conn, rcm_order(conn, len(nodes)))
print(f"[{scale}] elems={conn.shape[0]} nodes={nodes.shape[0]}", flush=True)

lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = System(elems=elems, material=mat,
                constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
system = pallas_fem.with_pallas(system, banded=True)
bnd = system.pallas.banded
print(f"banded: W={bnd.W} span={bnd.span} n_wins={bnd.n_wins} "
      f"n_blocks={bnd.n_blocks}", flush=True)

state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
x = state.x
key = jax.random.PRNGKey(0)
v = 0.1 * jax.random.normal(key, x.shape, dtype)
p = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype)
dt, rho = dtype(1e-3), dtype(1e7)
lam_dual = state.lam


def timeit(name, fn, *args, iters=30, inner=1):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    print(f"  [{name}: compile+first {time.perf_counter()-t0:.1f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3 / inner
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return ms


# ---- parity on device ----
def flat_pair(vv, pp):
    g, hvp = pallas_fem.g_and_hvp(vv, x, v, lam_dual, f_ext, dt, rho, system)
    return g, hvp(pp)


def banded_pair(vv, pp, bd):
    # bd threaded as a jit ARGUMENT: the scatter schedule is 100s of MB at
    # 100k elems — as a closure constant it rides the remote-compile
    # request (HTTP 413).
    g, hvp = pallas_banded.g_and_hvp_banded(
        vv, x, v, lam_dual, f_ext, dt, rho, system, bdata=bd)
    return g, hvp(pp)


bdata = bnd.data

gf, hf = jax.jit(flat_pair)(v, p)
jax.block_until_ready(hf)
print("flat path ran", flush=True)
gb, hb = jax.jit(banded_pair)(v, p, bdata)
jax.block_until_ready(hb)
rg = float(jnp.max(jnp.abs(gb - gf)) / jnp.max(jnp.abs(gf)))
rh = float(jnp.max(jnp.abs(hb - hf)) / jnp.max(jnp.abs(hf)))
print(f"parity vs flat: g rel {rg:.2e}  h rel {rh:.2e}", flush=True)
assert rg < 1e-4 and rh < 1e-4, "banded path disagrees with flat path"

# ---- timings ----
def flat_primal(vv):
    g, _ = pallas_fem.g_and_hvp(vv, x, v, lam_dual, f_ext, dt, rho, system)
    return g


def banded_primal(vv, bd):
    g, _ = pallas_banded.g_and_hvp_banded(
        vv, x, v, lam_dual, f_ext, dt, rho, system, bdata=bd)
    return g


def chain10(make, banded=False):
    def run(vv, pp, *bd):
        kw = dict(bdata=bd[0]) if banded else {}
        _, hvp = make(vv, x, v, lam_dual, f_ext, dt, rho, system, **kw)
        acc = pp

        def body(_, a):
            a = hvp(a)
            return a / jnp.maximum(jnp.sqrt(jnp.sum(a * a)), 1e-30)

        return jax.lax.fori_loop(0, 10, body, acc)

    return run


timeit("primal+prep (flat)", flat_primal, v)
timeit("primal+prep (banded)", banded_primal, v, bdata)
timeit("10x Hv amortized (flat)", chain10(pallas_fem.g_and_hvp), v, p,
       iters=10, inner=10)
timeit("10x Hv amortized (banded)",
       chain10(pallas_banded.g_and_hvp_banded, banded=True), v, p, bdata,
       iters=10, inner=10)
