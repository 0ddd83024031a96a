"""A/B the 100k step levers found by the r4 device trace
(benchmarks/profile_trace_100k.py):

  - fresh_inv (block-Jacobi refresh) measured 21 ms per refresh — 4.2
    ms/step amortized at refresh=8 including the rollout-initial build.
  - Hv pallas kernel 736 us each (6.9/step).
  - coarse apply ~420 us/CG-iter at 668 GB/s (HBM-bound already).

Variants: refresh interval sweep x hv_dtype bf16 tables.
TLFEA_SCALE=10k|100k (default 100k).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "out/jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_fem
from tlfea.solvers import StepState, System, newton
from tlfea.solvers.coarse import build_coarse_precond
from tlfea.utils.reorder import apply_node_order, best_order
from tlfea.utils.tetmesh import box_t10_mesh

CONFIGS = {
    "10k": (2.0, 0.35, 0.3, 42, 7, 6),
    "100k": (4.0, 0.7, 0.6, 96, 16, 11),
}
scale = os.environ.get("TLFEA_SCALE", "100k")
ROLLOUT = 20
dtype = np.float32
L, W, H, nx, ny, nz = CONFIGS[scale]
nodes, conn = box_t10_mesh(L, W, H, nx, ny, nz)
nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
n_elem = conn.shape[0]
lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
base = System(elems=elems, material=mat,
              constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
state = StepState.rest(base, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
params = newton.NewtonParams(
    dt=dtype(1e-3), rho=dtype(1e7),
    inner_atol=dtype(2.5e-2 * f_scale), inner_rtol=dtype(0.0),
    outer_tol=dtype(0.0), max_outer=1, max_inner=6,
    cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5),
)
big = nodes.shape[0] > 50_000

sys_f32 = pallas_fem.with_pallas(base, banded="auto")
sys_bf16 = pallas_fem.with_pallas(base, banded="auto",
                                  banded_hv_dtype="bfloat16")
coarse = build_coarse_precond(sys_f32, state.x, float(params.dt),
                              float(params.rho), ranges=big,
                              max_agg=1024 if big else 512,
                              mm_dtype="bfloat16" if big else None)

# Settle transients once so every variant starts from the same state.
warm = newton.make_rollout(sys_f32, params, ROLLOUT, coarse=coarse,
                           precond_refresh=8)
s0, _ = warm(state, f_ext)
jax.block_until_ready(s0)

for name, system, refresh in [
    ("f32  refresh=8 ", sys_f32, 8),
    ("f32  refresh=20", sys_f32, 20),
    ("f32  refresh=50", sys_f32, 50),
    ("bf16 refresh=8 ", sys_bf16, 8),
    ("bf16 refresh=20", sys_bf16, 20),
]:
    roll = newton.make_rollout(system, params, ROLLOUT, coarse=coarse,
                               precond_refresh=refresh)
    s, _ = roll(s0, f_ext)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s, (nit, cgit) = roll(s0, f_ext)
    jax.block_until_ready(s)
    wall = time.perf_counter() - t0
    assert np.isfinite(np.asarray(s.x)).all()
    print(f"{name}: {wall / ROLLOUT * 1e3:6.2f} ms/step  "
          f"newton={float(np.median(np.asarray(nit)))} "
          f"cg={float(np.median(np.asarray(cgit)))}", flush=True)
