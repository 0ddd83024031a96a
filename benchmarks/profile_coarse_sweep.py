"""Coarse-space size sweep on the 10.6k bench problem: CG count + rollout
ms/step vs target_cluster (aggregate size). The coarse apply is matmul-bound
(Agg (na, n) + Ainv (k, k)), so a larger coarse space is nearly free per
iteration until those matrices stop being latency-trivial — find the knee.
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
from tlfea.solvers.coarse import build_coarse_precond
from tlfea.utils.tetmesh import box_t10_mesh

dtype = np.float32
nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
print(f"elems={conn.shape[0]} nodes={nodes.shape[0]}")

lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = pallas_fem.with_pallas(System(
    elems=elems, material=mat,
    constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)),
))
state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
params = newton.NewtonParams(
    dt=dtype(1e-3), rho=dtype(1e7),
    inner_atol=dtype(2.5e-2 * f_scale), inner_rtol=dtype(0.0),
    outer_tol=dtype(0.0), max_outer=1, max_inner=4,
    cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5),
)

ROLLOUT = 20
for tc, ma in [(48, 512), (24, 1024), (12, 2048)]:
    coarse = build_coarse_precond(system, state.x, float(params.dt),
                                  float(params.rho), target_cluster=tc,
                                  max_agg=ma)
    roll = newton.make_rollout(system, params, ROLLOUT, coarse=coarse,
                               precond_refresh=8)
    s, (nit, cgit) = roll(state, f_ext)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s, (nit, cgit) = roll(s, f_ext)
    jax.block_until_ready(s)
    wall = (time.perf_counter() - t0) / ROLLOUT * 1e3
    assert np.isfinite(np.asarray(s.x)).all()
    print(f"tc={tc:3d} n_agg={coarse.n_agg:5d}: {wall:7.2f} ms/step  "
          f"newton={np.median(np.asarray(nit)):.0f} "
          f"cg={np.median(np.asarray(cgit)):.0f}")
