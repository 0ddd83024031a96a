"""A/B the coarse-apply storage variants on the 100k bench problem:
range-mode f32 (round-2 production), bf16 tables (factored Li solve), and
bf16 + spectral truncation (rank=r whitened eigenbasis W — see
CoarsePrecond.W). Reports converged-rollout ms/step + Newton/CG counts:
the decision metric is ms/step, since truncation may trade a few extra CG
iterations for a much cheaper apply.

Usage: TLFEA_AB_CONFIGS=f32,bf16,bf16_r1024,bf16_r512 python
benchmarks/coarse_apply_ab_100k.py  (default runs all four).
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
from tlfea.solvers import StepState, System, newton
from tlfea.solvers.coarse import build_coarse_precond
from tlfea.utils.reorder import apply_node_order, best_order
from tlfea.utils.tetmesh import box_t10_mesh

dtype = np.float32
nodes, conn = box_t10_mesh(4.0, 0.7, 0.6, 96, 16, 11)
nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
print(f"elems={conn.shape[0]} nodes={nodes.shape[0]}", flush=True)

lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = pallas_fem.with_pallas(System(
    elems=elems, material=mat,
    constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)),
), banded="auto")
state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))
params = newton.NewtonParams(
    dt=dtype(1e-3), rho=dtype(1e7),
    inner_atol=dtype(2.5e-2 * f_scale), inner_rtol=dtype(0.0),
    outer_tol=dtype(0.0), max_outer=1, max_inner=6,
    cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5),
)

CONFIGS = {
    "f32": dict(ranges=True, max_agg=1024),
    "bf16": dict(ranges=True, max_agg=1024, mm_dtype="bfloat16"),
    "bf16_r1024": dict(ranges=True, max_agg=1024, mm_dtype="bfloat16",
                       rank=1024),
    "bf16_r512": dict(ranges=True, max_agg=1024, mm_dtype="bfloat16",
                      rank=512),
}
names = os.environ.get("TLFEA_AB_CONFIGS", ",".join(CONFIGS)).split(",")

ROLLOUT = 20
for name in names:
    name = name.strip()
    t0 = time.perf_counter()
    coarse = build_coarse_precond(system, state.x, float(params.dt),
                                  float(params.rho), **CONFIGS[name])
    t_build = time.perf_counter() - t0
    roll = newton.make_rollout(system, params, ROLLOUT, coarse=coarse,
                               precond_refresh=8)
    s, _ = roll(state, f_ext)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s, (nit, cgit) = roll(s, f_ext)
    jax.block_until_ready(s)
    wall = time.perf_counter() - t0
    assert np.isfinite(np.asarray(s.x)).all(), f"{name}: diverged"
    print(f"{name:12s} build {t_build:6.1f}s  "
          f"{wall / ROLLOUT * 1e3:7.2f} ms/step  "
          f"newton {float(np.median(np.asarray(nit))):.1f}  "
          f"cg {float(np.median(np.asarray(cgit))):.1f}", flush=True)
