"""Coarse-space scaling study (PERF_NOTES roadmap item): CG count and
per-apply cost vs coarse-space size (target_cluster / max_agg) at the 10k
and (optionally) 100k bench problems.

The coarse apply is two dense matmuls against the (na*6|12, n*3) aggregate
basis — MXU work that is nearly free until the Agg operand stops fitting
HBM bandwidth — so a larger coarse space should buy CG iterations at ~zero
marginal ms. This script measures where that stops being true.

Usage: python benchmarks/coarse_scaling_study.py [10k|100k]
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
from tlfea.utils.reorder import apply_node_order, rcm_order
from tlfea.utils.tetmesh import box_t10_mesh

CONFIGS = {
    "10k": (2.0, 0.35, 0.3, 42, 7, 6),
    "100k": (4.0, 0.7, 0.6, 96, 16, 11),
}

scale = sys.argv[1] if len(sys.argv) > 1 else "10k"
dtype = np.float32
L, W, H, nx, ny, nz = CONFIGS[scale]
nodes, conn = box_t10_mesh(L, W, H, nx, ny, nz)
nodes, conn = apply_node_order(nodes, conn, rcm_order(conn, len(nodes)))
lam, mu = lame_from_E_nu(1e7, 0.3)
mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
          eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
system = System(elems=elems, material=mat,
                constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
system = pallas_fem.with_pallas(system, banded="auto")
state = StepState.rest(system, nodes.astype(dtype))
f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
    lumped_mass(elems) * dtype(-9.81))
f_scale = float(jnp.sqrt(jnp.sum(f_ext * f_ext)))

params = newton.NewtonParams(
    dt=dtype(1e-3), rho=dtype(1e7),
    inner_atol=dtype(5e-3 * f_scale), inner_rtol=dtype(0.0),
    outer_tol=dtype(0.0), max_outer=1, max_inner=6,
    cg_rtol=dtype(1e-3), cg_max_iter=100, ew_eta_max=dtype(0.0),
)

ROLL = 10
print(f"== {scale}: {conn.shape[0]} elems / {len(nodes)} nodes, "
      f"tight tol (0.5% of load), EW off, {ROLL}-step rollout ==", flush=True)

for label, kwargs in [
    ("no coarse", None),
    # Range-mode first (contiguous RCM index segments; restrict/prolong are
    # zero-operand reshape-sums, so the only scale knob is the dense
    # inverse of the (na*6)^2 coarse operator).
    ("rng tc=48 max=512", dict(target_cluster=48, max_agg=512, ranges=True)),
    ("rng tc=48 max=1024", dict(target_cluster=48, max_agg=1024, ranges=True)),
    ("rng tc=48 max=2048", dict(target_cluster=48, max_agg=2048, ranges=True)),
    ("tc=96 max=512", dict(target_cluster=96, max_agg=512)),
    ("tc=48 max=512", dict(target_cluster=48, max_agg=512)),
    ("tc=48 max=2048", dict(target_cluster=48, max_agg=2048)),
    ("tc=24 max=2048", dict(target_cluster=24, max_agg=2048)),
]:
    try:
        if kwargs is None:
            coarse, na = None, 0
        else:
            coarse = build_coarse_precond(system, state.x, float(params.dt),
                                          float(params.rho), **kwargs)
            na = coarse.n_agg
        roll = newton.make_rollout(system, params, ROLL, coarse=coarse,
                                   precond_refresh=8)
        s, _ = roll(state, f_ext)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s, (nit, cgit) = roll(s, f_ext)
        jax.block_until_ready(s)
        ms = (time.perf_counter() - t0) / ROLL * 1e3
        print(f"{label:20s} rows={na:6d}  {ms:7.2f} ms/step  "
              f"newton={float(np.median(np.asarray(nit))):.1f} "
              f"cg={float(np.median(np.asarray(cgit))):.1f}", flush=True)
    except Exception as e:
        print(f"{label:20s} FAILED ({type(e).__name__}: {str(e)[:160]})",
              flush=True)
    finally:
        coarse = None
