"""VBD sweep cost on TPU at the 10.6k-elem bench scale (round-1: 273
ms/sweep with per-color incidence gathers; round-2 re-design refreshes the
full fused residual once per color GROUP and updates colors with one
gather + one 3x3 solve + one scatter each).

Measured in-scan (per-dispatch tunnel overhead excluded), fixed sweep count.
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
from tlfea.solvers import System, StepState, vbd
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

for gs in (4, 8):
    params = vbd.VBDParams(
        dt=dtype(1e-3), rho=dtype(1e7), omega=dtype(1.0),
        inner_tol=dtype(0.0), outer_tol=dtype(0.0),
        max_outer=1, max_sweeps=8, color_group_size=gs,
        convergence_check_interval=1000,  # never check: fixed 8 sweeps
    )
    structures = vbd.prepare(system, group_size=gs)
    print(f"group_size={gs}: {structures.n_groups} groups x {structures.group_size}")
    step = vbd.make_step(system, params, structures)
    s, diag = step(state, f_ext)
    jax.block_until_ready(s.x)
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        s, diag = step(s, f_ext)
    jax.block_until_ready(s.x)
    wall = (time.perf_counter() - t0) / REP
    # 8 sweeps per step (fixed); subtract nothing — report per-sweep
    print(f"  {wall*1e3:.1f} ms/step (8 sweeps) -> {wall/8*1e3:.1f} ms/sweep; "
          f"finite={bool(np.isfinite(np.asarray(s.x)).all())}")
