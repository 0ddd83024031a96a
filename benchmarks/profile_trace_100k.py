"""Device-side profiler trace of the production 100k rollout (VERDICT-r3
item 4: validate the analytic roofline against a real trace).

Runs the exact bench.py 100k configuration (banded Pallas + bf16 factored
coarse + block-Jacobi refresh 8), captures one 20-step rollout under
`jax.profiler.trace`, then parses the XSpace with xprof and prints per-op
device times — the ground truth for where the 23 ms step actually goes.

TLFEA_SCALE=10k|100k (default 100k).
"""

import glob
import gzip
import json
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
    "1k": (1.0, 0.25, 0.25, 12, 4, 3),
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
system = System(elems=elems, material=mat,
                constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
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
system = pallas_fem.with_pallas(system, banded="auto")
# Mirror bench.py's scale branch exactly: single-block banded meshes (the 1k
# scale) take the RESIDENT path without the coarse correction.
if (getattr(system.pallas, "banded", None) is not None
        and system.pallas.banded.n_blocks == 1):
    coarse = None
else:
    big = nodes.shape[0] > 50_000
    coarse = build_coarse_precond(system, state.x, float(params.dt),
                                  float(params.rho), ranges=big,
                                  max_agg=1024 if big else 512,
                                  mm_dtype="bfloat16" if big else None)
roll = newton.make_rollout(system, params, ROLLOUT, coarse=coarse,
                           precond_refresh=8)

s, (nit, cgit) = roll(state, f_ext)
jax.block_until_ready(s)
t0 = time.perf_counter()
s, (nit, cgit) = roll(s, f_ext)
jax.block_until_ready(s)
wall = time.perf_counter() - t0
print(f"[{scale}] {n_elem} elems: {wall / ROLLOUT * 1e3:.2f} ms/step, "
      f"newton={float(np.median(np.asarray(nit)))} "
      f"cg={float(np.median(np.asarray(cgit)))}", flush=True)

trace_dir = "/tmp/tlfea_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    s2, _ = roll(s, f_ext)
    jax.block_until_ready(s2)
print("trace captured", flush=True)

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
if paths:
    from xprof.convert import raw_to_tool_data as r2t

    data, _ctype = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    out = "/tmp/tlfea_trace/op_stats.json"
    with open(out, "w") as f:
        f.write(data)
    try:
        js = json.loads(data)
    except Exception as e:
        print("parse failed:", e, "— raw saved to", out)
        js = None
    if js is not None:
        # framework_op_stats JSON: list of tables; find per-op rows.
        print(json.dumps(js, indent=1)[:2000])
