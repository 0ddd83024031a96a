"""Device trace of the COMPILED sharded banded rollout on TPU (1-device
mesh) vs unsharded — where does the measured 5.6x shard_map overhead go?

Run: python benchmarks/profile_shard_tpu.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "out/jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build_flagship_problem

from tlfea.ops import pallas_fem
from tlfea.parallel.sharding import make_elem_mesh, replicate
from tlfea.parallel.shard_banded import shard_flagship
from tlfea.solvers import newton
from tlfea.solvers.coarse import build_coarse_precond

N = 10
system, state, params, f_ext = _build_flagship_problem(42, 7, 6)
psys = pallas_fem.with_pallas(system, banded="auto")
coarse = build_coarse_precond(system, state.x, float(params.dt),
                              float(params.rho))
mesh = make_elem_mesh(jax.devices()[:1])
sbig = shard_flagship(psys, mesh)
roll = newton.make_rollout(sbig, params, N, coarse=coarse, precond_refresh=8)
sf = replicate(f_ext, mesh)
s, _ = roll(replicate(state, mesh), sf)
jax.block_until_ready(s)
t0 = time.perf_counter()
s2, _ = roll(s, sf)
jax.block_until_ready(s2)
print(f"sharded: {(time.perf_counter()-t0)/N*1e3:.2f} ms/step", flush=True)

trace_dir = "/tmp/tlfea_shard_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    s3, _ = roll(s2, sf)
    jax.block_until_ready(s3)
print("trace captured", flush=True)

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
if paths:
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    with open("/tmp/tlfea_shard_trace/op_stats.json", "w") as f:
        f.write(data)
    print("op stats saved")
