"""TPU-only regression: the shard_map banded flagship path COMPILED on the
real chip (VERDICT-r4 item 1).

Both prior TPU Mosaic miscompiles (PERF_NOTES) were invisible to interpret
mode and CPU — banded kernels inside while/scan nests corrupted results
ONLY on the compiled TPU path. The sharded program (shard_map slabs +
masked psum, `tlfea/parallel/shard_banded.py`) therefore needs compiled
coverage: this runs a short production rollout (banded Pallas + coarse
preconditioner + refresh) over a 1-device TPU mesh and asserts trajectory
and CG parity vs the unsharded banded rollout. First measured 2026-08-21:
rel err 1.49e-8, cg/step 11 == 11 (the miscompile class produced O(1)
corruption).

Run: TLFEA_TEST_TPU=1 python -m pytest -m tpu tests/test_shard_tpu_regression.py
(~3 min on a warm compile cache; scale kept at the 10k bench config so the
cache is shared with benchmarks/tpu_shard_compiled.py.)
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_only():
    if jax.default_backend() in ("cpu",):
        pytest.skip("compiled-TPU regression (interpret mode cannot catch "
                    "the Mosaic miscompile class)")


def test_sharded_banded_compiled_matches_unsharded(tpu_only):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _build_flagship_problem

    from tlfea.ops import pallas_fem
    from tlfea.parallel.shard_banded import shard_flagship
    from tlfea.parallel.sharding import make_elem_mesh, replicate
    from tlfea.solvers import newton
    from tlfea.solvers.coarse import build_coarse_precond

    n_steps = 5
    system, state, params, f_ext = _build_flagship_problem(42, 7, 6)
    psys = pallas_fem.with_pallas(system, banded="auto")
    assert getattr(psys.pallas, "banded", None) is not None
    coarse = build_coarse_precond(system, state.x, float(params.dt),
                                  float(params.rho))

    roll_ref = newton.make_rollout(psys, params, n_steps, coarse=coarse,
                                   precond_refresh=8)
    ref_fin, (_, ref_cg) = roll_ref(state, f_ext)
    jax.block_until_ready(ref_fin)

    mesh = make_elem_mesh(jax.devices()[:1])
    sbig = shard_flagship(psys, mesh)
    roll_sh = newton.make_rollout(sbig, params, n_steps, coarse=coarse,
                                  precond_refresh=8)
    sh_fin, (_, sh_cg) = roll_sh(replicate(state, mesh),
                                 replicate(f_ext, mesh))
    jax.block_until_ready(sh_fin)

    xr, xs = np.asarray(ref_fin.x), np.asarray(sh_fin.x)
    assert np.isfinite(xs).all()
    err = float(np.max(np.abs(xs - xr))) / (float(np.max(np.abs(xr))) or 1.0)
    assert err < 1e-6, f"compiled sharded path diverges: rel err {err:.3e}"
    cg_sh = float(np.median(np.asarray(sh_cg)))
    cg_ref = float(np.median(np.asarray(ref_cg)))
    assert abs(cg_sh - cg_ref) <= 2, (cg_sh, cg_ref)
