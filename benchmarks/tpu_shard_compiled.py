"""Compiled-TPU execution of the shard_map banded flagship path (VERDICT-r4
item 1).

The sharded banded kernels (`tlfea/parallel/shard_banded.py`) had only ever
executed in interpret mode on CPU — the one execution mode that hid both of
this repo's prior TPU Mosaic miscompiles (PERF_NOTES). This harness runs the
SAME shard_map + psum program Mosaic-compiled on the real chip over a
1-device mesh at the 10k bench scale and asserts trajectory + CG parity vs
the unsharded banded rollout.

Run: python benchmarks/tpu_shard_compiled.py [n_steps]
"""

import os
import sys
import time

os.environ.setdefault("TLFEA_NO_X64", "1")

import numpy as np


def main(n_steps=10):
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "out", "jit_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build_flagship_problem

    from tlfea.ops import pallas_fem
    from tlfea.parallel.sharding import make_elem_mesh, replicate
    from tlfea.parallel.shard_banded import shard_flagship
    from tlfea.solvers import newton
    from tlfea.solvers.coarse import build_coarse_precond

    assert jax.default_backend() != "cpu", "this harness needs the real TPU"

    # TLFEA_SHARD_SCALE=10k|100k (bench mesh configs).
    dims = {"10k": (42, 7, 6), "100k": (96, 16, 11)}[
        os.environ.get("TLFEA_SHARD_SCALE", "10k")]
    system, state, params, f_ext = _build_flagship_problem(*dims)
    psys = pallas_fem.with_pallas(system, banded="auto")
    assert getattr(psys.pallas, "banded", None) is not None, "banded not built"
    coarse = build_coarse_precond(system, state.x, float(params.dt),
                                  float(params.rho))

    # --- unsharded banded rollout (the production bench path) -------------
    t0 = time.monotonic()
    roll_ref = newton.make_rollout(psys, params, n_steps, coarse=coarse,
                                   precond_refresh=8)
    ref_fin, (ref_nit, ref_cg) = roll_ref(state, f_ext)
    jax.block_until_ready(ref_fin)
    print(f"[unsharded] compile+run {time.monotonic()-t0:.1f}s", flush=True)
    t0 = time.monotonic()
    ref_fin2, _ = roll_ref(ref_fin, f_ext)
    jax.block_until_ready(ref_fin2)
    ref_ms = (time.monotonic() - t0) / n_steps * 1e3

    # --- sharded (1-device mesh): same program, Mosaic-compiled -----------
    mesh = make_elem_mesh(jax.devices()[:1])
    sbig = shard_flagship(psys, mesh)
    t0 = time.monotonic()
    roll_sh = newton.make_rollout(sbig, params, n_steps, coarse=coarse,
                                  precond_refresh=8)
    sf_ext = replicate(f_ext, mesh)
    sh_fin, (sh_nit, sh_cg) = roll_sh(replicate(state, mesh), sf_ext)
    jax.block_until_ready(sh_fin)
    print(f"[sharded-1dev] compile+run {time.monotonic()-t0:.1f}s", flush=True)
    # Timed call MUST reuse the warmup call's input shardings (an
    # unreplicated f_ext here re-traced inside the timed region — measured
    # as a phantom 1460x "regression").
    t0 = time.monotonic()
    sh_fin2, _ = roll_sh(sh_fin, sf_ext)
    jax.block_until_ready(sh_fin2)
    sh_ms = (time.monotonic() - t0) / n_steps * 1e3
    # Per-dispatch breakdown: repeated dispatches separate the fixed host/
    # tunnel cost from the device program (trace r5: device span 4.1 ms/step
    # vs 20.9 host — most of the sharded "slowdown" was host-side).
    for k in range(3):
        t0 = time.monotonic()
        sh_fin2, _ = roll_sh(sh_fin2, sf_ext)
        jax.block_until_ready(sh_fin2)
        print(f"  sharded dispatch {k}: "
              f"{(time.monotonic()-t0)/n_steps*1e3:.2f} ms/step", flush=True)

    xr, xs = np.asarray(ref_fin.x), np.asarray(sh_fin.x)
    assert np.isfinite(xs).all(), "sharded compiled rollout non-finite"
    scale = float(np.max(np.abs(xr))) or 1.0
    err = float(np.max(np.abs(xs - xr))) / scale
    cg_ref = float(np.median(np.asarray(ref_cg)))
    cg_sh = float(np.median(np.asarray(sh_cg)))
    moved = float(np.abs(xs - np.asarray(state.x)).max())
    print(f"trajectory rel err (sharded vs unsharded, {n_steps} steps): "
          f"{err:.3e}; max |dx| {moved:.3e}")
    print(f"cg/step median: sharded {cg_sh} vs unsharded {cg_ref}; "
          f"newton {float(np.median(np.asarray(sh_nit)))} vs "
          f"{float(np.median(np.asarray(ref_nit)))}")
    print(f"ms/step: sharded {sh_ms:.2f} vs unsharded {ref_ms:.2f}")
    # The D=1 slab runs the identical block schedule; only the shard_map /
    # masked-psum wrapper differs -> bit-level-close trajectories. The prior
    # miscompiles produced O(1) corruption, far beyond this bound.
    assert err < 1e-6, f"sharded compiled path diverges: {err:.3e}"
    assert abs(cg_sh - cg_ref) <= 2, (cg_sh, cg_ref)
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
