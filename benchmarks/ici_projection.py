"""Honest multi-chip projection for the sharded banded flagship path
(VERDICT-r4 item 9): compute the bytes `psum`'d per Hv / per step at the
100k scale over D devices, and fold an ICI-bandwidth term into the roofline
model so vs_target's 8-chip linearity assumption becomes a stated,
quantified model.

Host-only (builds the banded handle, no TPU needed):
    python benchmarks/ici_projection.py

Model:
- Sharded work: the banded primal/Hv/blocks kernels split their element
  blocks into D slabs (parallel/shard_banded.py); per-device kernel bytes =
  1/D of the single-chip DMA schedule.
- Collective: ONE psum of the full window output buffer per kernel call
  (n_wins * C * 2W floats). Ring all-reduce moves 2(D-1)/D x buffer bytes
  over ICI per device.
- Replicated glue: CG recurrences, block-Jacobi apply, coarse apply, and
  per-step vector ops run on REPLICATED node arrays (GSPMD replicates them)
  — they scale with the chip's HBM speed but NOT with D. This is the
  honest non-linear term the naive "x8" hides.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.ops import pallas_banded
from tlfea.solvers import System
from tlfea.utils.reorder import apply_node_order, best_order
from tlfea.utils.tetmesh import box_t10_mesh
from tlfea.utils.roofline import banded_kernel_cost, _CHIP_PEAKS

# Public ICI bandwidth per chip (spec sheets): v5e 1,600 Gbps = 200 GB/s,
# v5p 4,800 Gbps = 600 GB/s, v4 2,400 Gbps = 300 GB/s.
ICI_BPS = {"v5e": 200e9, "v5p": 600e9, "v4": 300e9, "v6e": 448e9}

# Measured single-chip v5e decomposition of the 100k production step
# (PERF_NOTES round-5 trace; update when the trace changes). Values in ms.
MEASURED_V5E = {
    "kernels_shardable": None,   # filled from cost model below
    "replicated_glue": None,
}


def main(D=8, chip="v5p", newton=1.3, cg=7.0):
    dtype = np.float32
    L, W, H, nx, ny, nz = 4.0, 0.7, 0.6, 96, 16, 11  # 101,376 elems
    nodes, conn = box_t10_mesh(L, W, H, nx, ny, nz)
    nodes, conn = apply_node_order(nodes, conn, best_order(nodes, conn))
    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
              eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    bnd = pallas_banded.build_banded(elems, mat, dtype=dtype)

    n = bnd.n
    kc = banded_kernel_cost(bnd, mat)
    # psum buffer: full window output (n_wins, 3*WR2, ROW) f32 per force
    # kernel; 6 channels for the blocks kernel.
    win_bytes3 = bnd.n_wins * 3 * bnd.WR2 * 128 * 4
    kernels_per_step = newton + cg  # primal + Hv calls
    psum_per_step = kernels_per_step * win_bytes3  # blocks kernel amortized /8
    ring = 2 * (D - 1) / D
    ici_bps = ICI_BPS[chip]
    hbm_bps, _ = _CHIP_PEAKS[chip]

    t_ici_ms = psum_per_step * ring / ici_bps * 1e3
    kernel_bytes = newton * kc["primal_bytes"] + cg * kc["hv_bytes"]
    t_kern_ms = kernel_bytes / D / hbm_bps * 1e3
    # Replicated glue, scaled from the measured v5e trace by HBM ratio:
    # coarse apply 2.9 ms + CG glue 1.0 + per-step vector ops 1.5 + bj apply
    # (inside glue) at 819 GB/s.
    glue_v5e_ms = 2.9 + 1.0 + 1.5
    t_glue_ms = glue_v5e_ms * (819e9 / hbm_bps)

    total = t_kern_ms + t_ici_ms + t_glue_ms
    print(f"100k ({conn.shape[0]} elems / {n} nodes), {newton} Newton + "
          f"{cg} CG per step, windows: n_wins={bnd.n_wins} W={bnd.W}")
    print(f"psum buffer: {win_bytes3/1e6:.2f} MB/kernel; "
          f"{psum_per_step/1e6:.1f} MB/step; ring factor {ring:.2f}")
    print(f"projected {chip}-{D}: kernels {t_kern_ms:.2f} ms (sharded /{D}) "
          f"+ ICI {t_ici_ms:.2f} ms + replicated glue {t_glue_ms:.2f} ms "
          f"= {total:.2f} ms/step")
    print("NOTE: glue term scaled from the measured v5e trace "
          f"({glue_v5e_ms} ms) by HBM ratio; it does NOT shrink with D — "
          "the dominant term at high D until node arrays are sharded too.")
    return total


if __name__ == "__main__":
    main(D=int(os.environ.get("D", 8)), chip=os.environ.get("CHIP", "v5p"))
