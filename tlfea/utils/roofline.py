"""Analytic FLOP / HBM-byte cost model for the hot solver kernels.

Provides the MFU / roofline figures the bench records per scale (VERDICT-r2
item 9): `step_cost` estimates the bytes and FLOPs one converged Newton step
moves through the banded Pallas kernels, so achieved bandwidth can be
compared against the chip's HBM roofline. The reference reports raw
steps/s only (`lib_bin/benchmark/*.cc`); an explicit cost model is how we
substantiate "fast" beyond normalized throughput.

Model scope and honesty:
- BYTE counts follow the kernels' actual DMA schedule (per-block contiguous
  tiles, `pallas_banded._blk_tiles`): static element tables (grad_N, dV,
  Me, shuffle/index tables), the per-QP prep cache, and the node windows.
  Coarse-preconditioner apply traffic and XLA glue ops (CG axpy/dots,
  constraint folds) are NOT counted, so `roofline_pct` is a LOWER bound on
  achieved HBM utilization.
- FLOP counts are per-element polynomial counts of the tile algebra
  (contractions, stress core, output accumulation, one-hot shuffles); they
  are estimates good to ~20%, which is ample given these kernels are
  DMA-bound (PERF_NOTES: the Hv kernel's touch-only DMA floor was ~80% of
  its runtime at 100k elems).

Peak numbers default to TPU v5e (single chip): 819 GB/s HBM, 197 bf16
TFLOP/s MXU peak (the conventional MFU denominator; these kernels run on
the VPU, so MFU is structurally small — roofline_pct is the meaningful
figure).
"""

from __future__ import annotations

__all__ = ["banded_kernel_cost", "step_cost", "chip_peaks",
           "V5E_HBM_BPS", "V5E_PEAK_FLOPS"]

V5E_HBM_BPS = 819e9  # bytes/s
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak (MFU denominator)

# Per-generation peak numbers (public spec sheets): device kind (as reported
# by jax Device.device_kind, lowercased substring) -> (HBM bytes/s, bf16
# peak FLOP/s). roofline_pct/mfu_pct are silently wrong if computed against
# the wrong generation — `chip_peaks` detects the attached chip and the
# bench records the assumed kind next to the percentages.
_CHIP_PEAKS = {
    "v5e": (819e9, 197e12),
    "v5p": (2765e9, 459e12),
    "v4": (1228e9, 275e12),
    "v6e": (1640e9, 918e12),  # trillium
    "v6": (1640e9, 918e12),
    # jax Device.device_kind spellings (measured on this tunnel:
    # device_kind == "TPU v5 lite" for v5e; "lite" marks the e-variants).
    "v5 lite": (819e9, 197e12),
    "v5litepod": (819e9, 197e12),
    "v6 lite": (1640e9, 918e12),
    "v5": (2765e9, 459e12),  # non-lite v5 == v5p
}

# Canonical label per matched key (the bench records this string).
_CHIP_CANON = {"v5 lite": "v5e", "v5litepod": "v5e", "v6 lite": "v6e",
               "v5": "v5p", "v6": "v6e"}


def chip_peaks(default_kind="v5e"):
    """(hbm_bps, peak_flops, kind_str) for the first attached accelerator.

    Falls back to `default_kind` (and labels it "assumed") when no TPU is
    attached or the kind string is unrecognized.
    """
    kind = None
    try:
        import jax

        for d in jax.devices():
            if d.platform != "cpu":
                kind = str(getattr(d, "device_kind", "") or "").lower()
                break
    except Exception:  # pragma: no cover
        pass
    if kind:
        for key, (bps, flops) in sorted(_CHIP_PEAKS.items(),
                                        key=lambda kv: -len(kv[0])):
            if key in kind:
                return bps, flops, _CHIP_CANON.get(key, key)
    bps, flops = _CHIP_PEAKS[default_kind]
    return bps, flops, f"{default_kind} (assumed)"

# SVK/MR tile-algebra core FLOPs per quadrature point (per element lane),
# counted from `pallas_fem._SVKTile` / `_MRTile`: symmetrized gradient
# products, stress assembly, directional-derivative chain.
_HV_CORE = {"svk": (190, 330), "mr": (560, 700)}  # (undamped, damped)
_PRIMAL_CORE = {"svk": (150, 260), "mr": (420, 560)}


def banded_kernel_cost(handle, material, itemsize=4, hv_itemsize=None):
    """(bytes, flops) per invocation of the banded primal and Hv kernels.

    handle: `pallas_banded.BandedHandle` (fields E_pad, S, Q, PR, W,
    n_blocks, I_cap, K). Returns dict with 'hv_bytes', 'hv_flops',
    'primal_bytes', 'primal_flops'.
    """
    from tlfea.ops.pallas_fem import EBLK, tile_material

    mops = tile_material(material)
    S, Q, PR = handle.S, handle.Q, handle.PR
    nb, W, I_cap, K = handle.n_blocks, handle.W, handle.I_cap, handle.K
    hvi = hv_itemsize or itemsize

    # Static per-block element tables (bytes/elem-lane): grad_N (Q*S*3),
    # dV (Q), Me (S*S), gather shuffle table cl (S, int32), scatter inverse
    # tables (I_cap rows, int8-packed in VMEM but DMA'd as int32 lanes).
    static_vals = Q * S * 3 + Q + S * S + S
    tables = nb * EBLK * (static_vals * itemsize + I_cap)
    # Windows: node-value DMA per block (values * 3 components); outputs are
    # read-modify-write accumulated (x2).
    win_hv = nb * W * 3 * (1 + 2) * itemsize
    win_primal = nb * W * 3 * (3 + 2) * itemsize  # packed u|v|dv in
    prep = nb * EBLK * PR  # per-QP cache rows
    hv_bytes = tables + win_hv + prep * hvi
    primal_bytes = tables + win_primal + prep * itemsize

    # FLOPs per element: gradient contraction (9 entries x S fma), material
    # core, per-slot output accumulation (~20 S), consistent-mass term
    # (6 S^2), one-hot shuffle gather/scatter (~4 ops x K x S x channels).
    idx = 1 if mops.damped else 0
    key = getattr(mops, "name", "svk")
    hv_core = _HV_CORE.get(key, _HV_CORE["svk"])[idx]
    pr_core = _PRIMAL_CORE.get(key, _PRIMAL_CORE["svk"])[idx]
    E = handle.E_pad  # padded lanes do the work too
    shuffle = 4 * K * S * 3
    hv_flops = E * (Q * (18 * S + hv_core + 20 * S) + 6 * S * S + 2 * shuffle)
    nch = 9 if mops.damped else 6
    primal_flops = E * (
        Q * (nch * 3 * S + pr_core + 20 * S) + 6 * S * S + 2 * shuffle
    )
    return dict(hv_bytes=hv_bytes, hv_flops=hv_flops,
                primal_bytes=primal_bytes, primal_flops=primal_flops)


def flat_kernel_cost(system, itemsize=4):
    """(bytes, flops) per primal / Hv pass of the FLAT Pallas path
    (`pallas_fem.g_and_hvp`): per-element static tables + the XLA
    row-granular gather/scatter of node values around each kernel. A LOWER
    bound (layout transposes between the gathers and the (8,128) kernel
    tiles are not counted)."""
    from tlfea.ops.pallas_fem import tile_material

    pal = system.pallas
    mops = tile_material(system.material)
    E, S = system.elems.conn.shape
    Q = int(system.elems.grad_N.shape[1])
    PR = Q * mops.prep_rows
    static_vals = Q * S * 3 + Q + S * S + S  # gN, dV, Me, conn
    tables = pal.E_pad * static_vals * itemsize
    gs = E * S * 3 * 2 * itemsize  # gather + scatter of (E,S,3) node rows
    prep = pal.E_pad * PR * itemsize
    idx = 1 if mops.damped else 0
    key = getattr(mops, "name", "svk")
    hv_core = _HV_CORE.get(key, _HV_CORE["svk"])[idx]
    pr_core = _PRIMAL_CORE.get(key, _PRIMAL_CORE["svk"])[idx]
    nch = 9 if mops.damped else 6
    hv_flops = pal.E_pad * (Q * (18 * S + hv_core + 20 * S) + 6 * S * S)
    primal_flops = pal.E_pad * (
        Q * (nch * 3 * S + pr_core + 20 * S) + 6 * S * S
    )
    return dict(hv_bytes=tables + gs + prep, hv_flops=hv_flops,
                primal_bytes=tables + gs + prep, primal_flops=primal_flops)


def step_cost(system, newton_per_step, cg_per_step, itemsize=4,
              hv_itemsize=None):
    """Estimated (bytes, flops) moved per converged Newton step through the
    element kernels + block-Jacobi preconditioner apply.

    Per step: `newton_per_step` primal+prep passes, `cg_per_step` Hv
    kernels, and per CG iteration one block-Jacobi apply (read n 3x3 blocks
    + ~6 n-vector touches for the CG recurrences). Uses the banded kernels'
    DMA schedule when the system carries a banded handle, else the flat
    Pallas path's table+gather/scatter model (`flat_kernel_cost`); returns
    None for plain-XLA systems."""
    pal = getattr(system, "pallas", None)
    bnd = getattr(pal, "banded", None) if pal is not None else None
    if bnd is not None:
        kc = banded_kernel_cost(bnd, system.material, itemsize=itemsize,
                                hv_itemsize=hv_itemsize)
        n = bnd.n
    elif pal is not None and getattr(pal, "hv_fn", None) is not None:
        kc = flat_kernel_cost(system, itemsize=itemsize)
        n = int(system.elems.n_coef)
    else:
        return None
    pc_bytes = n * (9 + 6 * 3) * itemsize  # blocks + CG vector recurrences
    pc_flops = n * (15 + 6) * 3
    bytes_step = (newton_per_step * kc["primal_bytes"]
                  + cg_per_step * (kc["hv_bytes"] + pc_bytes))
    flops_step = (newton_per_step * kc["primal_flops"]
                  + cg_per_step * (kc["hv_flops"] + pc_flops))
    return dict(bytes=float(bytes_step), flops=float(flops_step), **kc)
