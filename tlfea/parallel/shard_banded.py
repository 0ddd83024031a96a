"""Multi-chip execution of the banded-Pallas flagship path (shard_map).

GSPMD cannot partition a custom Pallas call, so the element-axis SPMD of
`tlfea.parallel.sharding` (which covers every XLA-path op automatically)
leaves the banded fused gather/kernel/scatter kernels — the production
Newton hot loop (`ops/pallas_banded`, reference hot loop
`lib_src/solvers/SyncedNewton.cu:1038-1120`) — single-device. This module
shards them explicitly:

- The banded grid iterates ELEMENT BLOCKS (1024 elements each, sorted by
  window index `wb`). Blocks are split into `D` contiguous slabs, one per
  device; each device runs the SAME kernel over its local slab (per-block
  static tables + scatter schedules sharded along the block axis) against
  the REPLICATED node windows, accumulating into its own full-size window
  output buffer.
- Slab-local `first` flags are rebuilt so each slab's first block
  zero-inits its window (every device's output buffer starts as garbage);
  windows a slab never touches are masked to zero by a per-device
  `visited` mask before the cross-device reduction.
- One `psum` over the element axis combines the window outputs — the only
  collective the FEA assembly needs (shared nodes live in windows touched
  by blocks on both sides of a slab cut). The per-QP Hv prep cache is
  per-block and therefore stays SHARDED between the primal pass and the CG
  Hv kernels (no communication).
- Block-count padding uses inert blocks (zero static tables, empty scatter
  schedule, `wb` of the last real block): they compute zero contributions
  and write nothing, so any number of devices divides any mesh.

Everything around the kernels (CG recurrences, block-Jacobi and coarse
preconditioner applies, constraint folds) operates on replicated node
arrays — GSPMD handles those, no changes to the solver. `shard_flagship`
returns a System whose `pallas.banded` handle routes through shard_map;
`newton.make_step` / `make_rollout` / `__graft_entry__.dryrun_multichip`
then run the PRODUCTION configuration multi-chip unchanged (the handle
contract `primal_fn(win9, data)` / `hv_fn(dt, win3, prep, data)` is
preserved, with the sharded tables threaded through the jit boundary as
argument pytrees exactly like the single-device `bdata`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tlfea.ops.pallas_banded import BandedHandle
from tlfea.parallel.sharding import ELEM_AXIS, shard_system

__all__ = ["shard_banded_handle", "shard_flagship"]


def _pad_blocks(a, pad, fill):
    """Pad a (n_blocks, ...) table with `pad` inert blocks of `fill`."""
    if pad == 0:
        return jnp.asarray(a)
    widths = [(0, pad)] + [(0, 0)] * (np.ndim(a) - 1)
    return jnp.pad(jnp.asarray(a), widths, constant_values=fill)


def shard_banded_handle(bnd: BandedHandle, mesh, axis: str = ELEM_AXIS,
                        put: bool = True) -> BandedHandle:
    """Return a new BandedHandle whose hv_fn/primal_fn run under shard_map
    over `mesh`'s `axis`, with per-block tables sharded into contiguous
    device slabs. Metadata (window geometry, node count, element order) is
    unchanged, so `to_windows`/`from_windows` and the solver work as-is.

    put=True device_puts the sharded data leaves with their NamedSharding
    (skip for tracing-only contexts).
    """
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    nb = bnd.n_blocks
    bpd = -(-nb // D)  # blocks per device
    nbp = bpd * D
    pad = nbp - nb
    sched = bnd.sched

    # --- prefetch tables, padded + slab-local first flags ----------------
    wb = np.asarray(sched["wb"], np.int32)
    wb_p = np.concatenate([wb, np.full(pad, wb[-1], np.int32)])
    first_p = np.zeros(nbp, np.int32)
    first_p[1:] = (wb_p[1:] != wb_p[:-1]).astype(np.int32)
    first_p[0::bpd] = 1  # every slab's first block zero-inits its window
    r0_p = np.zeros((nbp, bnd.S), np.int32)
    r0_p[:nb] = np.asarray(sched["r0"], np.int32).reshape(nb, bnd.S)
    fid_p = np.zeros((nbp, bnd.I_cap), np.int32)
    fid_p[:nb] = np.asarray(sched["fid"], np.int32).reshape(nb, bnd.I_cap)
    rng_p = np.zeros((nbp, bnd.RT * 2), np.int32)
    rng_p[:nb] = np.asarray(sched["ranges"], np.int32).reshape(nb, -1)

    # Per-device visited mask: which windows this slab's blocks write
    # (incl. the zero-init of a slab-leading padding block — it contributes
    # exactly zero either way).
    visited_dev = np.zeros((D, bnd.n_wins, 1, 1), bool)
    for d in range(D):
        visited_dev[d, np.unique(wb_p[d * bpd:(d + 1) * bpd])] = True

    # --- device data tables, padded along the block axis -----------------
    fills = {"inv": -1, "comb": -1}
    data = {k: _pad_blocks(v, pad, fills.get(k, 0))
            for k, v in bnd.data.items()}
    data.update(
        wb=jnp.asarray(wb_p), first=jnp.asarray(first_p),
        r0=jnp.asarray(r0_p), fid=jnp.asarray(fid_p),
        ranges=jnp.asarray(rng_p), visited=jnp.asarray(visited_dev),
    )
    if put:
        esh = NamedSharding(mesh, P(axis))
        data = {k: jax.device_put(v, esh) for k, v in data.items()}

    data_spec = {k: P(axis) for k in data}
    n_wins = bnd.n_wins
    hv_call, primal_call = bnd.hv_call, bnd.primal_call
    blocks_call = bnd.blocks_call

    def _pre(d):
        return dict(wb=d["wb"], first=d["first"], r0=d["r0"].reshape(-1),
                    fid=d["fid"].reshape(-1), ranges=d["ranges"].reshape(-1))

    def _mask_psum(out, d):
        # Windows this slab never visited hold uninitialized device memory.
        out = jnp.where(d["visited"][0], out, jnp.zeros((), out.dtype))
        return jax.lax.psum(out, axis)

    def hv_fn(dt_arr, win3, prepT, data):
        def f(dt_arr, win3, prepT, d):
            out = hv_call(_pre(d), dt_arr, win3, prepT, d, grid=bpd)
            return _mask_psum(out, d)

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(axis), data_spec),
            out_specs=P(), check_vma=False,
        )(dt_arr, win3, prepT, data)

    def primal_fn(win9, data):
        def f(win9, d):
            out, prepT = primal_call(_pre(d), win9, d, grid=bpd)
            return _mask_psum(out, d), prepT

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), data_spec),
            out_specs=(P(), P(axis)), check_vma=False,
        )(win9, data)

    if blocks_call is not None:
        # Block-Jacobi assembly sharded the same way (6 SYM6 channels, one
        # psum): dropping it made the precond refresh fall back to the XLA
        # row-granular scatter-add — measured 5.4 ms per refresh at 10k on
        # the compiled sharded rollout (the banded kernel is ~20x cheaper).
        def blocks_fn(win3, data):
            def f(win3, d):
                out = blocks_call(_pre(d), win3, d, grid=bpd)
                return _mask_psum(out, d)

            return jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(), data_spec),
                out_specs=P(), check_vma=False,
            )(win3, data)
    else:
        blocks_fn = None

    kw = dict(bnd.__dict__)
    kw.update(hv_fn=hv_fn, primal_fn=primal_fn, data=data,
              n_blocks_padded=nbp, blocks_per_device=bpd, mesh=mesh,
              shard_axis=axis, blocks_fn=blocks_fn, blocks_call=blocks_call)
    return BandedHandle(**kw)


def shard_flagship(system, mesh, axis: str = ELEM_AXIS):
    """Shard the PRODUCTION (banded Pallas) system over `mesh`.

    - element arrays: contiguous slabs over the element axis (GSPMD handles
      every XLA-path consumer: constraint folds, mass, einsum fallbacks);
    - banded kernels: explicit shard_map over the element-BLOCK axis (see
      `shard_banded_handle`);
    - the flat per-element Pallas kernels (precond_fn / fn / hv_fn) are
      dropped from the handle: GSPMD cannot partition a pallas_call, so
      their consumers (`precond_blocks`, off-banded gradients) fall back to
      the XLA einsum path, which shards automatically. They are off the CG
      critical path (block-Jacobi assembly is frozen and refreshed every
      ~8 steps).

    Requires `system.pallas.banded` (build via
    `pallas_fem.with_pallas(system, banded=...)` first).
    """
    from tlfea.ops.pallas_fem import PallasContrib

    pal = system.pallas
    if pal is None or getattr(pal, "banded", None) is None:
        raise ValueError(
            "shard_flagship needs a banded Pallas system; build it with "
            "pallas_fem.with_pallas(system, banded='auto') first"
        )
    sbnd = shard_banded_handle(pal.banded, mesh, axis=axis)
    spal = PallasContrib(
        fn=None, S=pal.S, E=pal.E, E_pad=pal.E_pad,
        precond_fn=None, prep_fn=None, hv_fn=None, banded=sbnd,
    )
    ssys = shard_system(system, mesh)
    return ssys.replace(pallas=spal)
