"""Shared demo helpers: solver construction from CLI args, output dirs."""

from __future__ import annotations

import os

# The axon TPU plugin claims the default platform even when JAX_PLATFORMS is
# set in the environment; honor the env var explicitly.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from tlfea.solvers import adamw, nesterov, newton, vbd

REF_DATA = "/root/reference/data"


def accelerate(system):
    """Route the system through the Pallas element kernels (banded fused
    gather/scatter when the mesh's node numbering allows) on accelerator
    backends. No-op on CPU — interpret-mode Pallas is orders slower — and
    for materials without a tile algebra (SVK and Mooney-Rivlin both have
    one, `pallas_fem.tile_material`). Prescribed-motion demos should use
    `DensePins` constraints: FixedCoefs on a BANDED Pallas system must be
    jaxpr constants and retraces per retarget (newton._cons_closure);
    DensePins retargets data-only."""
    import jax

    if jax.default_backend() == "cpu":
        return system
    from tlfea.ops import pallas_fem

    try:
        pallas_fem.tile_material(system.material)
    except ValueError:
        return system
    try:
        return pallas_fem.with_pallas(system, banded="auto")
    except Exception:  # pragma: no cover — unsupported mesh/element family
        return system


def _auto_coarse(system, dt, rho):
    """Frozen two-level coarse preconditioner at the rest configuration
    (production Newton config — see bench.py). None when unsupported
    (non-SVK materials, degenerate meshes)."""
    try:
        from tlfea.elements.assembly import node_ref
        from tlfea.solvers.coarse import build_coarse_precond

        x0 = np.asarray(node_ref(system.elems))
        big = x0.shape[0] > 50_000
        return build_coarse_precond(
            system, x0, float(dt), float(rho), ranges=big,
            max_agg=1024 if big else 512,
            mm_dtype="bfloat16" if big else None,
        )
    except Exception:
        return None


def make_solver(name: str, system, dt: float, rho: float | None):
    """Per-solver parameter sets modeled on the reference's unified beam-sag
    driver (`lib_bin/beam_sag/test_ancf3243.cc:329-399`).

    Pass rho=None to derive the ALM penalty from the problem stiffness
    (`suggest_rho`: rho ~ E*h/dt, the scale that keeps constraint
    enforcement primal-stiff rather than dual-integral — PERF_NOTES.md)."""
    if rho is None:
        from tlfea.solvers import suggest_rho

        rho = suggest_rho(system.elems, system.material, dt)
    if name == "newton":
        # Production profile (bench.py): ONE outer per step — the ALM duals
        # persist in StepState and integrate ACROSS steps, so per-step
        # re-convergence of the outer loop is wasted work (measured on the
        # 14.5k-elem item drop: max_outer=3 with an f32-unreachable
        # absolute outer_tol burned 3 outers x ~4 Newton x ~28 CG every
        # step). inner_rtol carries the convergence; Eisenstat-Walker
        # forcing (NewtonParams default) + the frozen coarse correction
        # keep the CG budget honest.
        params = newton.NewtonParams(
            dt=dt, rho=rho, inner_atol=1e-7, inner_rtol=1e-4, outer_tol=0.0,
            max_outer=1, max_inner=6, cg_rtol=1e-3, cg_max_iter=50,
        )
        return newton.stepper(params, coarse=_auto_coarse(system, dt, rho))
    if name == "nesterov":
        params = nesterov.NesterovParams(
            dt=dt, rho=rho, alpha=1e-7, inner_tol=1e-9, outer_tol=1e-8,
            max_outer=3, max_inner=20000,
        )
        return nesterov.stepper(params)
    if name == "adamw":
        params = adamw.AdamWParams(
            dt=dt, rho=rho, lr=1e-3, inner_tol=1e-8, inner_rtol=1e-8,
            outer_tol=1e-8, max_outer=3, max_inner=20000,
            convergence_check_interval=50,
        )
        return adamw.stepper(params)
    if name == "vbd":
        params = vbd.VBDParams(
            dt=dt, rho=rho, omega=1.0, inner_tol=1e-7, outer_tol=1e-8,
            max_outer=3, max_sweeps=200, convergence_check_interval=8,
        )
        structures = vbd.prepare(system, group_size=params.color_group_size)
        return vbd.stepper(params, structures)
    raise SystemExit(f"unknown solver {name!r} (newton|nesterov|adamw|vbd)")


def out_dir(name: str) -> str:
    d = os.path.join("out", name)
    os.makedirs(d, exist_ok=True)
    return d


def tip_coef_3243(n_elem: int) -> int:
    """Position-coefficient index of the last beam node."""
    return 4 * n_elem  # node (n_elem), slot 0
