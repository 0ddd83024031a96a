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
        # inner_rtol carries the convergence; the absolute tolerance is kept
        # loose because float32 residuals floor at percent-of-load levels on
        # TPU (PERF_NOTES.md). max_inner bounds the cost either way.
        params = newton.NewtonParams(
            dt=dt, rho=rho, inner_atol=1e-7, inner_rtol=1e-4, outer_tol=1e-8,
            max_outer=3, max_inner=8, cg_rtol=1e-4, cg_max_iter=100,
        )
        return newton.stepper(params)
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
