"""Colored Vertex Block Descent implicit solver.

Nonlinear block Gauss-Seidel over graph-colored coefficients: per color, every
coefficient independently solves its local 3x3 system

  H_a dv_a = -R_a,
  R_a = [M (v - v_prev)/h]_a + f_int,a - f_ext,a + h (lam + rho c)_a
  H_a = (M_aa/h) I + h * sum_{(e,q) incident} K_block(F_eq, gradN_eqa) dV
        [+ h^2 rho I on pinned coefficients]

with Hessian symmetrization + trace-scaled regularization and an
omega-relaxed update (reference: `lib_src/solvers/SyncedVBD.cu:162-377`).
Stress state (F, P) is cached and refreshed once per color *group*, the
reference's `color_group_size` staleness/throughput trade
(`SyncedVBD.cu:950-996, 1255-1285`).

TPU mapping (SURVEY P7/P8): colors are host-precomputed; each color update is
a batched gather -> 3x3 solve -> masked scatter over the color's padded node
set; the per-sweep CUDA-graph replay becomes one jitted `lax.while_loop`.
Within a color no two nodes share an element, so the updates are exactly
parallel — the same invariant the reference's coloring guarantees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tlfea.elements.assembly import deformation_gradient, total_piola, mass_diag
from tlfea.ops.linalg import solve3x3
from tlfea.solvers.common import StepState, System, grad_L, flat_norm
from tlfea.utils.coloring import colors_and_incidence, pad_colors

__all__ = ["VBDParams", "VBDStructures", "prepare", "make_step"]


@struct.dataclass
class VBDParams:
    """Reference: `SyncedVBD.cuh:28-36`."""

    dt: jnp.ndarray = 1e-3
    rho: jnp.ndarray = 1e6
    omega: jnp.ndarray = 1.0  # relaxation
    hess_eps: jnp.ndarray = 1e-9  # trace-scaled regularization
    inner_tol: jnp.ndarray = 1e-6  # residual-norm tolerance
    outer_tol: jnp.ndarray = 1e-8
    max_outer: int = struct.field(pytree_node=False, default=4)
    max_sweeps: int = struct.field(pytree_node=False, default=50)
    color_group_size: int = struct.field(pytree_node=False, default=4)
    convergence_check_interval: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class VBDStructures:
    """Static coloring/incidence data (host-precomputed)."""

    color_nodes: jnp.ndarray  # (G, gs, M) int32
    color_mask: jnp.ndarray  # (G, gs, M) bool
    inc: jnp.ndarray  # (n_coef, max_inc, 2) int32 (elem, local)
    inc_mask: jnp.ndarray  # (n_coef, max_inc) bool
    fixed_map: jnp.ndarray  # (n_coef,) int32: constraint slot or -1
    m_diag: jnp.ndarray  # (n_coef,) consistent-mass diagonal
    n_groups: int = struct.field(pytree_node=False)
    group_size: int = struct.field(pytree_node=False)


def prepare(system: System, group_size: int = 4, dtype=None) -> VBDStructures:
    """Host-side coloring + incidence (the reference's lazy
    `InitializeColoring` / `InitializeFixedMap` / `InitializeMassDiagBlocks`,
    `SyncedVBD.cu:764-1118`)."""
    conn = np.asarray(system.elems.conn)
    n_coef = system.elems.n_coef
    colors, inc, inc_mask = colors_and_incidence(conn, n_coef)
    nodes, mask = pad_colors(colors, group_size)

    fixed_map = np.full(n_coef, -1, dtype=np.int32)
    cons = system.constraints
    if cons is not None:
        if not hasattr(cons, "idx"):
            # Parity with the reference: its VBD also only handles pin
            # constraints (`SyncedVBD.cu:1089-1118`); welded/linear rows
            # would need cross-node coupling inside the block solve.
            raise ValueError(
                "VBD supports FixedCoefs (pin) constraints only; got "
                f"{type(cons).__name__} — use the newton/nesterov/adamw "
                "solvers for linear constraints"
            )
        idx = np.asarray(cons.idx)
        fixed_map[idx] = np.arange(idx.shape[0], dtype=np.int32)

    md = mass_diag(system.elems)
    return VBDStructures(
        color_nodes=jnp.asarray(nodes),
        color_mask=jnp.asarray(mask),
        inc=jnp.asarray(inc),
        inc_mask=jnp.asarray(inc_mask),
        fixed_map=jnp.asarray(fixed_map),
        m_diag=md if dtype is None else md.astype(dtype),
        n_groups=int(nodes.shape[0]),
        group_size=int(nodes.shape[1]),
    )


def _color_update(v, x_prev, v_prev, lam, f_ext, F, P, nodes, nmask, structures, params, system):
    """One color's parallel block update. nodes: (M,), nmask: (M,)."""
    elems = system.elems
    dt = params.dt
    inv_h = 1.0 / dt

    inc = structures.inc[nodes]  # (M, I, 2)
    imask = structures.inc_mask[nodes] & nmask[:, None]  # (M, I)
    e_ids = inc[..., 0]  # (M, I)
    a_ids = inc[..., 1]  # (M, I)

    # ---- residual: consistent-mass row term (exact: global row = sum of
    # incident element rows).
    dv_h = (v - v_prev) * inv_h  # (n_coef, 3)
    conn_e = elems.conn[e_ids]  # (M, I, S)
    m_rows = jnp.take_along_axis(
        elems.mass_elem[e_ids], a_ids[:, :, None, None], axis=2
    )[:, :, 0, :]  # (M, I, S)
    dv_gather = dv_h[conn_e]  # (M, I, S, 3)
    r_mass = jnp.einsum("mis,misd->md", jnp.where(imask[..., None], m_rows, 0.0), dv_gather)

    # ---- residual: internal force from cached P.
    P_g = P[e_ids]  # (M, I, Q, 3, 3)
    gN = jnp.take_along_axis(
        elems.grad_N[e_ids], a_ids[:, :, None, None, None], axis=3
    )[:, :, :, 0, :]  # (M, I, Q, 3)
    dV_g = elems.dV[e_ids]  # (M, I, Q)
    dV_g = jnp.where(imask[..., None], dV_g, 0.0)
    r_int = jnp.einsum("miqde,miqe,miq->md", P_g, gN, dV_g)

    r = r_mass + r_int - f_ext[nodes]

    # ---- Hessian: mass diag + tangent blocks from cached F.
    F_g = F[e_ids]  # (M, I, Q, 3, 3)
    Kb = system.material.tangent_diag_block(F_g, gN)  # (M, I, Q, 3, 3)
    H = jnp.einsum("miqde,miq->mde", Kb, dV_g * dt)
    eye = jnp.eye(3, dtype=v.dtype)
    H = H + (structures.m_diag[nodes] * inv_h)[:, None, None] * eye

    # ---- pin constraints.
    cons = system.constraints
    if cons is not None:
        k = structures.fixed_map[nodes]  # (M,)
        pinned = k >= 0
        ks = jnp.where(pinned, k, 0)
        x_node = x_prev[nodes] + dt * v[nodes]
        c = x_node - cons.target[ks]
        lam_k = lam[ks]
        r = r + jnp.where(pinned[:, None], dt * (lam_k + params.rho * c), 0.0)
        H = H + jnp.where(pinned[:, None, None], dt * dt * params.rho * eye, 0.0)

    # ---- symmetrize + trace-scaled regularization (SyncedVBD.cu:355-369).
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    tr = H[..., 0, 0] + H[..., 1, 1] + H[..., 2, 2]
    eps_reg = params.hess_eps * jnp.maximum(1.0, tr)
    H = H + eps_reg[:, None, None] * eye

    dv = -solve3x3(H, r, eps=1e-30)  # (M, 3)
    dv = jnp.where(nmask[:, None], params.omega * dv, 0.0)

    v = v.at[nodes].add(dv)
    # Re-scatter may hit padded node 0 with zero dv — harmless.
    x_nodes = x_prev[nodes] + dt * v[nodes]
    x = x_prev + dt * v  # cheap full refresh keeps x consistent everywhere
    del x_nodes
    return v, x


def _step_impl(system: System, structures: VBDStructures, params: VBDParams, state: StepState, f_ext):
    elems = system.elems
    cons = system.constraints
    dt = params.dt

    def sweep(v, x_prev, v_prev, lam, f_ext):
        """One full inner sweep over all color groups."""
        x = x_prev + dt * v
        for g in range(structures.n_groups):
            # Refresh cached stress once per group (reference:
            # vbd_compute_p per group, SyncedVBD.cu:1255-1285).
            F = deformation_gradient(x, elems)
            P = total_piola(x, v, elems, system.material)

            def color_body(s, carry):
                v, x = carry
                nodes = structures.color_nodes[g, s]
                nmask = structures.color_mask[g, s]
                return _color_update(
                    v, x_prev, v_prev, lam, f_ext, F, P, nodes, nmask,
                    structures, params, system,
                )

            v, x = jax.lax.fori_loop(
                0, structures.group_size, color_body, (v, x)
            )
        return v, x

    def inner(v0, x_prev, v_prev, lam, f_ext):
        def g_of(v):
            return grad_L(v, x_prev, v_prev, lam, f_ext, dt, params.rho, system)

        def cond(carry):
            _, k, done = carry
            return jnp.logical_and(k < params.max_sweeps, jnp.logical_not(done))

        def body(carry):
            v, k, done = carry
            v, _ = sweep(v, x_prev, v_prev, lam, f_ext)
            check = (k % params.convergence_check_interval) == 0
            norm_g = jnp.where(check, flat_norm(g_of(v)), jnp.inf)
            done = jnp.logical_or(done, norm_g < params.inner_tol)
            return (v, k + 1, done)

        v, sweeps, _ = jax.lax.while_loop(cond, body, (v0, 0, False))
        return v, sweeps

    def _run(state: StepState, f_ext):
        x_prev = state.x

        def outer_body(carry):
            v, v_prev, lam, k, _, sweeps_tot = carry
            v, n_sweeps = inner(v, x_prev, v_prev, lam, f_ext)
            v_prev = v
            if cons is not None:
                c = cons.eval_c(x_prev + dt * v)
                lam = lam + params.rho * c  # SyncedVBD.cu:456-464
                norm_c = flat_norm(c)
            else:
                norm_c = jnp.zeros((), dtype=v.dtype)
            return (v, v_prev, lam, k + 1, norm_c, sweeps_tot + n_sweeps)

        def outer_cond(carry):
            _, _, _, k, norm_c, _ = carry
            return jnp.logical_and(
                k < params.max_outer, jnp.logical_or(k == 0, norm_c >= params.outer_tol)
            )

        init = (state.v, state.v, state.lam, 0, jnp.asarray(jnp.inf, state.v.dtype), 0)
        v, _, lam, outers, norm_c, sweeps = jax.lax.while_loop(outer_cond, outer_body, init)
        x = x_prev + dt * v
        return StepState(x=x, v=v, lam=lam), {
            "outer_iters": outers,
            "sweeps": sweeps,
            "norm_c": norm_c,
        }

    return _run(state, f_ext)


def make_step(system: System, params: VBDParams, structures: VBDStructures | None = None):
    """Return a jitted step(state, f_ext) for a fixed system."""
    if structures is None:
        structures = prepare(system, group_size=params.color_group_size)

    @jax.jit
    def _f(state, f_ext):
        return _step_impl(system, structures, params, state, f_ext)

    return _f


def stepper(params: VBDParams, structures: VBDStructures):
    """Return a jitted step(system, state, f_ext) — the `Simulation`
    contract, supporting dynamic constraint targets / material params."""

    @jax.jit
    def _f(system, state, f_ext):
        return _step_impl(system, structures, params, state, f_ext)

    return _f
