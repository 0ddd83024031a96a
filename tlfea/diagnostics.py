"""Simulation diagnostics: energies, momenta, convergence summaries.

The reference's observability is printf-based (`SURVEY §5`); these are
jittable reductions usable inside stepping loops or offline.
"""

from __future__ import annotations

import jax.numpy as jnp

from tlfea.elements.assembly import ElementBatch, deformation_gradient, mass_matvec, lumped_mass

__all__ = ["kinetic_energy", "strain_energy", "linear_momentum", "energy_report"]


def kinetic_energy(v: jnp.ndarray, elems: ElementBatch) -> jnp.ndarray:
    """(1/2) v^T M v with the consistent mass."""
    return 0.5 * jnp.sum(v * mass_matvec(v, elems))


def strain_energy(x: jnp.ndarray, elems: ElementBatch, material) -> jnp.ndarray:
    """Total strain energy = sum_qp W(F) dV. Requires
    `material.energy_density`. Consistency: f_int = d/dx of this (tested)."""
    F = deformation_gradient(x, elems)
    W = material.energy_density(F)
    return jnp.sum(W * elems.dV)


def linear_momentum(v: jnp.ndarray, elems: ElementBatch) -> jnp.ndarray:
    """Total linear momentum M v summed over coefficients -> (3,)."""
    return jnp.sum(mass_matvec(v, elems), axis=0)


def energy_report(x, v, elems, material) -> dict:
    return {
        "kinetic": kinetic_energy(v, elems),
        "strain": strain_energy(x, elems, material),
        "momentum": linear_momentum(v, elems),
    }
