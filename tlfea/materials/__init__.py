"""Hyperelastic material models + Kelvin-Voigt viscous damping.

Each material is a pytree dataclass whose fields are scalar parameters, with a
`first_piola(F)` method mapping deformation gradients (..., 3, 3) to the first
Piola-Kirchhoff stress (..., 3, 3). Because materials are pytrees, jitted
solver steps are polymorphic over the material without retracing per scalar
value; because `first_piola` is a pure jnp function, exact tangents come from
`jax.jvp` — no hand-derived 4th-order tensors needed (the reference derives
them by hand: `lib_src/materials/MooneyRivlin.cuh:113-225`).
"""

from tlfea.materials.svk import SVK, lame_from_E_nu
from tlfea.materials.mooney_rivlin import MooneyRivlin

__all__ = ["SVK", "MooneyRivlin", "lame_from_E_nu"]
