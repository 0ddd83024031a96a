"""Element families, all lowering to the unified `ElementBatch` pytree."""

from tlfea.elements.assembly import (  # noqa: F401
    ElementBatch,
    deformation_gradient,
    internal_force,
    mass_matvec,
)
from tlfea.elements import feat10  # noqa: F401
