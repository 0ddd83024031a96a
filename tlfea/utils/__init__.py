"""Host-side utilities: quadrature tables, mesh IO/generation, coloring, exporters."""

from tlfea.utils import quadrature, tetmesh  # noqa: F401
