"""tlfea — a TPU-native Total-Lagrangian FEA framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of uwsbel/Total-Lagrangian-FEA
("RoboDyna" / "TL-FEA", CUDA C++) designed for TPU hardware:

- Element families: FEAT10 (10-node quadratic tetrahedron), ANCF3243 (beam),
  ANCF3443 (shell), all expressed through one unified device-side element
  pytree so a single set of jitted kernels serves every family.
- Materials: St. Venant-Kirchhoff, compressible Mooney-Rivlin, plus
  Kelvin-Voigt viscous damping.
- Implicit backward-Euler time stepping as Augmented-Lagrangian optimization
  over velocities, with four interchangeable inner solvers: Newton-PCG
  (matrix-free, JVP Hessian-vector products — the TPU-native replacement for
  the reference's cuDSS direct solve), Nesterov, AdamW, and colored
  Vertex-Block-Descent.
- Hydroelastic contact-patch collision pipeline (broadphase sweep-and-prune +
  Drake-style pressure-field narrowphase), fully on-device with static shapes.
- SPMD scaling over `jax.sharding.Mesh` (element/node axis sharding).

Precision: the reference is float64 throughout. We default to x64 enabled so
CPU validation matches the reference bit-for-bit in structure; all kernels are
dtype-polymorphic so TPU runs can use float32/bfloat16 where appropriate.
Set TLFEA_NO_X64=1 before import to keep JAX's default float32.
"""

import os as _os

if not _os.environ.get("TLFEA_NO_X64"):
    import jax as _jax

    # x64 is for CPU validation only: TPUs have no native f64, and the
    # emulation both runs ~40x slow and can FAULT the TPU worker inside
    # Pallas kernels (measured: a full worker crash/restart running an
    # example without TLFEA_NO_X64 on the axon tunnel). Probe the default
    # backend and keep f32 on accelerators; set JAX_PLATFORMS=cpu (plus
    # jax.config jax_platforms, see CLAUDE.md) BEFORE importing tlfea to
    # get f64 validation semantics.
    try:
        _backend = _jax.default_backend()
    except Exception:  # pragma: no cover — no backend at all
        _backend = "cpu"
    if _backend == "cpu":
        _jax.config.update("jax_enable_x64", True)

# TPU einsums/dot_generals default to bf16 multiply passes, which introduces
# ~1-3% errors in deformation-gradient/stress contractions — unacceptable for
# FEA. Force true float32 (no effect on CPU/f64). The Pallas element kernel
# (tlfea.ops.pallas_fem) recovers the speed without the precision loss.
if not _os.environ.get("TLFEA_KEEP_DEFAULT_MATMUL"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"

from tlfea import utils, materials, elements, solvers, collision, parallel, ops  # noqa: E402,F401
