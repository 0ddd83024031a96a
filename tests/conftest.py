"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars must be set before jax initializes its backends; the explicit
`jax.config.update('jax_platforms', 'cpu')` is required because the axon TPU
plugin otherwise claims the default platform even when JAX_PLATFORMS=cpu is
in the environment.

Set TLFEA_TEST_TPU=1 to keep the real TPU backend instead (runs the
`tpu`-marked regression tests, e.g. `pytest -m tpu tests/`); the CPU-mesh
sharding tests will then skip for lack of devices.
"""

import os

if os.environ.get("TLFEA_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
else:  # pragma: no cover — manual TPU regression runs
    os.environ.setdefault("TLFEA_NO_X64", "1")  # float32 on TPU

    import jax  # noqa: E402

    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "out", "jit_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Auto-apply the `smoke` marker (fast gate tier, see CLAUDE.md):
    everything not slow/tpu/heavy. `pytest -m smoke` must stay < 5 min on
    this box — mark anything that threatens that `heavy` (interpret-mode
    kernel execution) or `slow` (multi-step physics)."""
    import pytest

    for item in items:
        if not any(m.name in ("slow", "tpu", "heavy")
                   for m in item.iter_markers()):
            item.add_marker(pytest.mark.smoke)
