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

    jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
