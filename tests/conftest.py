"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars must be set before jax initializes its backends; the explicit
`jax.config.update('jax_platforms', 'cpu')` is required because the axon TPU
plugin otherwise claims the default platform even when JAX_PLATFORMS=cpu is
in the environment.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
