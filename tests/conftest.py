"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (physics-parity tests compare against the float64 NumPy
reference)."""

import os

# Force CPU: the dev environment exports JAX_PLATFORMS=axon (a remote TPU
# tunnel), which is wrong for the hermetic float64 parity tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
