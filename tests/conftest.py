"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (physics-parity tests compare against the float64 NumPy
reference)."""

import os

# Force CPU: the dev environment exports JAX_PLATFORMS=axon (a remote TPU
# tunnel) and its sitecustomize imports jax at interpreter startup, so
# setting the env var here is too late -- update the live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
