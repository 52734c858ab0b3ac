"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-native way (SURVEY.md §4): spoof 8 host
devices via XLA_FLAGS so pjit/Mesh tests exercise real GSPMD partitioning without
hardware. XLA_FLAGS must be set before jax initializes its backends; the platform
itself is forced via jax.config because environments with a TPU plugin (axon) may
pin JAX_PLATFORMS at interpreter startup.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
