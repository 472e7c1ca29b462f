"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

No TPU is needed for CI; multi-chip sharding tests run against
xla_force_host_platform_device_count=8 (the CPU stand-in for an ICI mesh).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: never route tests through the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")  # belt and braces vs. plugin pre-imports
jax.config.update("jax_enable_x64", True)  # float64 in tests: exact parity vs the reference
