"""Test configuration: run everything on a simulated 8-device CPU mesh.

The TPU-native answer to "test multi-chip without a cluster" (SURVEY.md §4):
XLA's host-platform device-count override gives 8 virtual CPU devices, so
mesh/sharding/collective code paths are exercised by the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# a sitecustomize may pin JAX_PLATFORMS to the hardware plugin; the config
# override below wins regardless of import order
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
