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
import pytest  # noqa: E402

# a sitecustomize may pin JAX_PLATFORMS to the hardware plugin; the config
# override below wins regardless of import order
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    Every jit compile mmaps code pages that live as long as the cached
    executable; across the full suite (~164 tests, hundreds of distinct
    programs) one pytest process crosses the kernel's vm.max_map_count
    (65530 here) and XLA:CPU segfaults inside backend_compile_and_load
    on an arbitrary later test (observed at ~140 tests in; the crashing
    test passes in isolation).  jax.clear_caches() returns the mappings
    (measured: 642 -> 463 maps, repeatable), so clearing per module
    bounds the count; cross-module recompiles cost little because
    modules rarely share program shapes."""
    yield
    jax.clear_caches()
