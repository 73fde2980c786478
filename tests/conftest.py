"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware and must exercise multi-device sharding,
so we emulate 8 devices on CPU (the documented JAX pattern for testing
``jax.sharding`` code).

Note: this environment pre-imports jax via a sitecustomize hook with
``JAX_PLATFORMS`` already set, so plain env-var exports in conftest are too
late — we override through ``jax.config`` after import, before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, "tests require the 8-device virtual CPU mesh"
assert jax.devices()[0].platform == "cpu"
