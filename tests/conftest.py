"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on CPU so the float64 oracle path is available and multi-device
sharding can be exercised without TPU hardware (SURVEY.md section 7); the
driver separately dry-runs the multichip path via __graft_entry__.

Note: the sandbox's sitecustomize pre-imports jax with the axon/TPU platform
registered, so plain env-var defaults are not enough — the platform is
forced to cpu both in the environment and through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend())
