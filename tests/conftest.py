"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real (virtual) mesh without TPU hardware.

The environment preloads jax with a TPU ('axon') backend via a
sitecustomize hook, so env vars alone are too late — override the platform
through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()[0]}"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
