"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real (virtual) mesh without TPU hardware.

The environment preloads jax with a TPU ('axon') backend via a
sitecustomize hook, so env vars alone are too late — override the platform
through jax.config before any backend is initialized.
"""
import os

# escape hatch for the `heavy` lane: at-scale statistical cross-checks
# (e.g. tests/test_fit_mcmc.py::test_bridged_smc_at_scale_cross_checks)
# are sized for the real accelerator — run them with
#   VELOCYCLE_TPU_TESTS=tpu python -m pytest tests -m heavy
_USE_TPU = os.environ.get("VELOCYCLE_TPU_TESTS") == "tpu"

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _USE_TPU:
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()[0]}"
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
