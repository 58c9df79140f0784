"""Test harness config: force the CPU backend with 8 virtual devices so unit
and sharding tests run anywhere (the TPU chip is reserved for bench runs).

Note: this environment's axon TPU plugin overrides the JAX_PLATFORMS env var,
so the platform must be pinned via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference asset tree not available")
    return REFERENCE_ROOT
