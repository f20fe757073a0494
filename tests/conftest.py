"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real multi-chip separately via __graft_entry__).

Must set env vars BEFORE jax is imported by any test module.
"""

import os

# Force CPU regardless of ambient env. The machine's sitecustomize registers
# the remote-TPU "axon" backend and overwrites jax_platforms at interpreter
# start, so the env var alone is not enough — update jax.config after import
# (backends initialize lazily, so this wins as long as no device was touched).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
