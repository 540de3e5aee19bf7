"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes,
so multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4: the reference never tested distributed paths — we do).

Set SIS_TPU_SOAK=1 to SKIP the CPU forcing and run selected end-to-end
tests on the real TPU chip instead (soak coverage; mesh tests that assert
8 devices will fail there — select individual tests, not the suite)."""

import os

import re

_TPU_SOAK = bool(os.environ.get("SIS_TPU_SOAK"))

if not _TPU_SOAK:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        # normalize a pre-existing (possibly different) device count to 8 —
        # every mesh test assumes exactly 8 virtual devices
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "--xla_force_host_platform_device_count=8",
            flags,
        )
        os.environ["XLA_FLAGS"] = flags
    else:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _TPU_SOAK:
    # The axon TPU bootstrap (sitecustomize) force-selects
    # jax_platforms="axon,cpu" at registration, overriding the env var —
    # override it back post-import.
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
