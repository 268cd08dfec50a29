"""Test configuration: force a virtual 8-device CPU mesh so pjit/psum sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

# SLAMKIT_TEST_TPU=1 leaves the session's real platform in place so the
# hardware gates (tests/test_flash_tpu.py) can run on the chip; default is
# the virtual 8-device CPU mesh.
_KEEP_TPU = os.environ.get("SLAMKIT_TEST_TPU") == "1"

if not _KEEP_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets JAX_PLATFORMS=axon (real TPU)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _KEEP_TPU:
    # The axon site package (PYTHONPATH=/root/.axon_site) re-forces the TPU
    # platform at interpreter start; the config update after import wins.
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def config_dir() -> str:
    return str(REPO_ROOT / "config")


@pytest.fixture(scope="session")
def example_data_dir() -> pathlib.Path:
    """The reference's committed golden example data (features/tokens jsonl)."""
    return REFERENCE_ROOT / "example_data"
