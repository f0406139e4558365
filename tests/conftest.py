"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware (the reference's analog: verifying the HLS
kernel on a 10x10 sub-map before the real fabric, dissertation p.46 §15.3.4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the container env pins 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter startup (to
# register the axon TPU plugin), so jax captured JAX_PLATFORMS=axon before
# this file ran; override through the live config instead. Must happen
# before any backend is initialized (i.e. before the first jax.devices()).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration runs. Quick tier (<5 min, oracle "
        "parity + kernels + collectives): pytest tests/ -m 'not slow'")


@pytest.fixture(scope="session")
def small_dataset():
    """A short synthetic dataset shared across tests (80 scans)."""
    from lidar_slam_tpu.io import dataset

    ranges, gt, _ = dataset.ensure_dataset(n_scans=80, seed=3)
    return np.asarray(ranges), np.asarray(gt)
