"""End-to-end parity: JAX fidelity pipeline vs the native C++ oracle.

This is the framework's equivalent of the reference's only real verification
harness — running the software and accelerated implementations on identical
inputs and comparing outputs (dissertation p.45 §15.3.3). Our bar is stricter:
bit-exact trajectories, not visual map fidelity.
"""

import numpy as np
import pytest

from lidar_slam_tpu import native
from lidar_slam_tpu.config import DEFAULT_CONFIG
from lidar_slam_tpu.models import scan_matcher
from lidar_slam_tpu.utils.metrics import ate, max_abs_err


@pytest.fixture(scope="module")
def oracle_path(small_dataset):
    ranges, _ = small_dataset
    path, omap = native.run_oracle(ranges)
    return ranges, path, omap


def test_host_loop_matches_oracle(oracle_path):
    ranges, cpath, cmap = oracle_path
    jpath, state = scan_matcher.run_host_loop(ranges, DEFAULT_CONFIG)
    assert max_abs_err(jpath, cpath) == 0.0
    assert int(state.pmap.size) == len(cmap)
    # map contents identical up to FMA-contraction ulps (g++ vs XLA emit
    # fused multiply-adds in different places in the transform)
    jmap = np.asarray(state.pmap.xy[: int(state.pmap.size)])
    np.testing.assert_allclose(jmap, cmap, atol=2e-6)


def test_lax_scan_driver_matches_oracle(oracle_path):
    ranges, cpath, _ = oracle_path
    jpath, _ = scan_matcher.run_scan(ranges, DEFAULT_CONFIG)
    assert max_abs_err(np.asarray(jpath), cpath) == 0.0


def test_oracle_tracks_ground_truth(small_dataset):
    """Sanity: the oracle itself must track the simulator's ground truth."""
    ranges, gt = small_dataset
    path, _ = native.run_oracle(ranges)
    assert ate(path, gt) < 0.08   # fine-matcher quantization is 2.5 cm


def test_naive_edt_oracle_agrees(small_dataset):
    """The O(N^4)-style clamped EDT and the separable one must agree end to end."""
    ranges, _ = small_dataset
    p_fast, _ = native.run_oracle(ranges[:30])
    p_naive, _ = native.run_oracle(ranges[:30], use_naive_edt=True)
    assert max_abs_err(p_fast, p_naive) == 0.0
