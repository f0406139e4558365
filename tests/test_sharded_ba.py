"""Distributed Schur BA must match the single-device dense solver."""

import jax
import numpy as np

from lidar_slam_tpu.models import ba
from lidar_slam_tpu.parallel import sharded_ba

from test_ba import _make_problem


def test_sharded_ba_matches_dense():
    prob, gt_poses, gt_lms = _make_problem()
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])

    dense = ba.optimize_ba(prob, iters=12)
    dist = sharded_ba.optimize_ba_sharded(prob, mesh, iters=12)

    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(dense.poses), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dist.landmarks),
                               np.asarray(dense.landmarks), atol=5e-3)


def test_sharded_ba_converges_to_ground_truth():
    prob, gt_poses, gt_lms = _make_problem(seed=1)
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])
    out = sharded_ba.optimize_ba_sharded(prob, mesh, iters=15)

    e0 = float(ba.ba_error(prob))
    e1 = float(ba.ba_error(out))
    assert e1 < e0 * 0.05, (e0, e1)
    pose_err = np.abs(np.asarray(out.poses)[:, :2] - gt_poses[:, :2]).max()
    lm_err = np.abs(np.asarray(out.landmarks) - gt_lms).max()
    assert pose_err < 0.05, pose_err
    assert lm_err < 0.05, lm_err


def test_sharded_ba_uneven_sizes_padded():
    """K, L, E, F not divisible by the device count still work (padding)."""
    prob, _, _ = _make_problem(n_poses=13, n_lms=7, seed=2)
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])
    dense = ba.optimize_ba(prob, iters=8)
    dist = sharded_ba.optimize_ba_sharded(prob, mesh, iters=8)
    assert dist.poses.shape == prob.poses.shape
    assert dist.landmarks.shape == prob.landmarks.shape
    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(dense.poses), atol=5e-3)
