"""Pose-graph optimizer tests: noisy odometry + loop closures must recover."""

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.core import se2
from lidar_slam_tpu.models import posegraph


def _build_circle_graph(n=20, odo_noise=0.03, seed=0):
    """Ground truth on a circle; odometry chain with noise + one loop edge."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = 5.0
    gt = np.stack([radius * np.cos(angles), radius * np.sin(angles),
                   se2.wrap_angle(jnp.asarray(angles + np.pi / 2))], axis=1)
    gt = np.asarray(gt, np.float32)

    g = posegraph.empty_graph(max_nodes=32, max_edges=64)
    # initial guess: integrate noisy odometry
    est = [gt[0]]
    zs = []
    for t in range(1, n):
        z = np.asarray(se2.between(jnp.asarray(gt[t - 1]), jnp.asarray(gt[t])))
        zn = z + rng.normal(0, odo_noise, 3).astype(np.float32)
        zs.append(zn)
        est.append(np.asarray(se2.compose(jnp.asarray(est[-1]), jnp.asarray(zn))))
    est = np.stack(est)

    for t in range(n):
        g, _ = posegraph.add_node(g, jnp.asarray(est[t]))
    for t in range(1, n):
        g = posegraph.add_edge(g, jnp.int32(t - 1), jnp.int32(t),
                               jnp.asarray(zs[t - 1]), jnp.ones(3))
    # loop closure: exact measurement from last node back to node 0
    z_loop = se2.between(jnp.asarray(gt[-1]), jnp.asarray(gt[0]))
    g = posegraph.add_edge(g, jnp.int32(n - 1), jnp.int32(0), z_loop,
                           jnp.ones(3) * 10.0)
    return g, gt, est


def test_optimize_reduces_error_and_recovers_loop():
    g, gt, est = _build_circle_graph()
    e0 = float(posegraph.graph_error(g))
    opt = posegraph.optimize(g, iters=15)
    e1 = float(posegraph.graph_error(opt))
    assert e1 < e0 * 0.2, (e0, e1)

    n = len(gt)
    drift_before = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1).max()
    drift_after = np.linalg.norm(
        np.asarray(opt.poses[:n, :2]) - gt[:, :2], axis=1).max()
    assert drift_after < drift_before * 0.7
    # gauge: node 0 pinned
    np.testing.assert_allclose(np.asarray(opt.poses[0]), gt[0], atol=1e-3)


def test_optimize_noise_free_chain_is_exact():
    g = posegraph.empty_graph(max_nodes=8, max_edges=8)
    gt = [jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.5, 0.3]),
          jnp.asarray([2.0, 0.0, -0.2])]
    # bad initial guesses, exact measurements
    for k, p in enumerate(gt):
        g, _ = posegraph.add_node(g, p + (0.0 if k == 0 else 0.5))
    for t in range(1, 3):
        g = posegraph.add_edge(g, jnp.int32(t - 1), jnp.int32(t),
                               se2.between(gt[t - 1], gt[t]), jnp.ones(3))
    opt = posegraph.optimize(g, iters=20)
    np.testing.assert_allclose(np.asarray(opt.poses[:3]),
                               np.asarray(jnp.stack(gt)), atol=1e-3)


def test_inactive_slots_untouched():
    g, _, _ = _build_circle_graph(n=10)
    opt = posegraph.optimize(g, iters=5)
    np.testing.assert_array_equal(np.asarray(opt.poses[10:]),
                                  np.zeros((22, 3), np.float32))
