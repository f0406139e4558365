"""Graph-SLAM integration: loop-closure detection + optimization on a loop."""

import numpy as np
import pytest

from lidar_slam_tpu.config import DEFAULT_CONFIG
from lidar_slam_tpu.io import simulate
from lidar_slam_tpu.models import posegraph
from lidar_slam_tpu.models.graph_slam import GraphSlam
from lidar_slam_tpu.utils.metrics import ate



pytestmark = pytest.mark.slow  # multi-minute integration runs; quick tier: -m "not slow"

def test_graph_slam_closes_loops_on_loop_trajectory():
    ranges, gt = simulate.generate_dataset(
        n_scans=300, seed=1, waypoints=simulate.LOOP_WAYPOINTS)
    gs = GraphSlam(DEFAULT_CONFIG)
    path, opt_kf = gs.run(ranges)

    assert int(gs.kf.count) >= 10
    assert len(gs.closures) >= 1, "no loop closures found on a loop trajectory"
    # closure edges must respect the keyframe gap
    for i, k in gs.closures:
        assert k - i >= gs.lc.min_gap
    # the optimized graph must be consistent (small residual error)
    err = float(posegraph.graph_error(gs.graph))
    n_edges = int(gs.graph.n_edges)
    assert err / max(n_edges, 1) < 1.0, (err, n_edges)
    # frontend still tracks
    assert ate(path, gt) < 0.1


def test_graph_slam_feedback_keeps_tracking():
    """Optimized poses folded back into the live frontend (map rebuild +
    pose re-anchoring) must not destabilize tracking."""
    ranges, gt = simulate.generate_dataset(
        n_scans=300, seed=1, waypoints=simulate.LOOP_WAYPOINTS)
    gs = GraphSlam(DEFAULT_CONFIG)
    path, _ = gs.run(ranges, feedback=True)
    assert len(gs.closures) >= 1
    assert ate(path, gt) < 0.1
