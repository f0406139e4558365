from lidar_slam_tpu.models import (  # noqa: F401
    ba,
    ekf_hybrid,
    ekf_slam,
    fastslam,
    graph_slam,
    pf_graph_slam,
    posegraph,
    scan_matcher,
)
