from lidar_slam_tpu.models import (  # noqa: F401
    ba,
    ekf_slam,
    fastslam,
    graph_slam,
    posegraph,
    scan_matcher,
)
