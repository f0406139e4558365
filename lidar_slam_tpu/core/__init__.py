from lidar_slam_tpu.core import gridmap, se2, sensor  # noqa: F401
