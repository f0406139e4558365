from lidar_slam_tpu.utils import metrics  # noqa: F401
