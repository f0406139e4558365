from lidar_slam_tpu.models import scan_matcher  # noqa: F401
