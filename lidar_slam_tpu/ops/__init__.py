from lidar_slam_tpu.ops import edt, matching  # noqa: F401
