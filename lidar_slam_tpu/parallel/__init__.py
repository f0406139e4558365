from lidar_slam_tpu.parallel import mesh, resampling, sharded  # noqa: F401
