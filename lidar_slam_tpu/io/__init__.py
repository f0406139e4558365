from lidar_slam_tpu.io import dataset, simulate  # noqa: F401
