from lidar_slam_tpu.parallel import (  # noqa: F401
    mesh,
    resampling,
    sharded,
    sharded_ekf,
)
