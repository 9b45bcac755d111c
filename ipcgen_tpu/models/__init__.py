"""Sensor models: LiDAR intrinsics profiles + vectorized beam generators."""

from ipcgen_tpu.models.lidar import (  # noqa: F401
    DualAxisLidar,
    IndoorLidar,
    create_lidar,
    get_lidar_type,
)
from ipcgen_tpu.models.lidar_intrinsics import (  # noqa: F401
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
    LidarIntrinsics,
)
