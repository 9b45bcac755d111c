"""Multi-chip parallelism: device meshes and sharded scan paths."""

from ipcgen_tpu.parallel.shard import (  # noqa: F401
    make_device_mesh,
    scan_waypoints_sharded,
    sharded_raycast_rays,
    sharded_raycast_tris,
)
