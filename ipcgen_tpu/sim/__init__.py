"""Simulation: raycast engines, fused scan pipeline, simulator orchestration."""

from ipcgen_tpu.sim.engine import (  # noqa: F401
    RaycastEngineBase,
    RaycastEngineCPU,
    RaycastEngineGPU,
    RaycastEngineTPU,
)
from ipcgen_tpu.sim.scan import ScanBatch, scan_waypoints  # noqa: F401
from ipcgen_tpu.sim.simulator import (  # noqa: F401
    S3DISSimulator,
    create_simulator_from_config,
    find_available_scenes,
    load_config,
    run_single_scene_simulation,
)
