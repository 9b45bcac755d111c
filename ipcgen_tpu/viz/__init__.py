"""Matplotlib visualization suite (API parity with reference visualization/)."""

from ipcgen_tpu.viz.mesh_viz import MeshVisualizer  # noqa: F401
from ipcgen_tpu.viz.scan_viz import ScanResultVisualizer  # noqa: F401
from ipcgen_tpu.viz.scene_viz import (  # noqa: F401
    S3DISVisualizer,
    create_visualization_summary,
)
from ipcgen_tpu.viz.trajectory_viz import TrajectoryVisualizer  # noqa: F401
from ipcgen_tpu.viz.normals_viz import (  # noqa: F401
    visualize_normal_statistics,
    visualize_normals,
    visualize_normals_high_quality,
)
