"""ipcgen_tpu — TPU-native framework for controllable generation of indoor
mobile-robot LiDAR point-cloud datasets.

Re-designed from scratch (JAX / XLA / Pallas / pjit) with the capabilities of
the reference pipeline "Indoor Point Cloud Datasets Controllable Generation
Method for Mobile Robots 3D Scene Perception" (see SURVEY.md for the layer map
of the reference; citations in docstrings point at /root/reference file:line).

Subpackage layout
-----------------
- ``ops``        TPU compute kernels: raycast (XLA + Pallas), KNN, normals,
                 outlier removal, distribution metrics, SDF fusion, marching
                 cubes, surface sampling.
- ``models``     Sensor models: LiDAR intrinsics profiles and vectorized beam
                 generators (8/32-line single-axis, BLK2GO dual-axis spiral).
- ``parallel``   Device-mesh helpers and sharded multi-chip scan paths.
- ``containers`` Host-side data containers mirroring the reference API
                 (scenes, frames, sim results, stats, exporters).
- ``io``         PLY codecs (incl. the 8-attribute labeled PLY), S3DIS txt &
                 annotation parsers.
- ``trajectory`` Waypoints, quality metrics, collision detection, automatic
                 trajectory generation (occupancy grid + A*).
- ``semantic``   Label/color codecs and on-device label transfer.
- ``bbox``       3D detection box generation (Group-Free-3D compatible JSON).
- ``eval``       Distribution-similarity evaluation (MMD/Chamfer/Hausdorff).
- ``recon``      Surface reconstruction substitute (point+normal -> SDF ->
                 marching cubes) with an NKSR-compatible API.
- ``sim``        The simulator orchestration facade + batch drivers.
- ``preprocess`` S3DIS loading and preprocessing (outliers, normals,
                 sparsity/occlusion simulation).
- ``viz``        Matplotlib visualization suite.
"""

__version__ = "0.1.0"

from ipcgen_tpu.containers import (  # noqa: F401
    RoomBounds,
    S3DISScene,
    S3DISSimFrame,
    S3DISSimScene,
    ScanQuality,
    SimulationStats,
    TriMesh,
)
