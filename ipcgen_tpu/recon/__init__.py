"""Surface reconstruction substitute (NKSR-compatible API)."""

from ipcgen_tpu.recon.projection_viz import (  # noqa: F401
    ReconstructionVisualizer,
)
from ipcgen_tpu.recon.reconstructor import (  # noqa: F401
    S3DISEvaluator,
    S3DISReconstructor,
    SemanticMeshReconstructor,
    SurfaceReconstructor,
)
