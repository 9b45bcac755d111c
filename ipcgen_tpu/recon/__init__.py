"""Surface reconstruction substitute (NKSR-compatible API)."""

from ipcgen_tpu.recon.reconstructor import (  # noqa: F401
    S3DISEvaluator,
    S3DISReconstructor,
    SemanticMeshReconstructor,
    SurfaceReconstructor,
)


def __getattr__(name):
    # Lazy: projection_viz drags in matplotlib (and pins the Agg backend);
    # callers that only want the reconstructor should not pay for it.
    if name == "ReconstructionVisualizer":
        from ipcgen_tpu.recon.projection_viz import ReconstructionVisualizer

        return ReconstructionVisualizer
    raise AttributeError(name)
