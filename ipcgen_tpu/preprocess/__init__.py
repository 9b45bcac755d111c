"""S3DIS loading + preprocessing (outliers, normals, sparsity, occlusion)."""

from ipcgen_tpu.preprocess.loader import (  # noqa: F401
    S3DISLoader,
    S3DISPreprocessor,
    preprocess_room,
)
