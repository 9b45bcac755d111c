"""TPU compute kernels (XLA + Pallas).

Modules are imported lazily by callers to keep import cost low; the most used
entry points are re-exported here.
"""

from ipcgen_tpu.ops.knn import knn, nearest_neighbor_indices  # noqa: F401
