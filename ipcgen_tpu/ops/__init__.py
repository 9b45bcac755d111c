"""TPU compute kernels (XLA + Pallas).

Heavy modules import lazily at call sites; the most used entry points are
re-exported here.  Full inventory:

- ``raycast`` / ``raycast_pallas`` / ``raycast_mxu`` : ray/mesh
  intersection (XLA oracle + VPU Pallas kernel + the MXU pairs kernel that
  is the TPU default — Pluecker features as matmuls)
- ``scene_asset``                  : Morton-blocked HBM-resident scene build
- ``geometry``                     : Möller–Trumbore + slab-test math
- ``knn`` / ``grid_nn``            : tiled exact k-NN / grid-hashed 1-NN
- ``normals`` / ``outliers``       : PCA normals, statistical outlier removal
- ``metrics``                      : MMD / Chamfer / Hausdorff / density
- ``sdf`` / ``marching``           : SDF fusion + marching tetrahedra
- ``sampling``                     : area-weighted mesh surface sampling
- ``occupancy``                    : probe-ray free-space classification
"""

from ipcgen_tpu.ops.knn import knn, nearest_neighbor_indices  # noqa: F401
