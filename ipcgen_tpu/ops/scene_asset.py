"""Device-resident scene acceleration structure.

The reference rebuilds an Embree BVH for every single scan frame
(raycast_engine_cpu.py:46-47, noted at raycast_engine/raycast_engine.py:20-24).
Here the scene is built ONCE per room into a TPU-shaped two-level structure
and stays resident in HBM across all waypoints:

  level 0: triangles Morton-sorted by centroid, packed into fixed-size leaf
           blocks (padded with degenerate far-away triangles);
  level 1: one AABB per leaf block (and per super-block of leaf blocks).

This is a flattened 2-level BVH whose traversal is branch-free and lockstep
across a vector of rays — pointer-chasing BVHs do not map onto the VPU, but
"slab-test the block AABB, then test all of its triangles against the whole
ray tile" does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# A padded triangle parked far outside any scene so it can never be hit.
_PAD_COORD = 1e7


def morton3d(ix: np.ndarray, iy: np.ndarray, iz: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave three ``bits``-bit integer grids into Morton codes (vectorized)."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64((1 << bits) - 1)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return spread(ix) | (spread(iy) << np.uint64(1)) | (spread(iz) << np.uint64(2))


@jax.tree_util.register_pytree_node_class
@dataclass
class SceneAsset:
    """HBM-resident triangle scene.

    Attributes
    ----------
    tri_data : (NB, 16, TB) float32 — per leaf block, a DMA-aligned panel:
        rows 0..8 are the components (v0x, v0y, v0z, e1x, e1y, e1z, e2x,
        e2y, e2z), rows 9..15 padding; lanes are the block's TB triangles.
        Both panel dims are tile-aligned (16 % 8 == 0, TB % 128 == 0) so a
        single async copy moves one block; the Pallas kernel lands panels in
        SMEM, whose scalar reads allow the dynamic per-triangle indexing that
        VMEM lanes forbid.
    block_lo / block_hi : (NB, 3) float32 leaf-block AABBs.
    super_lo / super_hi : (NS, 3) float32 super-block AABBs (groups of leaf
        blocks) for the coarse culling level.
    tri_index : (NB * TB,) int32 — original triangle id per packed slot
        (-1 for padding).
    tri_normal : (NB * TB, 3) float32 — unit geometric normal per packed slot
        (Embree's ``primitive_normals`` equivalent, gathered per hit).
    tri_fin : (NB * TB, 4) float32 — [normal xyz, bitcast(tri_index)] packed
        so ``finalize_result`` resolves a hit with ONE per-ray gather
        (random-access gathers over the tunnel-attached HBM are row-count
        bound, so two tables cost twice one).
    n_tris / block_size / supers : static metadata.
    """

    tri_data: jnp.ndarray
    block_lo: jnp.ndarray
    block_hi: jnp.ndarray
    super_lo: jnp.ndarray
    super_hi: jnp.ndarray
    tri_index: jnp.ndarray
    tri_normal: jnp.ndarray
    tri_fin: jnp.ndarray
    n_tris: int
    block_size: int
    super_factor: int

    # pytree plumbing -----------------------------------------------------
    def tree_flatten(self):
        children = (
            self.tri_data,
            self.block_lo,
            self.block_hi,
            self.super_lo,
            self.super_hi,
            self.tri_index,
            self.tri_normal,
            self.tri_fin,
        )
        aux = (self.n_tris, self.block_size, self.super_factor)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ----------------------------------------------------------------------
    @property
    def num_blocks(self) -> int:
        return self.tri_data.shape[0]

    @property
    def num_supers(self) -> int:
        return self.super_lo.shape[0]

    def scene_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        lo = np.asarray(jnp.min(self.super_lo, axis=0))
        hi = np.asarray(jnp.max(self.super_hi, axis=0))
        return lo, hi


def _bucket_count(n: int, granularity: int = 4) -> int:
    """Round up to the next (granularity..2*granularity-1) * 2^j bucket.

    Scene sizes vary per room; every distinct block count is a distinct
    static shape for the raycast kernel (a fresh ~40 s XLA compile).  This
    bucketing caps padding waste at ~1/granularity while collapsing all room
    sizes onto a handful of compiled programs.  The default granularity of 4
    trades up to ~25% padded blocks for
    program reuse — padded blocks carry NaN AABBs, so the Pallas kernel
    skips them at the super level for a few cycles each.
    """
    if n <= granularity:
        return n
    j = (n - 1).bit_length() - granularity.bit_length() + 1
    step = 1 << max(j, 0)
    return -(-n // step) * step


def build_scene_asset(
    vertices: np.ndarray,
    triangles: np.ndarray,
    block_size: int = 128,
    super_factor: int = 8,
    morton_bits: int = 10,
    bucket: bool = True,
) -> SceneAsset:
    """Build the two-level structure on the host (numpy) and ship it to device.

    Parameters
    ----------
    vertices : (V, 3) float array.
    triangles : (T, 3) int array.
    block_size : triangles per leaf block (lane dimension; multiples of 128
        keep VPU lanes full).
    super_factor : leaf blocks per super block.
    """
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
    n_tris = len(triangles)
    if n_tris == 0:
        raise ValueError("build_scene_asset: mesh has no triangles.")

    corners = vertices[triangles]  # (T, 3, 3)
    centroids = corners.mean(axis=1)

    # Morton order over quantized centroids (native C++ sorter when built,
    # numpy fallback otherwise — identical ordering semantics).
    from ipcgen_tpu.utils import native

    order = native.morton_order(centroids, bits=morton_bits)
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    extent = np.maximum(hi - lo, 1e-9)
    if order is None:
        scale = (1 << morton_bits) - 1
        q = np.clip(((centroids - lo) / extent * scale), 0, scale).astype(np.uint64)
        codes = morton3d(q[:, 0], q[:, 1], q[:, 2], bits=morton_bits)
        order = np.argsort(codes, kind="stable")

    corners = corners[order]
    tri_index = order.astype(np.int32)

    # Pad to a whole number of blocks with far-away degenerate triangles;
    # bucket the block count so similarly-sized rooms share compiled kernels.
    n_blocks = -(-n_tris // block_size)
    if bucket:
        n_blocks = _bucket_count(n_blocks)
    n_pad = n_blocks * block_size - n_tris
    if n_pad:
        pad_tri = np.full((n_pad, 3, 3), _PAD_COORD, dtype=np.float32)
        corners = np.concatenate([corners, pad_tri], axis=0)
        tri_index = np.concatenate([tri_index, np.full(n_pad, -1, np.int32)])

    v0 = corners[:, 0]
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 0]
    # (NB, 16, TB): component rows (padded 9 -> 16), triangles along lanes
    packed = np.concatenate([v0, e1, e2], axis=1).reshape(n_blocks, block_size, 9)
    tri_data = np.zeros((n_blocks, 16, block_size), dtype=np.float32)
    tri_data[:, :9, :] = packed.transpose(0, 2, 1)

    # Geometric unit normals per packed slot (Embree primitive_normals analog)
    raw_n = np.cross(e1, e2)
    norm = np.linalg.norm(raw_n, axis=1, keepdims=True)
    tri_normal = (raw_n / np.maximum(norm, 1e-20)).astype(np.float32)
    tri_fin = np.concatenate(
        [tri_normal, tri_index.view(np.float32)[:, None]], axis=1
    )

    # Leaf AABBs over real triangles only; fully-padded blocks get NaN boxes
    # (NaN comparisons are false -> the slab test can never pass).
    blk_corners = corners.reshape(n_blocks, block_size, 3, 3)
    valid = (
        np.arange(n_blocks * block_size).reshape(n_blocks, block_size) < n_tris
    )[..., None, None]
    blk_lo = np.where(valid, blk_corners, np.inf).min(axis=(1, 2))
    blk_hi = np.where(valid, blk_corners, -np.inf).max(axis=(1, 2))
    eps = 1e-5 * np.maximum(extent.max(), 1.0)
    blk_lo -= eps
    blk_hi += eps
    empty_blocks = ~np.isfinite(blk_lo[:, 0])
    blk_lo[empty_blocks] = np.nan
    blk_hi[empty_blocks] = np.nan

    # Super-block AABBs (nan-aware: padded leaf blocks carry NaN boxes).
    n_supers = -(-n_blocks // super_factor)
    pad_blocks = n_supers * super_factor - n_blocks
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        sup_lo = np.nanmin(
            np.concatenate(
                [blk_lo, np.full((pad_blocks, 3), np.nan, np.float32)], axis=0
            ).reshape(n_supers, super_factor, 3),
            axis=1,
        )
        sup_hi = np.nanmax(
            np.concatenate(
                [blk_hi, np.full((pad_blocks, 3), np.nan, np.float32)], axis=0
            ).reshape(n_supers, super_factor, 3),
            axis=1,
        )
    # Degenerate supers (all padding) stay NaN: NaN comparisons are always
    # false, so the slab test can never pass for them.

    return SceneAsset(
        tri_data=jnp.asarray(tri_data),
        block_lo=jnp.asarray(blk_lo.astype(np.float32)),
        block_hi=jnp.asarray(blk_hi.astype(np.float32)),
        super_lo=jnp.asarray(sup_lo.astype(np.float32)),
        super_hi=jnp.asarray(sup_hi.astype(np.float32)),
        tri_index=jnp.asarray(tri_index),
        tri_normal=jnp.asarray(tri_normal),
        tri_fin=jnp.asarray(tri_fin),
        n_tris=n_tris,
        block_size=block_size,
        super_factor=super_factor,
    )


def asset_from_mesh(mesh, block_size: int = 128, super_factor: int = 8) -> SceneAsset:
    """Convenience: build from a ``TriMesh``-like object (vertices/triangles)."""
    return build_scene_asset(
        np.asarray(mesh.vertices), np.asarray(mesh.triangles), block_size, super_factor
    )
