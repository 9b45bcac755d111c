"""Ray/mesh intersection — XLA reference paths and the public API.

Replaces Embree ``cast_rays`` (reference: raycast_engine/raycast_engine_cpu.py:46-73)
with TPU-native implementations over the HBM-resident ``SceneAsset``:

- ``raycast_brute``      : chunked Möller–Trumbore over raw triangles (the
                           independent correctness oracle used by tests).
- ``raycast_asset_xla``  : scan over the asset's leaf blocks in pure XLA
                           (portable path; runs anywhere, shards cleanly).
- ``raycast_asset``      : dispatches to the Pallas TPU kernel when available
                           (ipcgen_tpu.ops.raycast_pallas), else the XLA path.

Semantics match the reference: ``t`` is in units of the (unit-normalized) ray
direction, misses are ``t == +inf``, hit positions are ``o + d * t``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.ops.geometry import moller_trumbore, moller_trumbore_components
from ipcgen_tpu.ops.scene_asset import SceneAsset


class RaycastResult(NamedTuple):
    """Fixed-shape raycast output (mask instead of compaction, SURVEY.md §7)."""

    t: jnp.ndarray  # (R,) float32, +inf on miss
    tri_id: jnp.ndarray  # (R,) int32 original triangle id, -1 on miss
    hit: jnp.ndarray  # (R,) bool
    points: jnp.ndarray  # (R, 3) float32, 0 where miss
    normals: jnp.ndarray  # (R, 3) float32 geometric unit normals, 0 where miss


@functools.partial(jax.jit, static_argnames=("chunk",))
def raycast_brute(origins, dirs, v0, e1, e2, chunk: int = 512):
    """Brute-force Möller–Trumbore over raw triangles, chunked over T.

    Returns (t, idx) where idx indexes the *input* triangle order.
    """
    origins = origins.astype(jnp.float32)
    dirs = dirs.astype(jnp.float32)
    n_tris = v0.shape[0]
    pad = (-n_tris) % chunk
    if pad:
        far = jnp.full((pad, 3), 1e7, jnp.float32)
        zero = jnp.zeros((pad, 3), jnp.float32)
        v0 = jnp.concatenate([v0, far])
        e1 = jnp.concatenate([e1, zero])
        e2 = jnp.concatenate([e2, zero])
    n_chunks = v0.shape[0] // chunk

    def body(carry, c):
        best_t, best_i = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 0)
        t = moller_trumbore(
            origins[:, None, :], dirs[:, None, :],
            sl(v0)[None, :, :], sl(e1)[None, :, :], sl(e2)[None, :, :],
        )  # (R, chunk)
        tmin = jnp.min(t, axis=1)
        targ = jnp.argmin(t, axis=1).astype(jnp.int32) + c * chunk
        take = tmin < best_t
        return (
            jnp.where(take, tmin, best_t),
            jnp.where(take, targ, best_i),
        ), None

    init = (
        jnp.full(origins.shape[0], jnp.inf, jnp.float32),
        jnp.full(origins.shape[0], -1, jnp.int32),
    )
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    best_i = jnp.where(jnp.isfinite(best_t), best_i, -1)
    return best_t, best_i


@jax.jit
def _raycast_asset_xla_core(origins, dirs, asset: SceneAsset):
    """Scan over leaf blocks of the asset; returns (t, packed_slot)."""
    origins = origins.astype(jnp.float32)
    dirs = dirs.astype(jnp.float32)
    nb, _, tb = asset.tri_data.shape
    ox, oy, oz = origins[:, 0:1], origins[:, 1:2], origins[:, 2:3]
    dx, dy, dz = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]

    def body(carry, b):
        best_t, best_i = carry
        blk = asset.tri_data[b]  # (16, TB) component panel
        t = moller_trumbore_components(
            ox, oy, oz, dx, dy, dz,
            blk[0][None, :], blk[1][None, :], blk[2][None, :],
            blk[3][None, :], blk[4][None, :], blk[5][None, :],
            blk[6][None, :], blk[7][None, :], blk[8][None, :],
        )  # (R, TB)
        tmin = jnp.min(t, axis=1)
        targ = jnp.argmin(t, axis=1).astype(jnp.int32) + b * tb
        take = tmin < best_t
        return (
            jnp.where(take, tmin, best_t),
            jnp.where(take, targ, best_i),
        ), None

    init = (
        jnp.full(origins.shape[0], jnp.inf, jnp.float32),
        jnp.full(origins.shape[0], -1, jnp.int32),
    )
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(nb))
    return best_t, best_i


def finalize_result(origins, dirs, t, packed_slot, asset: SceneAsset) -> RaycastResult:
    """Map packed slots -> original ids, gather normals, compute hit points."""
    hit = jnp.isfinite(t) & (packed_slot >= 0)
    slot = jnp.maximum(packed_slot, 0)
    tri_id = jnp.where(hit, asset.tri_index[slot], -1)
    normals = jnp.where(hit[:, None], asset.tri_normal[slot], 0.0)
    t_safe = jnp.where(hit, t, 0.0)
    points = jnp.where(
        hit[:, None], origins + dirs * t_safe[:, None], 0.0
    ).astype(jnp.float32)
    return RaycastResult(t=t, tri_id=tri_id, hit=hit, points=points, normals=normals)


def raycast_asset_xla(origins, dirs, asset: SceneAsset) -> RaycastResult:
    t, slot = _raycast_asset_xla_core(
        jnp.asarray(origins), jnp.asarray(dirs), asset
    )
    return finalize_result(jnp.asarray(origins, jnp.float32),
                           jnp.asarray(dirs, jnp.float32), t, slot, asset)


def raycast_asset(
    origins, dirs, asset: SceneAsset, backend: str = "auto", t_max: float = np.inf
) -> RaycastResult:
    """Public entry: intersect rays with the resident scene.

    Parameters
    ----------
    origins, dirs : (R, 3) arrays (dirs should be unit length).
    backend : "auto" | "pallas" | "xla".  "auto" picks the Pallas TPU kernel
        on TPU backends and XLA elsewhere.
    t_max : optional hit-distance cap (used by the Pallas kernel to cull
        blocks beyond the LiDAR max range; XLA path filters afterwards).
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    if backend == "auto":
        # The Pallas kernel targets Mosaic/TPU only; any other backend (cpu,
        # gpu, ...) takes the portable XLA path rather than failing.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from ipcgen_tpu.ops.raycast_pallas import raycast_asset_pallas

        return raycast_asset_pallas(origins, dirs, asset, t_max=t_max)
    res = raycast_asset_xla(origins, dirs, asset)
    if np.isfinite(t_max):
        keep = res.hit & (res.t < t_max)
        res = RaycastResult(
            t=jnp.where(keep, res.t, jnp.inf),
            tri_id=jnp.where(keep, res.tri_id, -1),
            hit=keep,
            points=jnp.where(keep[:, None], res.points, 0.0),
            normals=jnp.where(keep[:, None], res.normals, 0.0),
        )
    return res
