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


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "super_factor", "t_max", "tile"),
)
def raycast_xla_culled_components(
    origins,
    dirs,
    tri_data,
    block_lo,
    block_hi,
    super_lo,
    super_hi,
    *,
    block_size: int,
    super_factor: int,
    t_max: float = np.inf,
    tile: int = 1024,
):
    """Two-level AABB-culled traversal in pure XLA; returns (t, packed_slot).

    The portable counterpart of the Pallas kernel (raycast_pallas.py): rays
    are processed in tiles, each tile slab-tests super then leaf AABBs
    against its running best-t (initialized to the range cap, so occlusion
    and max-range cull at the AABB level) and only intersects the triangle
    panels of surviving blocks (``lax.cond`` skips the rest — a real branch
    under ``lax.map``, unlike a vectorized select).

    Component-level signature so ``shard_map`` can pass sharded asset pieces
    (parallel/shard.py); ``raycast_asset_xla`` remains the brute oracle.
    """
    origins = origins.astype(jnp.float32)
    dirs = dirs.astype(jnp.float32)
    n = origins.shape[0]
    nb = tri_data.shape[0]
    ns = super_lo.shape[0]
    pad = (-n) % tile
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e8, jnp.float32)]
        )
        dirs = jnp.concatenate(
            [dirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))]
        )
    n_tiles = origins.shape[0] // tile
    o_t = origins.reshape(n_tiles, tile, 3)
    d_t = dirs.reshape(n_tiles, tile, 3)
    # Block AABB rows padded to NS*SF with NaN (slab test can never pass).
    pad_blocks = ns * super_factor - nb
    if pad_blocks:
        nanpad = jnp.full((pad_blocks, 3), jnp.nan, jnp.float32)
        block_lo = jnp.concatenate([block_lo, nanpad])
        block_hi = jnp.concatenate([block_hi, nanpad])
    t_init = float(t_max) if np.isfinite(t_max) else float(np.finfo(np.float32).max)

    from ipcgen_tpu.ops.geometry import ray_aabb_hit

    def per_tile(od):
        o, d = od
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        oxc, oyc, ozc = ox[:, None], oy[:, None], oz[:, None]
        dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]

        def tri_block(carry):
            best_t, best_i, b = carry
            blk = jax.lax.dynamic_index_in_dim(
                tri_data, jnp.minimum(b, nb - 1), keepdims=False
            )  # (16, TB)
            t = moller_trumbore_components(
                oxc, oyc, ozc, dxc, dyc, dzc,
                blk[0][None, :], blk[1][None, :], blk[2][None, :],
                blk[3][None, :], blk[4][None, :], blk[5][None, :],
                blk[6][None, :], blk[7][None, :], blk[8][None, :],
            )  # (tile, TB)
            tmin = jnp.min(t, axis=1)
            targ = jnp.argmin(t, axis=1).astype(jnp.int32) + b * block_size
            take = tmin < best_t
            return (
                jnp.where(take, tmin, best_t),
                jnp.where(take, targ, best_i),
                b,
            )

        def blk_body(j, carry):
            best_t, best_i, s = carry
            b = s * super_factor + j
            lo = block_lo[b]
            hi = block_hi[b]
            hit_b = ray_aabb_hit(
                ox, oy, oz, inv_dx, inv_dy, inv_dz,
                (lo[0], lo[1], lo[2]), (hi[0], hi[1], hi[2]), best_t,
            )
            best_t, best_i, _ = jax.lax.cond(
                jnp.any(hit_b), tri_block, lambda c: c, (best_t, best_i, b)
            )
            return best_t, best_i, s

        def visit_super(carry):
            best_t, best_i, s = carry
            return jax.lax.fori_loop(
                0, super_factor, blk_body, (best_t, best_i, s)
            )

        def super_body(s, carry):
            best_t, best_i = carry
            lo = super_lo[s]
            hi = super_hi[s]
            hit_s = ray_aabb_hit(
                ox, oy, oz, inv_dx, inv_dy, inv_dz,
                (lo[0], lo[1], lo[2]), (hi[0], hi[1], hi[2]), best_t,
            )
            best_t, best_i, _ = jax.lax.cond(
                jnp.any(hit_s), visit_super, lambda c: c, (best_t, best_i, s)
            )
            return best_t, best_i

        init = (
            jnp.full(tile, t_init, jnp.float32),
            jnp.full(tile, -1, jnp.int32),
        )
        best_t, best_i = jax.lax.fori_loop(0, ns, super_body, init)
        return jnp.where(best_i >= 0, best_t, jnp.inf), best_i

    t, slot = jax.lax.map(per_tile, (o_t, d_t))
    return t.reshape(-1)[:n], slot.reshape(-1)[:n]


def raycast_asset_xla_culled(
    origins, dirs, asset: SceneAsset, t_max: float = np.inf
) -> RaycastResult:
    """AABB-culled XLA path over the resident asset (portable fast path)."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    t, slot = raycast_xla_culled_components(
        origins, dirs,
        asset.tri_data, asset.block_lo, asset.block_hi,
        asset.super_lo, asset.super_hi,
        block_size=asset.block_size,
        super_factor=asset.super_factor,
        t_max=float(t_max),
    )
    return finalize_result(origins, dirs, t, slot, asset)


def finalize_result(origins, dirs, t, packed_slot, asset: SceneAsset) -> RaycastResult:
    """Map packed slots -> original ids, gather normals, compute hit points.

    One (R, 4) gather from the packed ``tri_fin`` table resolves both the
    normal and the original triangle id (random-access gathers are
    row-count bound, so the fused table halves the finalize cost vs
    separate tri_normal/tri_index lookups)."""
    hit = jnp.isfinite(t) & (packed_slot >= 0)
    slot = jnp.maximum(packed_slot, 0)
    fin = asset.tri_fin[slot]  # (R, 4): [normal xyz, bitcast(tri_index)]
    tri_id = jnp.where(
        hit, jax.lax.bitcast_convert_type(fin[:, 3], jnp.int32), -1
    )
    normals = jnp.where(hit[:, None], fin[:, :3], 0.0)
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
    origins, dirs, asset: SceneAsset, backend: str = "auto",
    t_max: float = np.inf, sort_rays="auto",
) -> RaycastResult:
    """Public entry: intersect rays with the resident scene.

    Parameters
    ----------
    origins, dirs : (R, 3) arrays (dirs should be unit length).
    backend : "auto" | "mxu" | "pallas" | "xla" | "xla_brute".  "auto"
        picks the MXU pairs kernel (raycast_mxu.py, the fast path) on TPU
        backends and the culled XLA path elsewhere.  "pallas" is the VPU
        Moeller-Trumbore kernel (bit-exact vs the oracle; ~3x slower);
        "xla_brute" is the unculled block scan kept as the test oracle.
    t_max : optional hit-distance cap — the fast paths cull blocks beyond
        the LiDAR max range at the AABB level; the brute path filters
        afterwards.
    sort_rays : MXU backend only — "auto" | True | False.  The coherence-
        restoring ray sort (raycast_mxu._ray_sort_order) that keeps
        unstructured ray sets off the walk-all fallback.  "auto" measures
        the prepass overflow fraction, which needs a host read and
        therefore silently degrades to False inside a jit trace — callers
        who jit over INCOHERENT rays (random sampling, scattered queries)
        must pass ``sort_rays=True`` explicitly (a static flag: the sort +
        inverse permutation compile into the caller's program).  Scan
        pipelines impose coherence via their own patch permutation and
        want the default.
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    if backend == "auto":
        # The Pallas/Mosaic kernels target TPU only; any other backend (cpu,
        # gpu, ...) takes the portable XLA path rather than failing.
        backend = "mxu" if jax.default_backend() == "tpu" else "xla"
    if backend == "mxu":
        from ipcgen_tpu.ops.raycast_mxu import raycast_asset_mxu

        return raycast_asset_mxu(
            origins, dirs, asset, t_max=t_max, sort_rays=sort_rays
        )
    if backend == "pallas":
        from ipcgen_tpu.ops.raycast_pallas import raycast_asset_pallas

        return raycast_asset_pallas(origins, dirs, asset, t_max=t_max)
    if backend == "xla":
        return raycast_asset_xla_culled(origins, dirs, asset, t_max=t_max)
    if backend != "xla_brute":
        raise ValueError(
            f"unknown raycast backend {backend!r}; expected one of "
            "'auto', 'mxu', 'pallas', 'xla', 'xla_brute'"
        )
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
