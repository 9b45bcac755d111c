"""Pallas TPU raycast kernel over the two-level SceneAsset.

Traversal model (designed for the VPU's lockstep SIMD, not translated from
Embree's per-ray BVH descent — see SURVEY.md §7 "hard parts"):

  grid dimension   : tiles of ROWSx128 rays (one waypoint's beam wedge per a
                     few consecutive tiles — azimuth-major beam order keeps a
                     tile angularly coherent, so most scene blocks fail the
                     tile's slab test and are skipped wholesale).
  per super-block  : slab-test all rays in the tile against the super AABB
                     (groups of `super_factor` leaf blocks); skip the whole
                     group when no ray can improve its current best hit.
  per leaf block   : slab-test again; on any hit, DMA the block's (9, TB)
                     triangle panel HBM -> VMEM and run Möller–Trumbore for
                     each triangle against the full ray tile, keeping a
                     running (best_t, best_slot).

The running best_t doubles as an occlusion/range cull: it is initialized to
the LiDAR max range, so geometry beyond the first hit or beyond range is
culled at the AABB level (the reference instead filtered by range *after*
intersecting everything — raycast_engine_cpu.py:95-97).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipcgen_tpu.ops.geometry import moller_trumbore_components, ray_aabb_hit
from ipcgen_tpu.ops.raycast import RaycastResult, finalize_result
from ipcgen_tpu.ops.scene_asset import SceneAsset

DEFAULT_ROWS = 8  # rays per tile = ROWS * 128


def _raycast_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    saabb_ref, baabb_ref, tri_hbm,
    t_out, i_out,
    tri_smem, sem,
    *, n_supers: int, super_factor: int, block_size: int, t_max: float,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    init_t = jnp.full(ox.shape, t_max, jnp.float32)
    init_i = jnp.full(ox.shape, -1, jnp.int32)

    def tri_body(k, carry):
        # One triangle broadcast against the whole ray tile.  The panel sits
        # in SMEM: scalar memory permits the dynamic per-triangle reads that
        # VMEM lane indexing forbids, and the scalar core's loads overlap the
        # VPU's vector work.
        best_t, best_i, b = carry
        t = moller_trumbore_components(
            ox, oy, oz, dx, dy, dz,
            tri_smem[0, k], tri_smem[1, k], tri_smem[2, k],
            tri_smem[3, k], tri_smem[4, k], tri_smem[5, k],
            tri_smem[6, k], tri_smem[7, k], tri_smem[8, k],
        )
        take = t < best_t
        slot = b * block_size + k
        return (
            jnp.where(take, t, best_t),
            jnp.where(take, slot, best_i),
            b,
        )

    def visit_block(carry):
        best_t, best_i, b = carry
        cp = pltpu.make_async_copy(tri_hbm.at[b], tri_smem, sem)
        cp.start()
        cp.wait()
        return jax.lax.fori_loop(0, block_size, tri_body, (best_t, best_i, b))

    def blk_body(j, carry):
        best_t, best_i, s = carry
        b = s * super_factor + j
        # Dynamic index must stay on the sublane dim (lane-dim dynamic
        # indexing is not supported by Mosaic) -> AABBs are (N, 8) rows.
        row = baabb_ref[pl.ds(b, 1), :]
        lo = (row[0, 0], row[0, 1], row[0, 2])
        hi = (row[0, 3], row[0, 4], row[0, 5])
        hit_b = ray_aabb_hit(ox, oy, oz, inv_dx, inv_dy, inv_dz, lo, hi, best_t)
        best_t, best_i, _ = jax.lax.cond(
            jnp.any(hit_b), visit_block, lambda c: c, (best_t, best_i, b)
        )
        return best_t, best_i, s

    def visit_super(carry):
        best_t, best_i, s = carry
        return jax.lax.fori_loop(0, super_factor, blk_body, (best_t, best_i, s))

    def super_body(s, carry):
        best_t, best_i = carry
        row = saabb_ref[pl.ds(s, 1), :]
        lo = (row[0, 0], row[0, 1], row[0, 2])
        hi = (row[0, 3], row[0, 4], row[0, 5])
        hit_s = ray_aabb_hit(ox, oy, oz, inv_dx, inv_dy, inv_dz, lo, hi, best_t)
        best_t, best_i, _ = jax.lax.cond(
            jnp.any(hit_s), visit_super, lambda c: c, (best_t, best_i, s)
        )
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(0, n_supers, super_body, (init_t, init_i))
    t_out[:] = jnp.where(best_i >= 0, best_t, jnp.inf)
    i_out[:] = best_i


@functools.partial(
    jax.jit,
    static_argnames=("rows", "t_max", "interpret", "n_supers", "super_factor",
                     "block_size"),
)
def _raycast_pallas_padded(
    ox, oy, oz, dx, dy, dz, saabb, baabb, tri_data,
    *, rows: int, t_max: float, interpret: bool,
    n_supers: int, super_factor: int, block_size: int,
):
    r2 = ox.shape[0]
    grid = (r2 // rows,)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _raycast_kernel,
        n_supers=n_supers,
        super_factor=super_factor,
        block_size=block_size,
        t_max=t_max,
    )
    t, slot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 6
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # super AABBs (6, NS)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # block AABBs (6, NSxSF)
            pl.BlockSpec(memory_space=pl.ANY),  # triangle panels (HBM)
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r2, 128), jnp.float32),
            jax.ShapeDtypeStruct((r2, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((16, block_size), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, saabb, baabb, tri_data)
    return t, slot


def raycast_pallas_components(
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
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
):
    """Pallas kernel over raw asset components; returns (t, packed_slot).

    Component-level twin of ``raycast_asset_xla_culled_components`` so the
    sharded paths (parallel/shard.py) can run the flagship kernel per shard
    inside ``shard_map`` — with block/super arrays already sliced to the
    shard.  ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    n = origins.shape[0]
    tile = rows * 128
    pad = (-n) % tile
    if pad:
        # Padded rays point straight up from far outside the scene.
        pad_o = jnp.full((pad, 3), 1e8, jnp.float32)
        pad_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))
        origins_p = jnp.concatenate([origins, pad_o])
        dirs_p = jnp.concatenate([dirs, pad_d])
    else:
        origins_p, dirs_p = origins, dirs
    r = origins_p.shape[0]
    r2 = r // 128

    comp = lambda a, k: a[:, k].reshape(r2, 128)
    ox, oy, oz = comp(origins_p, 0), comp(origins_p, 1), comp(origins_p, 2)
    dx, dy, dz = comp(dirs_p, 0), comp(dirs_p, 1), comp(dirs_p, 2)

    nb = tri_data.shape[0]
    ns = super_lo.shape[0]
    sf = super_factor
    # (NS, 8) super AABB rows [lox loy loz hix hiy hiz 0 0]; (NS*SF, 8) block
    # rows padded with NaN so padded entries always fail the slab test (NaN
    # comparisons are false).
    zpad = jnp.zeros((ns, 2), jnp.float32)
    saabb = jnp.concatenate([super_lo, super_hi, zpad], axis=1)
    pad_blocks = ns * sf - nb
    blo, bhi = block_lo, block_hi
    if pad_blocks:
        nanpad = jnp.full((pad_blocks, 3), jnp.nan, jnp.float32)
        blo = jnp.concatenate([blo, nanpad])
        bhi = jnp.concatenate([bhi, nanpad])
    baabb = jnp.concatenate(
        [blo, bhi, jnp.zeros((ns * sf, 2), jnp.float32)], axis=1
    )

    t_init = float(t_max) if np.isfinite(t_max) else float(np.finfo(np.float32).max)
    t, slot = _raycast_pallas_padded(
        ox, oy, oz, dx, dy, dz, saabb, baabb, tri_data,
        rows=rows,
        t_max=t_init,
        interpret=interpret,
        n_supers=ns,
        super_factor=sf,
        block_size=block_size,
    )
    return t.reshape(-1)[:n], slot.reshape(-1)[:n]


def raycast_asset_pallas(
    origins,
    dirs,
    asset: SceneAsset,
    t_max: float = np.inf,
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
) -> RaycastResult:
    """Intersect rays with the resident scene via the Pallas TPU kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    t, slot = raycast_pallas_components(
        origins, dirs,
        asset.tri_data, asset.block_lo, asset.block_hi,
        asset.super_lo, asset.super_hi,
        block_size=asset.block_size,
        super_factor=asset.super_factor,
        t_max=t_max,
        rows=rows,
        interpret=interpret,
    )
    return finalize_result(origins, dirs, t, slot, asset)
