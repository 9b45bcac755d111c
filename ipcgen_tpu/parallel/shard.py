"""Sharded multi-chip raycast paths (jax.sharding + shard_map).

The reference has no parallelism of any kind (SURVEY.md §2.4); this module is
the TPU-native equivalent table made real:

- ray-level / waypoint-level DP : rays of the fused multi-waypoint batch are
  sharded over the device mesh ("rays" axis); the scene asset is replicated.
  No collectives on the hot path — each chip intersects its ray shard.
- mesh sharding ("TP" analog)   : triangle leaf-blocks are sharded over the
  "tris" axis for scenes exceeding one chip's HBM; each chip computes its
  partial best hit over all rays and an all_gather + argmin combine (riding
  ICI) selects the global nearest hit.
- scene/room DP                 : rooms are embarrassingly parallel — the
  batch driver simply assigns rooms round-robin; inside a room the two axes
  above apply.

All paths run on a virtual CPU mesh for testing
(xla_force_host_platform_device_count) and on real ICI-linked chips unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ipcgen_tpu.ops.raycast import (
    finalize_result,
    raycast_xla_culled_components,
)
from ipcgen_tpu.ops.scene_asset import SceneAsset

shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
if shard_map is None:  # pragma: no cover - older jax fallback
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_device_mesh(
    n_devices: Optional[int] = None, axis_names: Tuple[str, ...] = ("rays",)
) -> Mesh:
    """1-D (or factored 2-D) device mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devices.reshape(n_devices), axis_names)
    # factor n into a near-square 2-D mesh (dp-major)
    a = int(np.floor(np.sqrt(n_devices)))
    while n_devices % a:
        a -= 1
    shape = (n_devices // a, a)
    return Mesh(devices.reshape(shape), axis_names)


def _pad_rays(origins: jnp.ndarray, dirs: jnp.ndarray, multiple: int):
    n = origins.shape[0]
    pad = (-n) % multiple
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e8, jnp.float32)], axis=0
        )
        dirs = jnp.concatenate(
            [dirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))],
            axis=0,
        )
    return origins, dirs, n


def _local_raycast(
    o, d, tri_data, blo, bhi, slo, shi,
    *, block_size: int, super_factor: int, t_max: float,
    backend: str, interpret: bool,
):
    """Per-shard raycast core: the MXU pairs kernel on TPU (or in interpret
    mode for CPU-mesh tests), the VPU Pallas kernel for bit-exactness, the
    AABB-culled XLA traversal otherwise.  All share the component-level
    (t, packed_slot) contract."""
    if backend == "mxu":
        from ipcgen_tpu.ops.raycast_mxu import raycast_mxu_components

        return raycast_mxu_components(
            o, d, tri_data, blo, bhi, t_max=t_max, interpret=interpret,
        )
    if backend == "pallas":
        from ipcgen_tpu.ops.raycast_pallas import raycast_pallas_components

        return raycast_pallas_components(
            o, d, tri_data, blo, bhi, slo, shi,
            block_size=block_size, super_factor=super_factor,
            t_max=t_max, interpret=interpret,
        )
    return raycast_xla_culled_components(
        o, d, tri_data, blo, bhi, slo, shi,
        block_size=block_size, super_factor=super_factor, t_max=t_max,
    )


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "mxu" if jax.default_backend() == "tpu" else "xla"
    return backend


def sharded_raycast_rays(
    origins,
    dirs,
    asset: SceneAsset,
    mesh: Mesh,
    axis: str = "rays",
    backend: str = "auto",
    t_max: float = np.inf,
    interpret: bool = False,
):
    """Data-parallel raycast: rays sharded, asset replicated.

    Each chip runs the flagship Pallas kernel (or the culled XLA traversal
    off-TPU) on its ray shard — the sharded path no longer leaves the
    single-chip kernel's throughput on the table.  Returns a RaycastResult
    for the original (unpadded) ray count.
    """
    n_shards = mesh.shape[axis]
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    origins_p, dirs_p, n = _pad_rays(origins, dirs, n_shards)
    backend = _resolve_backend(backend)

    asset_specs = jax.tree.map(lambda _: P(), asset)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), asset_specs),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def _shard_fn(o, d, a):
        return _local_raycast(
            o, d, a.tri_data, a.block_lo, a.block_hi, a.super_lo, a.super_hi,
            block_size=a.block_size, super_factor=a.super_factor,
            t_max=t_max, backend=backend, interpret=interpret,
        )

    t, slot = jax.jit(_shard_fn)(origins_p, dirs_p, asset)
    return finalize_result(origins, dirs, t[:n], slot[:n], asset)


def _shard_asset_blocks(asset: SceneAsset, n_shards: int) -> SceneAsset:
    """Pad the leaf blocks so each shard gets whole super-blocks, and rebuild
    the super AABBs to match.

    The block count is padded to a multiple of ``n_shards * super_factor``:
    every shard then owns ``shard_nb / super_factor`` complete supers, so the
    per-shard two-level culled traversal (Pallas or XLA) works on a plain
    slice of (tri_data, block AABBs, super AABBs).
    """
    nb = asset.num_blocks
    tb = asset.block_size
    sf = asset.super_factor
    quantum = n_shards * sf
    pad = (-nb) % quantum
    nb_p = nb + pad
    if pad:
        tri_data = jnp.concatenate(
            [asset.tri_data, jnp.full((pad, 16, tb), 1e7, jnp.float32)], axis=0
        )
        nanpad = jnp.full((pad, 3), jnp.nan, jnp.float32)
        block_lo = jnp.concatenate([asset.block_lo, nanpad])
        block_hi = jnp.concatenate([asset.block_hi, nanpad])
        tri_index = jnp.concatenate(
            [asset.tri_index, jnp.full((pad * tb,), -1, jnp.int32)]
        )
        tri_normal = jnp.concatenate(
            [asset.tri_normal, jnp.zeros((pad * tb, 3), jnp.float32)]
        )
        tri_fin = jnp.concatenate(
            [
                tri_normal,
                jax.lax.bitcast_convert_type(tri_index, jnp.float32)[:, None],
            ],
            axis=1,
        )
    else:
        tri_data = asset.tri_data
        block_lo, block_hi = asset.block_lo, asset.block_hi
        tri_index, tri_normal = asset.tri_index, asset.tri_normal
        tri_fin = asset.tri_fin
    # Rebuild supers over the padded block axis (NaN-aware: padded blocks
    # carry NaN AABBs, and all-NaN supers can never pass the slab test).
    ns_p = nb_p // sf
    if pad or asset.num_supers != ns_p:
        sup_lo = jnp.nanmin(block_lo.reshape(ns_p, sf, 3), axis=1)
        sup_hi = jnp.nanmax(block_hi.reshape(ns_p, sf, 3), axis=1)
    else:
        sup_lo, sup_hi = asset.super_lo, asset.super_hi
    return SceneAsset(
        tri_data=tri_data,
        block_lo=block_lo,
        block_hi=block_hi,
        super_lo=sup_lo,
        super_hi=sup_hi,
        tri_index=tri_index,
        tri_normal=tri_normal,
        tri_fin=tri_fin,
        n_tris=asset.n_tris,
        block_size=tb,
        super_factor=sf,
    )


def sharded_raycast_tris(
    origins,
    dirs,
    asset: SceneAsset,
    mesh: Mesh,
    axis: str = "tris",
    backend: str = "auto",
    t_max: float = np.inf,
    interpret: bool = False,
):
    """Triangle-sharded raycast: each chip holds a slice of the leaf blocks
    (whole super-blocks, see _shard_asset_blocks) and runs the full two-level
    AABB-culled traversal — Pallas on TPU, culled XLA elsewhere — over ALL
    rays against its slice; the global nearest hit is selected by an
    all_gather + argmin over the device axis (ICI collective).
    """
    n_shards = mesh.shape[axis]
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    asset_p = _shard_asset_blocks(asset, n_shards)
    nb = asset_p.num_blocks
    tb = asset_p.block_size
    sf = asset_p.super_factor
    shard_nb = nb // n_shards
    backend = _resolve_backend(backend)

    # Per-shard inputs: block panels + block/super AABBs sharded on the
    # block axis; rays replicated.
    in_specs = (
        P(),  # origins
        P(),  # dirs
        P(axis),  # tri_data
        P(axis),  # block_lo
        P(axis),  # block_hi
        P(axis),  # super_lo
        P(axis),  # super_hi
    )

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    def _shard_fn(o, d, tri_data, blo, bhi, slo, shi):
        t_local, slot_local = _local_raycast(
            o, d, tri_data, blo, bhi, slo, shi,
            block_size=tb, super_factor=sf,
            t_max=t_max, backend=backend, interpret=interpret,
        )
        # Shard-local slot -> global slot
        shard_id = jax.lax.axis_index(axis)
        slot_global = jnp.where(
            slot_local >= 0, slot_local + shard_id * shard_nb * tb, -1
        )
        # Global min-t combine over the triangle axis.
        t_all = jax.lax.all_gather(t_local, axis)  # (S, R)
        slot_all = jax.lax.all_gather(slot_global, axis)  # (S, R)
        winner = jnp.argmin(t_all, axis=0)  # (R,)
        r_idx = jnp.arange(t_all.shape[1])
        return t_all[winner, r_idx], slot_all[winner, r_idx]

    t, slot = jax.jit(_shard_fn)(
        origins, dirs, asset_p.tri_data, asset_p.block_lo, asset_p.block_hi,
        asset_p.super_lo, asset_p.super_hi,
    )
    return finalize_result(origins, dirs, t, slot, asset_p)


@functools.lru_cache(maxsize=16)
def _sharded_scan_core(
    mesh: Mesh, ray_axis: str, max_range: float,
    backend: str = "auto", interpret: bool = False,
    range_noise_std: float = 0.0,
):
    """Build (and cache) the fully-jitted sharded scan program for a mesh."""
    from ipcgen_tpu.models import beams
    from ipcgen_tpu.sim.scan import ScanBatch

    @jax.jit
    def core(asset, poses, dirs_sensor, keep, noise_key, perm, inv_perm):
        # Raycast in patch-permuted order (sim/scan.py scan_permutation):
        # each chip's ray shard keeps the same angular tile coherence as the
        # single-chip kernel.  As in sim/scan.py::_scan_core, the SENSOR
        # pattern is permuted before the rotation (rotation commutes with a
        # per-ray permutation), origins are never gathered, the noise
        # stream is drawn in beam order and permuted, and every output is
        # inverse-permuted exactly once — keeping the sharded scan
        # bit-identical to the single-chip scan.
        w = poses.shape[0]
        r = dirs_sensor.shape[1]
        # Gather the three lane-aligned (WB, R) planes instead of the
        # (WB, R, 3) array (non-minor-axis gather with a 3-wide minor dim
        # lowers to a lane-misaligned slow path — sim/scan.py,
        # frontend_probe4).  Same values, bit-identical results.
        dirs_sp = jnp.stack(
            [dirs_sensor[..., j][:, perm] for j in range(3)], axis=-1
        )  # (WB, R, 3), WB in {1, W}
        dirs_wp = beams.dirs_to_world_batch(
            jnp.broadcast_to(dirs_sp, (w, r, 3)), poses
        )
        origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
        res = sharded_raycast_rays(
            origins.reshape(w * r, 3),
            dirs_wp.reshape(w * r, 3), asset, mesh,
            axis=ray_axis, backend=backend, t_max=max_range,
            interpret=interpret,
        )
        t = res.t.reshape(w, r)
        hit = res.hit.reshape(w, r)
        points = res.points.reshape(w, r, 3)
        normals = res.normals.reshape(w, r, 3)
        if range_noise_std > 0.0:
            # Same semantics as the single-chip scan (sim/scan.py): sigma
            # perturbs the measured distance before point reconstruction,
            # drawn in beam order for a bit-exact stream.
            sigma = (
                jax.random.normal(noise_key, (w, r)) * range_noise_std
            )[:, perm]
            # Millimetre floor as in sim/scan.py: range noise must not
            # reconstruct points behind the sensor.
            t = jnp.where(hit, jnp.maximum(t + sigma, 1e-3), t)
            points = origins + dirs_wp * t[..., None]
        mask = hit & jnp.broadcast_to(keep[:, perm], (w, r)) & (t < max_range)
        incident = jnp.degrees(
            jnp.arccos(jnp.clip(jnp.abs(dirs_wp[..., 2]), 0.0, 1.0))
        )
        incident = jnp.where(mask, incident, 0.0)
        cos_true = jnp.clip(jnp.abs(jnp.sum(dirs_wp * normals, axis=-1)), 0.0, 1.0)
        true_incidence = jnp.where(mask, jnp.degrees(jnp.arccos(cos_true)), 0.0)
        return ScanBatch(
            points=jnp.where(mask[..., None], points, 0.0)[:, inv_perm],
            t=jnp.where(mask, t, jnp.inf)[:, inv_perm],
            mask=mask[:, inv_perm],
            incident_angles=incident[:, inv_perm],
            normals=jnp.where(mask[..., None], normals, 0.0)[:, inv_perm],
            true_incidence=true_incidence[:, inv_perm],
        )

    return core


def sharded_raycast_2d(
    origins,
    dirs,
    asset: SceneAsset,
    mesh: Mesh,
    ray_axis: str = "rays",
    tri_axis: str = "tris",
    backend: str = "auto",
    t_max: float = np.inf,
    interpret: bool = False,
):
    """Combined sharding over a 2-D device mesh: rays over ``ray_axis`` (DP)
    AND triangle blocks over ``tri_axis`` (TP analog).

    Each device runs the two-level AABB-culled traversal (Pallas on TPU) of
    its ray shard against its block shard; the global nearest hit per ray
    combines with an ``all_gather`` + argmin over the triangle axis only
    (rays never move).
    """
    n_ray_shards = mesh.shape[ray_axis]
    n_tri_shards = mesh.shape[tri_axis]
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    origins_p, dirs_p, n = _pad_rays(origins, dirs, n_ray_shards)
    asset_p = _shard_asset_blocks(asset, n_tri_shards)
    tb = asset_p.block_size
    sf = asset_p.super_factor
    shard_nb = asset_p.num_blocks // n_tri_shards
    backend = _resolve_backend(backend)

    in_specs = (
        P(ray_axis),  # origins
        P(ray_axis),  # dirs
        P(tri_axis),  # tri_data (rays replicated across tri_axis, blocks across ray_axis)
        P(tri_axis),  # block_lo
        P(tri_axis),  # block_hi
        P(tri_axis),  # super_lo
        P(tri_axis),  # super_hi
    )

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ray_axis), P(ray_axis)), check_vma=False,
    )
    def _shard_fn(o, d, tri_data, blo, bhi, slo, shi):
        t_local, slot_local = _local_raycast(
            o, d, tri_data, blo, bhi, slo, shi,
            block_size=tb, super_factor=sf,
            t_max=t_max, backend=backend, interpret=interpret,
        )
        tri_id = jax.lax.axis_index(tri_axis)
        slot_global = jnp.where(
            slot_local >= 0, slot_local + tri_id * shard_nb * tb, -1
        )
        t_all = jax.lax.all_gather(t_local, tri_axis)  # (S_tri, R_shard)
        slot_all = jax.lax.all_gather(slot_global, tri_axis)
        winner = jnp.argmin(t_all, axis=0)
        r_idx = jnp.arange(t_all.shape[1])
        return t_all[winner, r_idx], slot_all[winner, r_idx]

    t, slot = jax.jit(_shard_fn)(
        origins_p, dirs_p, asset_p.tri_data, asset_p.block_lo,
        asset_p.block_hi, asset_p.super_lo, asset_p.super_hi,
    )
    return finalize_result(origins, dirs, t[:n], slot[:n], asset_p)


def scan_waypoints_sharded(
    asset: SceneAsset,
    intrinsics,
    poses: np.ndarray,
    mesh: Mesh,
    key: Optional[jax.Array] = None,
    ray_axis: str = "rays",
    backend: str = "auto",
    interpret: bool = False,
    apply_range_noise: bool = False,
):
    """Fused multi-waypoint scan with rays sharded across the device mesh.

    Drop-in sharded counterpart of ipcgen_tpu.sim.scan.scan_waypoints; the
    whole post-beam-gen program (transform, per-chip Pallas/culled-XLA
    raycast with range culling, masking) is one compiled dispatch.
    """
    from ipcgen_tpu.sim.scan import scan_permutation, sensor_dirs_batch

    poses = jnp.asarray(poses, jnp.float32)
    n_waypoints = poses.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    sigma = (
        float(getattr(intrinsics, "range_noise_std", 0.0))
        if apply_range_noise
        else 0.0
    )
    if sigma > 0.0:
        beam_key, noise_key = jax.random.split(key)
    else:
        beam_key = noise_key = key
    dirs_sensor, keep = sensor_dirs_batch(intrinsics, n_waypoints, beam_key)
    resolved = _resolve_backend(backend)
    perm, inv_perm = scan_permutation(
        intrinsics, resolved, int(dirs_sensor.shape[1])
    )
    core = _sharded_scan_core(
        mesh, ray_axis, float(intrinsics.max_range),
        backend=resolved, interpret=bool(interpret),
        range_noise_std=sigma,
    )
    return core(
        asset, poses, dirs_sensor, keep, noise_key,
        jnp.asarray(perm), jnp.asarray(inv_perm),
    )


def sharded_grid_nn(
    queries: np.ndarray,
    refs: np.ndarray,
    mesh: Mesh,
    axis: str = "rays",
    cell_size: Optional[float] = None,
    cap: int = 48,
    q_block: int = 8192,
) -> np.ndarray:
    """Grid-hashed 1-NN with the query axis data-parallel over ``mesh``.

    The reference's label transfer is a sequential sklearn BallTree loop
    (containers/s3dis_sim_scene.py:415-424); on a pod slice the ~millions of
    simulated points shard across chips while the hashed bucket table and
    sorted references replicate (a few MB — they ride the broadcast, queries
    ride ICI). Semantics match ops.grid_nn.nearest_neighbor_indices_grid:
    hashed answers are accepted only when provably nearest (d <= h/2, no
    bucket overflow), the rest take the exact host-side fallback.
    """
    from ipcgen_tpu.ops import grid_nn as g

    queries = np.asarray(queries, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    n, m = len(queries), len(refs)
    if n == 0:
        return np.zeros((0,), np.int32)
    ndev = mesh.devices.size

    if cell_size is None:
        cell_size = g._choose_cell_size(refs, cap)
    order, starts, lo, dims, inv_h = g._build_hash_grid(refs, cell_size)
    refs_sorted = refs[order]

    m_pad = g._bucket_len(m)
    refs_b = np.concatenate([refs_sorted, np.full((m_pad - m, 3), 1e7, np.float32)])
    # Query padding must divide evenly over devices AND query tiles.
    chunk = q_block * ndev
    n_pad = g._bucket_len(-(-n // chunk)) * chunk
    qp = np.concatenate(
        [queries, np.full((n_pad - n, 3), lo - 10 * cell_size, np.float32)]
    ) if n_pad != n else queries

    core = functools.partial(g._grid_nn_core, cap=int(cap), q_block=int(q_block))
    sharded = jax.jit(
        shard_map(
            lambda q, r, s, l, ih, dm: core(q, r, s, l, ih, dm),
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
    )
    idx_sorted, d2, ovf = sharded(
        jnp.asarray(qp),
        jnp.asarray(refs_b),
        jnp.asarray(starts),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(inv_h),
        jnp.asarray(dims.astype(np.int32)),
    )
    idx_enc = g._accept_exact(
        idx_sorted, d2, ovf, jnp.float32((0.5 * cell_size) ** 2)
    )
    idx_enc = np.asarray(idx_enc[:n])
    resolved = idx_enc >= 0
    result = order[np.clip(idx_enc, 0, m - 1)].astype(np.int32)
    if not resolved.all():
        from ipcgen_tpu.ops.knn import nearest_neighbor_indices

        result[~resolved] = nearest_neighbor_indices(queries[~resolved], refs)
    return result
