"""Fused multi-waypoint LiDAR scan pipeline.

The reference's hot loop runs one waypoint at a time, regenerating rays in
Python and rebuilding the Embree BVH per frame (s3dis_simulator.py:254-288,
SURVEY.md §3.2).  Here the WHOLE trajectory is one fixed-shape batch: beam
generation (+ per-waypoint noise/dropout with split PRNG keys), pose
transforms, and the raycast ride a single device program over the resident
SceneAsset.  Hits stay masked, never compacted, until host export.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.models import beams
from ipcgen_tpu.models.lidar_intrinsics import (
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
)
from ipcgen_tpu.ops.raycast import raycast_asset
from ipcgen_tpu.ops.scene_asset import SceneAsset


@jax.jit
def _quantize_points(points, mask):
    """uint16-quantize hit points against their own bounding box (module
    level so the jit cache is shared across ScanBatch instances)."""
    m3 = mask[..., None]
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(m3, points, big), axis=(0, 1))
    hi = jnp.max(jnp.where(m3, points, -big), axis=(0, 1))
    lo = jnp.where(lo > hi, 0.0, lo)  # no hits at all
    hi = jnp.where(lo > hi, 0.0, hi)
    scale = jnp.maximum(hi - lo, 1e-6) / 65535.0
    q = jnp.clip(
        jnp.round((points - lo) / scale), 0.0, 65535.0
    ).astype(jnp.uint16)
    return q, lo, scale


class ScanBatch(NamedTuple):
    """Fixed-shape multi-waypoint scan result (device arrays)."""

    points: jnp.ndarray  # (W, R, 3) world hit points (0 where invalid)
    t: jnp.ndarray  # (W, R) hit distance, +inf miss
    mask: jnp.ndarray  # (W, R) valid hit (hit & kept & in range)
    incident_angles: jnp.ndarray  # (W, R) degrees (reference formula)
    normals: jnp.ndarray  # (W, R, 3) geometric surface normals
    true_incidence: jnp.ndarray  # (W, R) degrees from surface normals

    @property
    def num_waypoints(self) -> int:
        return self.points.shape[0]

    @property
    def rays_per_scan(self) -> int:
        return self.points.shape[1]

    def frame_arrays(self, w: int):
        """Compact one waypoint's hits to numpy (host export)."""
        from ipcgen_tpu.utils.host import to_host

        m = to_host(self.mask[w])
        return (
            np.asarray(self.points[w])[m],
            np.asarray(self.incident_angles[w])[m],
        )

    def points_and_mask(self, quantized: bool = False):
        """Minimal host export: (points (W,R,3), mask (W,R)) in one pull.

        Incident angles and sensor ranges are exact functions of
        (point - origin) for unit rays, so callers that know the origins
        (sim/simulator.py collect_scan) skip ~40% of the device->host
        transfer by deriving them host-side — the reference's own angle
        formula works from the points too (raycast_engine_cpu.py:99-109).

        ``quantized=True`` transfers the points as uint16 offsets against
        the batch's own bounding box (one device reduction) and dequantizes
        host-side: 6 bytes/point instead of 12 with a worst-case rounding
        error of span/65535 per axis (~0.2 mm for indoor rooms) — two
        orders below the sensor's 20 mm range-noise sigma and the 5 mm
        hardware parity contract.  Worth it only when the device link is a
        remote tunnel whose D2H bandwidth dominates the sim stage.
        """
        from ipcgen_tpu.utils.host import to_host

        if not quantized:
            return np.asarray(self.points), to_host(self.mask)

        q, lo, scale = _quantize_points(self.points, self.mask)
        mask = to_host(self.mask)
        q = np.asarray(q)
        lo = np.asarray(lo)
        scale = np.asarray(scale)
        return (
            q.astype(np.float32) * scale[None, None, :] + lo[None, None, :],
            mask,
        )

    def to_numpy(self, with_ranges: bool = False):
        """One bulk device->host transfer of (points, angles, mask[, t]).

        Per-frame np.asarray slicing costs one RPC per frame on remote-
        attached TPUs; exporting the whole batch at once is ~40x fewer
        transfers for a 40-frame trajectory.  ``with_ranges`` additionally
        returns the true sensor hit distances ``t`` (for the sensor-range
        quality stats the reference never computed — its "range" stats are
        norms of world coordinates, s3dis_simulator.py:276-284).
        """
        from ipcgen_tpu.utils.host import to_host

        out = (
            np.asarray(self.points),
            np.asarray(self.incident_angles),
            to_host(self.mask),
        )
        if with_ranges:
            out = out + (np.asarray(self.t),)
        return out


def sensor_dirs_batch(intrinsics, num_waypoints: int, key: Optional[jax.Array]):
    """Per-waypoint sensor-frame beam directions + keep masks.

    Returns ``(dirs (WB, R, 3), keep (WB, R))`` where WB is 1 for static
    profiles (one pattern shared by every waypoint — returned UNBROADCAST
    so the scan cores can fuse the waypoint broadcast into their jit
    instead of materializing a (W, R, 3) copy on device) and
    ``num_waypoints`` for the dual-axis scanner, which re-rolls angle noise
    and dropout per waypoint (the reference constructs a fresh lidar per
    waypoint, s3dis_simulator.py:256-257).
    """
    if isinstance(intrinsics, DualAxisLidarIntrinsics):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, num_waypoints)
        n = int(intrinsics.point_rate * intrinsics.scan_duration)
        gen = lambda k: beams.gen_dual_axis_dirs(
            k,
            n,
            intrinsics.num_vertical_lines,
            float(intrinsics.theta_range[0]),
            float(intrinsics.theta_range[1]),
            float(intrinsics.swing_amplitude),
            float(intrinsics.swing_frequency),
            float(intrinsics.angle_noise_std),
            float(intrinsics.dropout_probability),
        )
        dirs, keep = jax.vmap(gen)(keys)  # (W, N, 3), (W, N)
        return dirs, keep
    if isinstance(intrinsics, Indoor8LineLidarIntrinsics):
        vdeg = (
            tuple(float(v) for v in intrinsics.vertical_degrees)
            if intrinsics.vertical_degrees is not None
            else None
        )
        return _static_profile_dirs(
            float(intrinsics.fov_up),
            float(intrinsics.fov_down),
            int(intrinsics.vertical_res),
            int(intrinsics.horizontal_res),
            vdeg,
        )
    raise ValueError(f"Unsupported LiDAR intrinsics type: {type(intrinsics)}")


@functools.lru_cache(maxsize=16)
def _static_profile_dirs(fov_up, fov_down, v_res, h_res, vdeg_tuple):
    """Device-resident (1, R, 3) dirs + all-ones keep for static grid
    profiles.  The pattern is a pure function of the profile constants, but
    generating it eagerly per scan costs ~8 dispatches + a 1.5 MB upload
    over the remote tunnel (~20 ms/call measured on the unordered-path
    bisect) — cached device arrays make repeat scans free."""
    if vdeg_tuple is None:
        dirs = beams.gen_uniform_grid_dirs(fov_up, fov_down, v_res, h_res)
    else:
        dirs = beams.gen_vertical_degree_dirs(list(vdeg_tuple), h_res)
    keep = jnp.ones((1, dirs.shape[0]), dtype=bool)
    dirs = dirs[None]
    jax.block_until_ready(dirs)
    return dirs, keep


@functools.lru_cache(maxsize=16)
def _static_profile_dirs_permuted(fov_up, fov_down, v_res, h_res, vdeg_tuple,
                                  perm_bytes):
    """Device-resident (1, R, 3) dirs ALREADY in kernel patch order.

    The in-jit permutation gather on a (1, R, 3) array indexes along a
    non-minor axis with a 3-wide minor dim — a lane-misaligned gather XLA
    lowers to a slow path costing ~25 ms of a ~133 ms dense-32 scan
    (scripts/frontend_probe4.py e2 vs scripts/scan_unordered_bisect.py a1:
    host-prepermuted dirs 132.8 ms, in-jit gather 157-159 ms).  Static
    profiles are pure functions of their constants, so the permuted
    pattern is computed on host once and cached on device."""
    dirs, _ = _static_profile_dirs(fov_up, fov_down, v_res, h_res, vdeg_tuple)
    perm = np.frombuffer(perm_bytes, dtype=np.int32)
    dirs_sp = jnp.asarray(np.asarray(dirs)[:, perm])
    jax.block_until_ready(dirs_sp)
    return dirs_sp


@functools.lru_cache(maxsize=32)
def patch_permutation(h: int, w: int, lines_pp: int = 8,
                      az_pp: int = 128) -> np.ndarray:
    """Ray order whose 1024-ray kernel tiles are angular PATCHES.

    The natural beam order is line-major: a tile of 1024 consecutive rays is
    one line's 92-degree azimuth ribbon.  Reordering to (line-group,
    azimuth-group) patches of ``lines_pp x az_pp`` rays shrinks each tile's
    solid angle, so the MXU kernel's per-tile candidate block lists get
    ~1.6x shorter on cluttered rooms (measured; ordering is a pure
    permutation — results are restored to beam order afterwards).
    """
    line = np.repeat(np.arange(h), w)
    az = np.tile(np.arange(w), h)
    perm = np.lexsort(
        (az % az_pp, line % lines_pp, az // az_pp, line // lines_pp)
    ).astype(np.int32)
    perm.setflags(write=False)  # lru_cache shares the array
    return perm


def scan_permutation(intrinsics, backend: str, r: int):
    """(perm, inv_perm) pair for a profile/backend combination.

    The MXU kernel wants angularly tight 1024-ray tiles (see
    patch_permutation); other backends take the identity.  Shared by the
    single-chip scan and the sharded scan (parallel/shard.py) so a ray-DP
    multi-chip run keeps the same per-chip tile coherence as one chip.
    """
    if backend == "mxu" and isinstance(intrinsics, Indoor8LineLidarIntrinsics):
        h = (
            len(intrinsics.vertical_degrees)
            if intrinsics.vertical_degrees is not None
            else intrinsics.vertical_res
        )
        perm = patch_permutation(h, r // h)
    elif backend == "mxu" and isinstance(intrinsics, DualAxisLidarIntrinsics):
        # The dual-axis spiral is also line-major (beams.gen_dual_axis_dirs);
        # the same patch reorder keeps kernel tiles angularly tight.
        h = int(intrinsics.num_vertical_lines)
        perm = patch_permutation(h, r // h)
    else:
        perm = _identity_perm(r)
    return perm, _inverse_perm(perm.tobytes(), r)


@functools.lru_cache(maxsize=32)
def _identity_perm(r: int) -> np.ndarray:
    p = np.arange(r, dtype=np.int32)
    p.setflags(write=False)
    return p


@functools.lru_cache(maxsize=32)
def _inverse_perm(perm_bytes: bytes, r: int) -> np.ndarray:
    inv = np.argsort(
        np.frombuffer(perm_bytes, dtype=np.int32)
    ).astype(np.int32)
    inv.setflags(write=False)
    return inv


@functools.lru_cache(maxsize=1)
def _default_key():
    return jax.random.PRNGKey(0)


@functools.lru_cache(maxsize=32)
def _device_perm_pair(perm_bytes: bytes, r: int):
    """Device-resident (perm, inv_perm) — re-uploading the 1 MB of index
    tables per scan costs a couple ms over the remote tunnel."""
    perm = jnp.asarray(np.frombuffer(perm_bytes, dtype=np.int32))
    inv = jnp.asarray(_inverse_perm(perm_bytes, r))
    jax.block_until_ready(inv)
    return perm, inv


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_range", "backend", "range_noise_std", "outputs", "has_keep",
        "pre_permuted",
    ),
)
def _scan_core(
    asset: SceneAsset,
    poses: jnp.ndarray,
    dirs_sensor: jnp.ndarray,
    keep: jnp.ndarray,
    noise_key: jnp.ndarray,
    perm: jnp.ndarray,
    inv_perm: jnp.ndarray,
    max_range: float,
    backend: str,
    range_noise_std: float,
    outputs: str = "full",
    has_keep: bool = True,
    pre_permuted: bool = False,
) -> ScanBatch:
    """The whole post-beam-gen scan as ONE compiled program: pose transform,
    ray permutation, raycast, range noise, range mask, and both incidence
    formulas fuse into a single dispatch (eager per-op dispatch over the
    remote TPU link would otherwise dominate the kernel time).

    Everything up to the final outputs runs in PATCH order: the sensor
    pattern is permuted once (a (1, R, 3) gather for static profiles —
    rotation commutes with a per-ray permutation), origins are a broadcast
    of the pose translation (never gathered), the per-beam noise stream is
    drawn in beam order and permuted so outputs stay bit-identical to the
    beam-order formulation, and each output is inverse-permuted exactly
    once at the end.  This halves the permutation gather traffic vs
    permuting (W, R, 3) world rays forward and every result back.
    """
    w = poses.shape[0]
    r = dirs_sensor.shape[1]
    if pre_permuted:
        # Static profiles arrive already in patch order (host-permuted,
        # cached on device) — the in-jit gather is skipped entirely.
        dirs_sp = dirs_sensor
    else:
        # Per-waypoint patterns (dual-axis noise streams) must be permuted
        # in-program.  Gathering the (WB, R, 3) array directly indexes a
        # non-minor axis with a 3-wide minor dim — a lane-misaligned
        # gather costing ~25 ms at R=128 k (frontend_probe4) — so gather
        # the three lane-aligned (WB, R) planes instead and restack.
        dirs_sp = jnp.stack(
            [dirs_sensor[..., j][:, perm] for j in range(3)], axis=-1
        )  # (WB, R, 3), WB in {1, W}
    dirs_wp = beams.dirs_to_world_batch(
        jnp.broadcast_to(dirs_sp, (w, r, 3)), poses
    )  # (W, R, 3) patch order
    origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
    # Pin the beam transform as materialized values: without the barrier
    # XLA fuses (= recomputes) the cheap einsum producer inside the MXU
    # prepass's chunked slab loop, costing ~26 ms of a ~158 ms dense-32
    # scan; with it the fused program matches kernel-only throughput
    # bit-exactly (scripts/frontend_probe3.py: 159 -> 133 ms).
    origins, dirs_wp = jax.lax.optimization_barrier((origins, dirs_wp))
    res = raycast_asset(
        origins.reshape(w * r, 3),
        dirs_wp.reshape(w * r, 3),
        asset,
        backend=backend,
        t_max=max_range,
    )
    t = res.t.reshape(w, r)
    hit = res.hit.reshape(w, r)
    points = res.points.reshape(w, r, 3)
    normals = res.normals.reshape(w, r, 3)

    if range_noise_std > 0.0:
        # Sensor range noise: the profile's sigma perturbs the measured
        # distance BEFORE point reconstruction (the reference declares this
        # sigma, lidar/lidar_intrinsics.py:236, but never applies it —
        # resolved per SURVEY.md §7, behind a flag defaulting to parity/off).
        # Drawn in beam order and permuted so the stream matches the
        # beam-order formulation bit-exactly.
        sigma = (
            jax.random.normal(noise_key, (w, r)) * range_noise_std
        )[:, perm]
        # Floor at a millimetre: for hits closer than ~3 sigma the Gaussian
        # could drive t negative and reconstruct the point behind the
        # sensor (a physical sensor saturates, it does not mirror).
        t = jnp.where(hit, jnp.maximum(t + sigma, 1e-3), t)
        points = origins + dirs_wp * t[..., None]

    # Profiles without dropout (the 8/32-line grids) have keep == ones by
    # construction; ``has_keep`` is static, so the (W, R) keep gather + AND
    # compile away entirely on those profiles.
    if has_keep:
        mask = hit & jnp.broadcast_to(keep[:, perm], (w, r)) & (t < max_range)
    else:
        mask = hit & (t < max_range)
    if outputs in ("minimal", "unordered"):
        # Product hot path (sim/simulator.py collect_scan) consumes ONLY
        # points + mask (+ t for the completion barrier); incident angles
        # and ranges are exact host-side functions of (point - origin)
        # for unit rays.  Skipping the angle math, the normals output,
        # and their inverse-permutation gathers also lets XLA dead-code-
        # eliminate finalize's (R, 4) tri_fin gather (normals/tri_id are
        # its only consumers) — measured ~10% off the fused scan.
        #
        # "unordered" additionally skips the remaining inverse
        # permutations: rays come back in PATCH order, not beam order.
        # Consumers that only mask-select per waypoint (the simulator:
        # per-frame point sets, host-derived angles/ranges, label-transfer
        # queries) are order-free; anything needing beam order uses
        # "minimal"/"full".
        zero_wr = jnp.zeros((w, r), jnp.float32)
        if outputs == "unordered":
            return ScanBatch(
                points=jnp.where(mask[..., None], points, 0.0),
                t=jnp.where(mask, t, jnp.inf),
                mask=mask,
                incident_angles=zero_wr,
                normals=jnp.zeros((w, r, 3), jnp.float32),
                true_incidence=zero_wr,
            )
        return ScanBatch(
            points=jnp.where(mask[..., None], points, 0.0)[:, inv_perm],
            t=jnp.where(mask, t, jnp.inf)[:, inv_perm],
            mask=mask[:, inv_perm],
            incident_angles=zero_wr,
            normals=jnp.zeros((w, r, 3), jnp.float32),
            true_incidence=zero_wr,
        )
    # Reference formula: angle of the (unit) ray direction to vertical,
    # computed from normalized (point - center) == the ray direction.
    incident = jnp.degrees(
        jnp.arccos(jnp.clip(jnp.abs(dirs_wp[..., 2]), 0.0, 1.0))
    )
    incident = jnp.where(mask, incident, 0.0)
    # True incidence: angle between the ray and the surface normal.
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


def scan_waypoints(
    asset: SceneAsset,
    intrinsics,
    poses: np.ndarray,
    key: Optional[jax.Array] = None,
    backend: str = "auto",
    apply_range_noise: bool = False,
    outputs: str = "full",
) -> ScanBatch:
    """Scan the scene from every waypoint pose in one fused batch.

    Parameters
    ----------
    asset : resident scene acceleration structure.
    intrinsics : any LiDAR profile from ipcgen_tpu.models.
    poses : (W, 4, 4) LiDAR poses (Waypoint.to_pose_matrix stack).
    key : PRNG key for sensor noise / dropout.
    backend : raycast backend ("auto" | "pallas" | "xla").
    apply_range_noise : apply the profile's Gaussian range sigma to the
        measured distances.  Defaults False = reference parity (the
        reference declares range_noise_std but never applies it,
        lidar/lidar_intrinsics.py:236 + :364-389).
    outputs : "full" (default) fills every ScanBatch field; "minimal"
        computes only points/t/mask (incident_angles, normals,
        true_incidence come back zero-filled) — the sim driver's hot
        path, which derives angles/ranges host-side from the points.
        "unordered" is "minimal" without the inverse permutations: rays
        within each waypoint come back in kernel PATCH order rather than
        beam order (the same SET of hits — use it when downstream only
        mask-selects per waypoint, as the simulator does).

    Semantics parity with the reference engine
    (raycast_engine_cpu.py:75-111): hits beyond ``max_range`` are dropped
    (strict <) and the "incident angle" output keeps the reference's
    elevation-based formula degrees(arccos(|dz|)); the true normal-based
    incidence is additionally provided (SURVEY.md §7).
    """
    poses = jnp.asarray(poses, jnp.float32)
    n_waypoints = poses.shape[0]
    if key is None:
        key = _default_key()
    sigma = (
        float(getattr(intrinsics, "range_noise_std", 0.0))
        if apply_range_noise
        else 0.0
    )
    if sigma > 0.0:
        beam_key, noise_key = jax.random.split(key)
    else:
        # No extra eager dispatch on the hot path: over a remote-attached
        # TPU every un-jitted op costs an RPC round trip (~0.5 ms).
        beam_key = noise_key = key
    dirs_sensor, keep = sensor_dirs_batch(intrinsics, n_waypoints, beam_key)
    if backend == "auto":
        backend = "mxu" if jax.default_backend() == "tpu" else "xla"
    r = dirs_sensor.shape[1]
    perm, inv_perm = scan_permutation(intrinsics, backend, r)
    perm_d, inv_perm_d = _device_perm_pair(perm.tobytes(), r)
    pre_permuted = False
    if isinstance(intrinsics, Indoor8LineLidarIntrinsics):
        # Static grid pattern: permute once on host, cache on device, and
        # skip the in-jit gather (lane-misaligned; ~25 ms at R=128 k).
        vdeg = (
            tuple(float(v) for v in intrinsics.vertical_degrees)
            if intrinsics.vertical_degrees is not None
            else None
        )
        dirs_sensor = _static_profile_dirs_permuted(
            float(intrinsics.fov_up), float(intrinsics.fov_down),
            int(intrinsics.vertical_res), int(intrinsics.horizontal_res),
            vdeg, perm.tobytes(),
        )
        pre_permuted = True
    return _scan_core(
        asset,
        poses,
        dirs_sensor,
        keep,
        noise_key,
        perm_d,
        inv_perm_d,
        float(intrinsics.max_range),
        backend,
        sigma,
        outputs,
        # Grid profiles have no dropout: keep is all-ones by construction
        # (sensor_dirs_batch), so its gather+AND compile away statically.
        has_keep=isinstance(intrinsics, DualAxisLidarIntrinsics),
        pre_permuted=pre_permuted,
    )
