"""Parity between scan output modes and the simulator's host-side derivations.

``outputs="minimal"`` is the product hot path since round 4 (the simulator
reads only points/t/mask and derives angles/ranges on host); ``"full"`` is
the API-parity surface mirroring the reference's device-side outputs
(raycast_engine/raycast_engine_cpu.py:99-109).  These tests pin the two
paths together so they cannot drift silently (VERDICT r4 item 3).
"""

import numpy as np
import pytest

import jax

from ipcgen_tpu.models import (
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
)
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.trajectory import Waypoint
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


def _asset(box_room):
    return build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)


def _poses():
    wps = [Waypoint(2.0, 1.5, 1.0, 0.0), Waypoint(1.2, 0.9, 1.1, 0.7)]
    return wps, waypoints_to_pose_batch(wps)


@pytest.mark.parametrize("noise", [False, True])
def test_minimal_equals_full_bit_identical(box_room, noise):
    """minimal's points/t/mask are BIT-identical to full's (same key).

    Covers both the noise-free path and the range-noise path (the noise
    stream is drawn identically in both modes); the dual-axis profile also
    exercises the dropout keep-mask plumbing.
    """
    asset = _asset(box_room)
    _, poses = _poses()
    for intr in (
        Indoor8LineLidarIntrinsics(
            vertical_res=4,
            horizontal_res=90,
            vertical_degrees=[10, 0, -10, -20],
            max_range=20.0,
        ),
        DualAxisLidarIntrinsics(point_rate=24000, scan_duration=0.05),
    ):
        key = jax.random.PRNGKey(7)
        full = scan_waypoints(
            asset, intr, poses, key=key, backend="xla",
            apply_range_noise=noise, outputs="full",
        )
        minimal = scan_waypoints(
            asset, intr, poses, key=key, backend="xla",
            apply_range_noise=noise, outputs="minimal",
        )
        assert np.array_equal(np.asarray(full.mask), np.asarray(minimal.mask))
        assert np.array_equal(np.asarray(full.t), np.asarray(minimal.t))
        assert np.array_equal(
            np.asarray(full.points), np.asarray(minimal.points)
        )


@pytest.mark.parametrize("noise", [False, True])
def test_unordered_is_a_permutation_of_minimal(box_room, noise):
    """"unordered" (the sim driver's path since r5) returns the same per-
    waypoint HIT SETS as "minimal" — identical masked (point, t) multisets,
    just in kernel patch order instead of beam order."""
    asset = _asset(box_room)
    _, poses = _poses()
    for intr in (
        Indoor8LineLidarIntrinsics(
            vertical_res=4,
            horizontal_res=90,
            vertical_degrees=[10, 0, -10, -20],
            max_range=20.0,
        ),
        DualAxisLidarIntrinsics(point_rate=24000, scan_duration=0.05),
    ):
        key = jax.random.PRNGKey(11)
        mi = scan_waypoints(
            asset, intr, poses, key=key, backend="xla",
            apply_range_noise=noise, outputs="minimal",
        )
        un = scan_waypoints(
            asset, intr, poses, key=key, backend="xla",
            apply_range_noise=noise, outputs="unordered",
        )
        m_mask = np.asarray(mi.mask)
        u_mask = np.asarray(un.mask)
        assert m_mask.sum(axis=1).tolist() == u_mask.sum(axis=1).tolist()
        for w in range(mi.num_waypoints):
            a = np.c_[np.asarray(mi.points[w])[m_mask[w]],
                      np.asarray(mi.t[w])[m_mask[w]]]
            b = np.c_[np.asarray(un.points[w])[u_mask[w]],
                      np.asarray(un.t[w])[u_mask[w]]]
            a = a[np.lexsort(a.T)]
            b = b[np.lexsort(b.T)]
            # atol, not exact: the two modes are different compiled
            # programs, and XLA's FMA contraction choices produce 1-ulp
            # differences on the noise-add path (measured: 7/720 values
            # off by 1 ulp) — distinct rays differ by >= mm, so sorted
            # row pairing is unaffected.
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_simulator_host_derivations_match_full_device_outputs(
    box_room, tmp_path
):
    """collect_scan's host-derived incident angles / sensor ranges equal the
    device-computed ``incident_angles`` / ``t`` of ``outputs="full"``.

    The formula being protected is the reference's
    raycast_engine_cpu.py:99-109 (elevation-style incidence from the unit
    ray direction) re-derived from (point - origin) on host
    (sim/simulator.py collect_scan).
    """
    from ipcgen_tpu.sim.simulator import S3DISSimulator

    mesh_path = tmp_path / "mesh_dense.ply"
    box_room.save(mesh_path)

    seed = 3
    sim = S3DISSimulator(
        {"raycast_engine": {"use_gpu": True}, "seed": seed},
        use_dense_lidar=False,
    )
    sim.load_scene(str(mesh_path), "box")
    wps, poses = _poses()

    # The simulator's scan key is the second half of split(PRNGKey(seed))
    # (dispatch_scan); replicate it to run the full-output reference scan.
    _, scan_key = jax.random.split(jax.random.PRNGKey(seed))
    full = scan_waypoints(
        sim.scene_asset, sim.lidar_config, poses, key=scan_key,
        backend="auto", outputs="full",
    )

    import time

    batch = sim.dispatch_scan(wps)  # product path: outputs="minimal"
    scene = sim.collect_scan(batch, wps, time.time())

    f_mask = np.asarray(full.mask)
    f_ang = np.asarray(full.incident_angles)
    f_t = np.asarray(full.t)
    assert len(scene.frames) == len(wps)
    for i, frame in enumerate(scene.frames):
        m = f_mask[i]
        assert frame.get_num_points() == int(m.sum())
        np.testing.assert_allclose(
            frame.incident_angles, f_ang[i][m], atol=5e-3
        )
        origin = wps[i].to_pose_matrix()[:3, 3]
        sensor_ranges = np.linalg.norm(frame.points - origin, axis=1)
        np.testing.assert_allclose(sensor_ranges, f_t[i][m], atol=1e-4)
        # The quality stats the simulator publishes come from the same
        # host derivation — cross-check the aggregates too.
        q = frame.scan_quality
        np.testing.assert_allclose(
            q.sensor_range_mean, float(f_t[i][m].mean()), atol=1e-4
        )
        np.testing.assert_allclose(
            q.incident_angle_mean, float(f_ang[i][m].mean()), atol=5e-3
        )
