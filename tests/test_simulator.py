"""End-to-end simulator tests on a synthetic box room."""

import json

import numpy as np
import pytest

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.io.ply import read_labeled_ply, read_point_cloud
from ipcgen_tpu.models import DualAxisLidarIntrinsics, Indoor8LineLidarIntrinsics
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.sim.engine import RaycastEngineCPU
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.sim.simulator import S3DISSimulator
from ipcgen_tpu.trajectory import PathType, Waypoint
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


@pytest.fixture
def room_ply(tmp_path, box_room):
    path = tmp_path / "mesh_dense.ply"
    box_room.save(path)
    return path


def _small_8line():
    return Indoor8LineLidarIntrinsics(
        vertical_res=4,
        horizontal_res=90,
        vertical_degrees=[10, 0, -10, -20],
        max_range=20.0,
    )


def test_scan_waypoints_box_room(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    intr = _small_8line()
    wps = [Waypoint(2.0, 1.5, 1.0, 0.0), Waypoint(1.0, 1.0, 1.0, np.pi / 4)]
    poses = waypoints_to_pose_batch(wps)
    batch = scan_waypoints(asset, intr, poses, backend="xla")
    assert batch.points.shape == (2, 360, 3)
    mask = np.asarray(batch.mask)
    # Every ray inside a closed box must hit a wall within range
    assert mask.all()
    pts = np.asarray(batch.points)
    # Hits lie on the room's surface planes
    on_surface = (
        np.isclose(pts[..., 0], 0.0, atol=1e-3)
        | np.isclose(pts[..., 0], 4.0, atol=1e-3)
        | np.isclose(pts[..., 1], 0.0, atol=1e-3)
        | np.isclose(pts[..., 1], 3.0, atol=1e-3)
        | np.isclose(pts[..., 2], 0.0, atol=1e-3)
        | np.isclose(pts[..., 2], 2.5, atol=1e-3)
    )
    assert on_surface.all()
    # Incident angle formula parity: degrees(arccos(|dz|))
    ang = np.asarray(batch.incident_angles)
    assert ang.min() >= 0 and ang.max() <= 90


def test_scan_matches_engine_loop(box_room):
    """Fused batch path == per-waypoint engine path (no noise profile)."""
    from ipcgen_tpu.models import create_lidar

    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    intr = _small_8line()
    wp = Waypoint(2.0, 1.5, 1.0, 0.3)
    batch = scan_waypoints(asset, intr, waypoints_to_pose_batch([wp]), backend="xla")
    pts_fused, ang_fused = batch.frame_arrays(0)

    engine = RaycastEngineCPU()
    lidar = create_lidar(intr, wp.to_pose_matrix())
    pts_loop, ang_loop = engine.lidar_intersect_mesh(lidar, box_room)

    assert len(pts_fused) == len(pts_loop)
    np.testing.assert_allclose(pts_fused, pts_loop, atol=1e-4)
    np.testing.assert_allclose(ang_fused, ang_loop, atol=1e-3)


def test_dual_axis_scan_dropout(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    intr.point_rate = 32000  # keep the CPU test fast
    intr.scan_duration = 0.1
    import jax

    wps = [Waypoint(2.0, 1.5, 1.0, 0.0)]
    batch = scan_waypoints(
        asset, intr, waypoints_to_pose_batch(wps), key=jax.random.PRNGKey(0),
        backend="xla",
    )
    mask = np.asarray(batch.mask[0])
    rate = 1.0 - mask.mean()
    # Inside a closed room every kept ray hits -> miss rate == dropout rate
    assert abs(rate - intr.dropout_probability) < 0.01


def test_simulator_manual_end_to_end(room_ply, tmp_path):
    config = {
        "raycast_engine": {"use_gpu": False, "backend": "xla"},
        "trajectory": {"robot_height": 1.0},
        "seed": 0,
    }
    sim = S3DISSimulator(config)
    sim.lidar_config = _small_8line()  # shrink for test speed
    sim.load_scene(str(room_ply), "box_room")
    wps, quality = sim.generate_trajectory(
        (1.0, 1.5, 1.0), (3.0, 1.5, 1.0), PathType.STRAIGHT, num_waypoints=5
    )
    assert quality["path_length"] > 0
    sim_scene = sim.run_simulation(wps)
    assert sim_scene.get_total_frames() == 5
    assert sim_scene.get_total_points() == 5 * 360  # closed room: all hits
    stats = sim_scene.statistics
    assert stats.frames_per_second > 0

    out = tmp_path / "out"
    sim.save_results(sim_scene, out, wps, save_visualizations=False)
    # Reference-format artifacts
    stats_txt = (out / "simulation_statistics.txt").read_text()
    assert stats_txt.startswith("Simulation Statistics\n")
    assert "Total frames: 5" in stats_txt
    assert (out / "simulation_summary.txt").exists()
    pts, colors, _ = read_point_cloud(out / "combined_pointcloud.ply")
    assert len(pts) == 5 * 360
    lp, lc, sem, ins = read_labeled_ply(out / "combined_pointcloud_with_label.ply")
    assert len(lp) == 5 * 360
    # No S3DIS annotations -> default gray colors + zero labels
    assert np.all(sem == 0) and np.all(ins == 0)
    assert np.all(lc == 127)


def test_simulator_auto_end_to_end(room_ply, tmp_path):
    config = {
        "raycast_engine": {"use_gpu": False, "backend": "xla"},
        "trajectory": {"robot_height": 1.0},
        "seed": 0,
    }
    sim = S3DISSimulator(config)
    sim.lidar_config = _small_8line()
    out = tmp_path / "auto_out"
    sim_scene = sim.run_auto_simulation(str(room_ply), num_waypoints=4, output_dir=out)
    # save_visualizations defaults True on the auto path: PNGs must exist
    assert (out / "visualizations").exists()
    assert sim_scene.get_total_frames() >= 20  # dense interpolation floor
    analysis = json.loads((out / "trajectory_analysis.json").read_text())
    assert analysis["total_candidates"] > 0
    assert (out / "simulation_statistics.txt").exists()
    assert (out / "visualizations").exists()


def test_engine_caches_asset(box_room):
    engine = RaycastEngineCPU()
    a1 = engine.asset_for_mesh(box_room)
    a2 = engine.asset_for_mesh(box_room)
    assert a1 is a2
    engine.clear_cache()
    assert engine.asset_for_mesh(box_room) is not a1


def test_rays_intersect_mesh_contract(box_room):
    engine = RaycastEngineCPU()
    rays = np.array(
        [[2.0, 1.5, 1.0, 1.0, 0.0, 0.0], [2.0, 1.5, 1.0, 0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    pts = engine.rays_intersect_mesh(rays, box_room)
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[0], [4.0, 1.5, 1.0], atol=1e-4)
    np.testing.assert_allclose(pts[1], [2.0, 1.5, 2.5], atol=1e-4)
    with pytest.raises(ValueError):
        engine.rays_intersect_mesh(np.zeros((3, 5), np.float32), box_room)
    with pytest.raises(TypeError):
        engine.rays_intersect_mesh([[0] * 6], box_room)


def test_simulator_multichip_scan(room_ply):
    """multichip=True shards the scan over the virtual 8-device mesh."""
    config = {
        "raycast_engine": {"use_gpu": False, "backend": "xla", "multichip": True},
        "trajectory": {"robot_height": 1.0},
        "seed": 0,
    }
    sim = S3DISSimulator(config)
    sim.lidar_config = _small_8line()
    sim.load_scene(str(room_ply), "box_room")
    wps, _ = sim.generate_trajectory(
        (1.0, 1.5, 1.0), (3.0, 1.5, 1.0), PathType.STRAIGHT, num_waypoints=4
    )
    sharded_scene = sim.run_simulation(wps)

    config2 = dict(config, raycast_engine={"use_gpu": False, "backend": "xla"})
    sim2 = S3DISSimulator(config2)
    sim2.lidar_config = _small_8line()
    sim2.load_scene(str(room_ply), "box_room")
    single_scene = sim2.run_simulation(wps)

    assert sharded_scene.get_total_points() == single_scene.get_total_points()
    for fa, fb in zip(sharded_scene.frames, single_scene.frames):
        np.testing.assert_allclose(fa.points, fb.points, atol=1e-4)


def test_range_noise_statistics(box_room):
    """apply_range_noise perturbs hit distances with the profile's sigma
    (reference declares sigma=0.02 m but never applies it —
    lidar/lidar_intrinsics.py:236; resolved behind a flag, SURVEY.md §7)."""
    import jax

    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    intr = _small_8line()
    wp = Waypoint(x=2.0, y=1.5, z=1.2, yaw=0.3)
    poses = waypoints_to_pose_batch([wp])
    key = jax.random.PRNGKey(7)

    clean = scan_waypoints(asset, intr, poses, key=key, backend="xla")
    noisy = scan_waypoints(
        asset, intr, poses, key=key, backend="xla", apply_range_noise=True
    )
    m = np.asarray(clean.mask[0]) & np.asarray(noisy.mask[0])
    dt = np.asarray(noisy.t[0])[m] - np.asarray(clean.t[0])[m]
    assert m.sum() > 100
    # Hit-distance spread matches the declared sigma.
    assert abs(float(np.std(dt)) - intr.range_noise_std) < 0.3 * intr.range_noise_std
    assert abs(float(np.mean(dt))) < 0.01
    # Points move along the ray by the same offset.
    dp = np.linalg.norm(
        np.asarray(noisy.points[0])[m] - np.asarray(clean.points[0])[m], axis=1
    )
    np.testing.assert_allclose(dp, np.abs(dt), atol=1e-4)
    # Default stays reference-parity: off.
    clean2 = scan_waypoints(asset, intr, poses, key=key, backend="xla")
    np.testing.assert_array_equal(np.asarray(clean2.t), np.asarray(clean.t))


def test_compat_lidar_rng_deterministic():
    """Two constructions with the same key produce identical rays (explicit
    PRNG stance, SURVEY.md §7 — no global numpy RNG in the compat layer)."""
    import jax

    from ipcgen_tpu.models import create_lidar

    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    pose = np.eye(4)
    a = create_lidar(intr, pose, rng_key=jax.random.PRNGKey(5))
    b = create_lidar(intr, pose, rng_key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(
        a.get_multi_line_rays(2000), b.get_multi_line_rays(2000)
    )
    ts = intr.generate_time_sequence(0.001)
    np.testing.assert_array_equal(a.get_rays_sequence(ts), b.get_rays_sequence(ts))
    # Successive calls on ONE instance draw FRESH noise (frames must not
    # share dropout holes or angular bias — code-review r2 finding): the
    # deterministic sequence advances per call.
    r1 = a.get_rays_sequence(ts)
    r2 = a.get_rays_sequence(ts)
    assert not np.array_equal(r1, r2)
    # ...and the whole call SEQUENCE replays identically across instances.
    np.testing.assert_array_equal(r1, b.get_rays_sequence(ts))
    np.testing.assert_array_equal(r2, b.get_rays_sequence(ts))
    # Default construction is deterministic too.
    c = create_lidar(intr, pose)
    d = create_lidar(intr, pose)
    np.testing.assert_array_equal(
        c.get_multi_line_rays(2000), d.get_multi_line_rays(2000)
    )


def test_sensor_range_stats_exposed(room_ply, tmp_path):
    """ScanQuality dual-reports true sensor ranges alongside the preserved
    world-norm reference formula (s3dis_simulator.py:276-284)."""
    config = {
        "room_mesh_path": str(room_ply),
        "output_dir": str(tmp_path / "out"),
        "lidar": {"type": "standard_8line"},
    }
    sim = S3DISSimulator(config)
    sim.load_scene(room_ply)
    wps = [Waypoint(x=2.0, y=1.5, z=1.0, yaw=0.0)]
    scene = sim.run_simulation(wps)
    q = scene.frames[0].scan_quality
    # World-norm stats preserved; sensor stats present and physically sane:
    # inside a box room the mean hit distance is bounded by the diagonal.
    assert q.sensor_range_mean is not None and 0.1 < q.sensor_range_mean < 25.0
    assert q.sensor_range_std is not None and q.sensor_range_std >= 0.0
    assert q.range_mean > 0  # world-norm quirk preserved
    d = q.to_dict()
    assert "sensor_range_mean" in d and "sensor_range_std" in d


def test_points_and_mask_quantized_matches_exact(box_room):
    """The uint16-quantized D2H path dequantizes within span/65535 per axis
    (~0.2 mm indoors) — far below the 5 mm hardware parity contract."""
    asset = build_scene_asset(box_room.vertices, box_room.triangles,
                              block_size=8)
    poses = waypoints_to_pose_batch(
        [Waypoint(2.0, 1.5, 1.0, 0.0), Waypoint(1.0, 1.0, 1.0, np.pi / 4)]
    )
    batch = scan_waypoints(asset, _small_8line(), poses, backend="xla")
    p0, m0 = batch.points_and_mask()
    p1, m1 = batch.points_and_mask(quantized=True)
    assert (m0 == m1).all()
    assert np.abs(p1[m0] - p0[m0]).max() < 5e-4
