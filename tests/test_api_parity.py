"""API-parity coverage: containers round trips, noise models, CLI smoke tests."""

import json

import numpy as np
import pytest

from ipcgen_tpu.containers import (
    IncidentAngles,
    LidarPose,
    RobotPose,
    RoomBounds,
    S3DISFrame,
    S3DISSimFrame,
    ScanQuality,
    SemanticInfo,
)
from ipcgen_tpu.models import DualAxisLidarIntrinsics, Indoor8LineLidarIntrinsics


def test_room_bounds_round_trip():
    rb = RoomBounds(0, 4, 0, 3, 0, 2.5)
    rb2 = RoomBounds.from_dict(rb.to_dict())
    assert rb2.get_volume() == rb.get_volume() == 30.0
    np.testing.assert_allclose(rb.get_center(), [2, 1.5, 1.25])
    assert rb.is_point_inside(np.array([1, 1, 1]))
    assert not rb.is_point_inside(np.array([5, 1, 1]))
    rb3 = RoomBounds.from_points(np.array([[0, 0, 0], [4, 3, 2.5]]))
    assert rb3.to_dict() == rb.to_dict()


def test_semantic_info():
    si = SemanticInfo(room_type="office")
    si.add_furniture("table_1", np.array([1, 2, 0.5]), np.array([1, 1, 1]), "table")
    assert si.get_furniture_count() == 1
    d = si.to_dict()
    assert d["room_type"] == "office"
    assert d["furniture_info"]["table_1"]["category"] == "table"


def test_robot_frame_round_trip():
    yaw = 0.7
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    rp = RobotPose(position=np.array([1.0, 2.0, 0.5]), orientation=rot, timestamp=3.0)
    assert np.isclose(rp.get_yaw(), yaw)
    assert np.isclose(rp.get_pitch(), 0.0)
    assert np.isclose(rp.get_roll(), 0.0)
    lp = LidarPose(position=np.array([0, 0, 0.3]), orientation=np.eye(3))
    frame = S3DISFrame(0, rp, {"lidar_0": lp})
    g = frame.get_global_lidar_pose()
    np.testing.assert_allclose(g[:3, 3], [1.0, 2.0, 0.8], atol=1e-12)
    frame2 = S3DISFrame.from_dict(frame.to_dict())
    np.testing.assert_allclose(
        frame2.get_global_lidar_pose(), g, atol=1e-12
    )
    assert frame2.get_timestamp() == 3.0


def test_sim_frame_filters():
    pts = np.array([[1, 0, 0], [0, 2, 0], [0, 0, 5]], dtype=float)
    ang = np.array([10.0, 40.0, 80.0])
    q = ScanQuality(0.9, 3, 43.3, 28.7, 1.0, 2.6, 1.7)
    frame = S3DISSimFrame(0, pts, ang, q)
    by_angle = frame.filter_points_by_angle(0, 50)
    assert by_angle.get_num_points() == 2
    assert np.isclose(by_angle.scan_quality.coverage_ratio, 0.9 * 2 / 3)
    by_range = frame.filter_points_by_range(0, 3)
    assert by_range.get_num_points() == 2
    frame2 = S3DISSimFrame.from_dict(frame.to_dict())
    np.testing.assert_allclose(frame2.points, pts)
    with pytest.raises(ValueError):
        S3DISSimFrame(0, pts, ang[:2], q)


def test_incident_angles_container():
    ia = IncidentAngles(angles=np.array([10.0, 20.0, 30.0]))
    assert np.isclose(ia.get_mean_angle(), 20.0)
    hist, bins = ia.get_angle_distribution(num_bins=5)
    assert hist.sum() == 3
    ia2 = IncidentAngles.from_dict(ia.to_dict())
    np.testing.assert_allclose(ia2.angles, ia.angles)


def test_8line_add_noise(rng):
    intr = Indoor8LineLidarIntrinsics.create_standard_8line()
    n = 5000
    points = rng.normal(size=(n, 3))
    ranges = np.full(n, 5.0)
    angles = np.zeros(n)
    intensities = np.full(n, 0.5)
    gen = np.random.default_rng(0)
    pn, rn, an, inn = intr.add_noise(points, ranges, angles, intensities, rng=gen)
    # Dropout ~5%
    assert abs(len(pn) / n - (1 - intr.dropout_probability)) < 0.02
    # Range noise sigma ~0.02
    assert abs(np.std(rn) - intr.range_noise_std) < 0.005
    assert inn.min() >= 0 and inn.max() <= 1


def test_dual_axis_angles_at_time():
    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    intr.angle_noise_std = 0.0
    phi, theta = intr.calculate_angles_at_time(0.25, line_idx=0)
    # phi = omega * t mod 2pi = pi/2
    assert np.isclose(phi, np.pi / 2)
    # theta = base(15deg) + A*sin(t) clipped to [−20°, 15°] -> clipped at 15°
    assert np.isclose(theta, np.deg2rad(15.0))
    _, theta_lo = intr.calculate_angles_at_time(0.0, line_idx=31)
    assert np.isclose(theta_lo, np.deg2rad(-20.0), atol=1e-6)
    assert intr.get_range_limits() == (0.5, 25.0)
    seq = intr.generate_time_sequence(0.01)
    assert len(seq) == int(intr.point_rate * 0.01)


def test_engine_tpu_falls_back_on_cpu(box_room):
    from ipcgen_tpu.sim.engine import RaycastEngineTPU

    engine = RaycastEngineTPU()  # on the CPU test platform -> XLA path
    rays = np.array([[2.0, 1.5, 1.0, 1.0, 0.0, 0.0]], dtype=np.float32)
    pts = engine.rays_intersect_mesh(rays, box_room)
    np.testing.assert_allclose(pts[0], [4.0, 1.5, 1.0], atol=1e-4)


def test_eval_cli_main(tmp_path, rng, monkeypatch):
    from ipcgen_tpu.eval.evaluate import main as eval_main
    from ipcgen_tpu.io.ply import write_point_cloud

    sim = rng.uniform(0, 1, (2000, 3)) * [4, 3, 2.5]
    sim_ply = tmp_path / "sim.ply"
    write_point_cloud(sim_ply, sim)
    data_root = tmp_path / "scenes"
    d = data_root / "roomZ"
    d.mkdir(parents=True)
    write_point_cloud(d / "roomZ.ply", rng.uniform(0, 1, (1800, 3)) * [4.2, 3, 2.4])
    result = eval_main(
        [
            "--s3dis_ply", str(sim_ply),
            "--data_root", str(data_root),
            "--output_dir", str(tmp_path / "eval_out"),
            "--max_points", "1500",
        ]
    )
    assert result is not None
    report = (tmp_path / "eval_out" / "single_scene_evaluation.txt").read_text()
    assert "MMD:" in report and "Density ratio:" in report


def test_bbox_cli_mains(tmp_path, rng, monkeypatch):
    from ipcgen_tpu.bbox.cli import main_lidar_net, main_s3dis
    from ipcgen_tpu.io.ply import write_labeled_ply

    # S3DIS flavor
    ann = tmp_path / "s3dis" / "Area_1" / "office_1" / "Annotations"
    ann.mkdir(parents=True)
    chair = rng.uniform(0, 0.6, (120, 3))
    np.savetxt(ann / "chair_1.txt", np.hstack([chair, np.full((120, 3), 99)]))
    res = main_s3dis(
        ["--data_root", str(tmp_path / "s3dis"), "--area_name", "Area_1",
         "--room_name", "office_1",
         "--results_root", str(tmp_path / "simresults")]
    )
    assert res and len(res) == 1

    # LiDAR-Net flavor
    pts = rng.uniform(0, 0.5, (150, 3)).astype(np.float32)
    ply = tmp_path / "SceneQ.ply"
    write_labeled_ply(
        ply, pts, np.full((150, 3), 127, np.uint8),
        np.full(150, 19, np.uint16), np.full(150, 1, np.uint16),
    )
    res2 = main_lidar_net(
        ["--ply", str(ply), "--results_root", str(tmp_path / "simresults2")]
    )
    assert res2 and res2[0]["object_name"] == "chair"


def test_preprocess_cli_main(tmp_path, rng):
    from ipcgen_tpu.preprocess.cli import main as pre_main

    room = tmp_path / "data" / "Area_2" / "lobby_1"
    room.mkdir(parents=True)
    pts = rng.uniform(0, 1, (500, 3)) * [4, 3, 2.5]
    np.savetxt(room / "lobby_1.txt", np.hstack([pts, rng.integers(0, 255, (500, 3))]))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
data:
  data_root: "{tmp_path / 'data'}"
  output_root: "{tmp_path / 'out'}"
  area_name: "Area_2"
preprocessing:
  normal_search_radius: 0.5
sparsity_experiments:
  - name: "dense"
    keep_ratio: 1.0
    occlusion: false
"""
    )
    results = pre_main(["--config", str(cfg)])
    assert results["lobby_1"] is not None
    assert (tmp_path / "out" / "preprocessed" /
            "Area_2_lobby_1_preprocessed.pkl").exists()
