"""Bbox generation + evaluation pipeline tests."""

import json

import numpy as np
import pytest

from ipcgen_tpu.bbox.detection import (
    CLASS_NAME_MAPPING,
    LIDAR_NET_SEMANTIC_MAPPING,
    LiDARNetBBoxVisualizer,
    S3DISBBoxVisualizer,
    calculate_bbox,
)
from ipcgen_tpu.eval.evaluate import (
    analyze_point_cloud,
    check_volume_compatibility,
    evaluate_single_scene,
    find_best_match,
    find_lidar_net_scenes,
    normalize_coordinates,
)
from ipcgen_tpu.io.ply import write_labeled_ply, write_point_cloud


def test_calculate_bbox():
    pts = np.array([[0, 0, 0], [2, 1, 0.5], [1, 0.5, 0.25]])
    bbox = calculate_bbox(pts)
    np.testing.assert_allclose(bbox["center"], [1, 0.5, 0.25])
    np.testing.assert_allclose(bbox["size"], [2, 1, 0.5])
    assert np.isclose(bbox["volume"], 1.0)
    assert np.isclose(bbox["aspect_ratio"], 4.0)
    assert bbox["point_count"] == 3
    assert calculate_bbox(np.zeros((0, 3))) is None


def test_quality_gates():
    vis = S3DISBBoxVisualizer()
    pts = np.random.default_rng(0).uniform(0, 1, (50, 3))
    bbox = calculate_bbox(pts)
    ok, _ = vis.evaluate_bbox_quality(bbox, "chair")
    assert ok
    ok, reason = vis.evaluate_bbox_quality(bbox, "door")
    assert not ok and "not in detection set" in reason
    tiny = calculate_bbox(pts * 0.01)
    ok, reason = vis.evaluate_bbox_quality(tiny, "chair")
    assert not ok and "Volume" in reason
    flat = pts.copy()
    flat[:, 2] *= 0.005
    flat[:, 1] *= 0.8
    bad = calculate_bbox(flat * np.array([20, 1, 1]))
    ok, reason = vis.evaluate_bbox_quality(bad, "chair")
    assert not ok


def test_s3dis_room_bboxes_to_json(tmp_path, rng):
    # Synthetic S3DIS room: Area_1/office_1/Annotations with two chairs
    ann = tmp_path / "Area_1" / "office_1" / "Annotations"
    ann.mkdir(parents=True)
    chair1 = rng.uniform(0, 0.6, (120, 3)) + [1, 1, 0]
    chair2 = rng.uniform(0, 0.6, (150, 3)) + [3, 2, 0]
    board = rng.uniform(0, 1, (80, 3)) * [1.2, 0.15, 0.9] + [0, 0, 1]
    door = rng.uniform(0, 1, (60, 3))
    for name, pts in [
        ("chair_1", chair1), ("chair_2", chair2), ("board_1", board), ("door_1", door)
    ]:
        data = np.hstack([pts, np.full((len(pts), 3), 128.0)])
        np.savetxt(ann / f"{name}.txt", data)

    vis = S3DISBBoxVisualizer(results_root=str(tmp_path / "simulation_results"))
    bboxes = vis.visualize_room_bboxes(tmp_path / "Area_1" / "office_1")
    assert bboxes is not None
    names = sorted(b["object_name"] for b in bboxes)
    assert names == ["board", "chair", "chair"]

    json_path = (
        tmp_path
        / "simulation_results"
        / "Area_1_office_1"
        / "Area_1_office_1_detection_annotations.json"
    )
    payload = json.loads(json_path.read_text())
    assert payload["metadata"]["framework"] == "Group-Free-3D"
    assert payload["metadata"]["total_objects"] == 3
    assert payload["metadata"]["class_mapping"]["bookcase"] == "bookshelf"
    ann0 = payload["annotations"][0]
    for key in ("instance_id", "class_name", "original_class_name", "bbox_3d",
                "point_count", "volume", "aspect_ratio", "confidence",
                "bbox_format", "coordinate_system", "units", "framework"):
        assert key in ann0
    assert ann0["bbox_3d"]["rotation"] == [0, 0, 0]
    # board remaps to picture (Group-Free-3D)
    board_ann = [a for a in payload["annotations"]
                 if a["original_class_name"] == "board"][0]
    assert board_ann["class_name"] == "picture"


def test_lidar_net_bboxes_from_labeled_ply(tmp_path, rng):
    # Build a labeled cloud: one chair (sem 19) with 2 instances + clutter
    chair_a = rng.uniform(0, 0.5, (200, 3)) + [0, 0, 0]
    chair_b = rng.uniform(0, 0.5, (180, 3)) + [3, 3, 0]
    clutter = rng.uniform(0, 5, (300, 3))
    pts = np.vstack([chair_a, chair_b, clutter]).astype(np.float32)
    sem = np.concatenate(
        [np.full(200, 19), np.full(180, 19), np.zeros(300)]
    ).astype(np.uint16)
    ins = np.concatenate(
        [np.full(200, 1), np.full(180, 2), np.zeros(300)]
    ).astype(np.uint16)
    colors = np.full((len(pts), 3), 127, np.uint8)
    ply = tmp_path / "TestScene.ply"
    write_labeled_ply(ply, pts, colors, sem, ins)

    vis = LiDARNetBBoxVisualizer(results_root=str(tmp_path / "simulation_results"))
    bboxes = vis.process_room_instances(ply)
    assert bboxes is not None
    chairs = [b for b in bboxes if b["object_name"] == "chair"]
    assert len(chairs) == 2
    assert {b["instance_id"] for b in chairs} == {1, 2}
    assert all(b["semantic_id"] == LIDAR_NET_SEMANTIC_MAPPING["chair"] for b in chairs)
    json_path = (
        tmp_path / "simulation_results" / "TestScene"
        / "TestScene_detection_annotations.json"
    )
    assert json_path.exists()
    assert (tmp_path / "simulation_results" / "TestScene" / "TestScene.ply").exists()


def test_bbox_plots(tmp_path, rng):
    vis = S3DISBBoxVisualizer()
    pts = rng.uniform(0, 1, (60, 3))
    bbox = calculate_bbox(pts)
    bbox["object_name"] = "chair"
    p3 = vis.plot_bboxes_3d([bbox], "test", tmp_path / "b3.png")
    p2 = vis.plot_bboxes_2d([bbox], "XY", "test", tmp_path / "b2.png")
    assert p3.exists() and p2.exists()


# ---------------------------------------------------------------------------
# Evaluation pipeline
# ---------------------------------------------------------------------------

def test_normalize_coordinates(rng):
    pts = rng.uniform(5, 10, (100, 3))
    centered = normalize_coordinates(pts, "zero_center")
    lo, hi = centered.min(axis=0), centered.max(axis=0)
    np.testing.assert_allclose(lo + hi, 0.0, atol=1e-9)
    m = normalize_coordinates(pts, "min")
    np.testing.assert_allclose(m.min(axis=0), 0.0, atol=1e-12)


def test_volume_compatibility():
    ok, diff = check_volume_compatibility(10.0, 12.0)
    assert ok and np.isclose(diff, 2 / 12)
    ok, _ = check_volume_compatibility(10.0, 20.0)
    assert not ok


def test_evaluation_end_to_end(tmp_path, rng):
    # Simulated S3DIS cloud + compatible/incompatible LiDAR-Net scenes
    sim = rng.uniform(0, 1, (3000, 3)) * [4, 3, 2.5]
    sim_ply = tmp_path / "sim.ply"
    write_point_cloud(sim_ply, sim)

    data_root = tmp_path / "lidar_net"
    for name, scale in [("roomA", [4.1, 3, 2.4]), ("huge", [40, 30, 25])]:
        d = data_root / name
        d.mkdir(parents=True)
        write_point_cloud(d / f"{name}.ply", rng.uniform(0, 1, (2500, 3)) * scale)
    # S3DIS area dirs must be skipped
    (data_root / "Area_1_office").mkdir()

    scenes = find_lidar_net_scenes(str(data_root))
    assert [s["name"] for s in scenes] == ["huge", "roomA"]

    result = find_best_match(str(sim_ply), str(data_root), max_points=2000)
    assert result is not None
    assert result["lidar_net_scene"] == "roomA"  # 'huge' fails the volume gate
    for key in ("mmd", "cd", "hd", "density_ratio", "volume_diff"):
        assert key in result
    assert result["mmd"] >= 0
    assert result["cd"] > 0

    # Direct pair evaluation on incompatible volumes returns None
    assert (
        evaluate_single_scene(
            str(sim_ply), str(data_root / "huge" / "huge.ply"), max_points=2000
        )
        is None
    )


def test_evaluation_report_format(tmp_path, rng):
    from ipcgen_tpu.eval.evaluate import write_evaluation_report

    result = {
        "s3dis_scene": "sim.ply", "lidar_net_scene": "roomA",
        "lidar_net_ply": "x.ply", "mmd": 0.1, "cd": 0.2, "hd": 0.3,
        "density_ratio": 1.1, "volume_diff": 0.05, "s3dis_points": 100,
        "lidar_net_points": 200, "s3dis_density": 10.0,
        "lidar_net_density": 9.0, "s3dis_volume": 30.0, "lidar_net_volume": 28.0,
    }
    out = tmp_path / "single_scene_evaluation.txt"
    write_evaluation_report(result, str(out), elapsed=1.0)
    text = out.read_text()
    assert "MMD: 0.1000" in text
    assert "CD: 0.2000" in text
    assert "HD: 0.3000" in text
    assert "Density ratio: 1.1000" in text
