"""Visualization suite smoke tests (figures render and files appear)."""

import numpy as np

from ipcgen_tpu.containers import S3DISSimFrame, S3DISSimScene, ScanQuality
from ipcgen_tpu.trajectory import Waypoint
from ipcgen_tpu.viz import (
    MeshVisualizer,
    S3DISVisualizer,
    ScanResultVisualizer,
    TrajectoryVisualizer,
    create_visualization_summary,
    visualize_normal_statistics,
    visualize_normals,
    visualize_normals_high_quality,
)


def _sim_scene(rng, n_frames=3, n_points=200):
    scene = S3DISSimScene("viz_room")
    for i in range(n_frames):
        pts = rng.uniform(0, 3, (n_points, 3))
        ang = rng.uniform(0, 90, n_points)
        q = ScanQuality(0.8, n_points, float(ang.mean()), float(ang.std()),
                        10.0, 2.0, 0.5)
        scene.append_frame(S3DISSimFrame(i, pts, ang, q))
    scene.compute_statistics(1.0)
    return scene


def _bounds():
    return {"x_min": 0, "x_max": 4, "y_min": 0, "y_max": 3,
            "z_min": 0, "z_max": 2.5}


def test_trajectory_visualizer(tmp_path, rng):
    viz = TrajectoryVisualizer(tmp_path)
    wps = [Waypoint(0.5 + 0.1 * i, 1.0 + 0.05 * i, 1.0, 0.1 * i, timestamp=i)
           for i in range(15)]
    assert viz.visualize_trajectory_2d(wps, _bounds()).exists()
    assert viz.visualize_trajectory_3d(wps, _bounds()).exists()
    assert viz.visualize_trajectory_comparison({"a": wps, "b": wps[::2]},
                                               _bounds()).exists()
    assert viz.visualize_trajectory_statistics(wps).exists()


def test_scan_visualizer(tmp_path, rng):
    viz = ScanResultVisualizer(tmp_path)
    scene = _sim_scene(rng)
    assert viz.visualize_scan_statistics(scene).exists()
    assert viz.visualize_frame_pointcloud(scene.frames[0]).exists()
    assert viz.visualize_incident_angle_distribution(scene).exists()
    assert viz.visualize_scan_quality_evolution(scene).exists()
    assert viz.create_scan_summary_report(scene).exists()


def test_mesh_visualizer(tmp_path, box_room, rng):
    viz = MeshVisualizer(tmp_path)
    wps = [Waypoint(1.0 + 0.2 * i, 1.5, 1.0, 0) for i in range(5)]
    assert viz.visualize_room_mesh(box_room, _bounds()).exists()
    assert viz.visualize_mesh_with_trajectory(box_room, wps, _bounds()).exists()
    assert viz.visualize_mesh_statistics(box_room, _bounds()).exists()
    from ipcgen_tpu.trajectory import FurnitureInfo

    furn = [FurnitureInfo("t", np.array([2.0, 1.5, 0.5]),
                          np.array([1, 1, 1]), "table")]
    assert viz.visualize_mesh_with_furniture(box_room, furn, _bounds()).exists()


def test_scene_visualizer_and_summary(tmp_path, box_room, rng):
    from ipcgen_tpu.containers import S3DISScene

    viz = S3DISVisualizer(tmp_path)
    sim_scene = _sim_scene(rng, n_frames=6)
    scene = S3DISScene("viz_room", box_room)
    results = viz.generate_all_visualizations(sim_scene, scene, num_sample_frames=2)
    assert results["scene_bev"] is not None
    assert results["combined_pointcloud"] is not None
    summary = create_visualization_summary(results, tmp_path)
    assert summary.exists()
    assert "scene_bev" in summary.read_text()


def test_normals_viz(tmp_path, rng):
    pts = rng.uniform(0, 2, (500, 3))
    normals = rng.normal(size=(500, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    assert visualize_normals(pts, normals, output_path=tmp_path / "n.png").exists()
    assert visualize_normals_high_quality(pts, normals, output_dir=tmp_path).exists()
    assert visualize_normal_statistics(normals, tmp_path / "ns.png").exists()
    assert visualize_normals(pts, None) is None


def test_recon_projection_visualizer(tmp_path, box_room, rng):
    from ipcgen_tpu.recon import ReconstructionVisualizer

    cfg = {"visualization": {"save_visualizations": True, "max_vis_points": 300}}
    viz = ReconstructionVisualizer(cfg)
    pts = rng.uniform(0, 3, (1000, 3))
    cols = rng.uniform(0, 1, (1000, 3))
    out = viz.visualize_pointcloud(pts, colors=cols,
                                   output_path=tmp_path / "pc.png")
    assert out.exists()
    out = viz.visualize_pointcloud(pts, output_path=tmp_path / "pc_nocol.png")
    assert out.exists()
    out = viz.visualize_mesh_projection(box_room, tmp_path / "mesh.png")
    assert out.exists()
    # Gate: save_visualizations=False renders nothing (reference
    # s3dis_nksr_reconstructor.py:166-167).
    off = ReconstructionVisualizer({"visualization": {"save_visualizations": False}})
    assert off.visualize_pointcloud(pts, output_path=tmp_path / "no.png") is None
    assert not (tmp_path / "no.png").exists()
