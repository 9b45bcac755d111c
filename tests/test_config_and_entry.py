"""Config tree, graft entry points, label-transfer export, CLI smoke tests."""

import json

import numpy as np
import pytest

from ipcgen_tpu.config import PipelineConfig, SparsityExperiment


def test_config_round_trip(tmp_path):
    cfg = PipelineConfig()
    cfg.simulation.num_waypoints = 7
    cfg.nksr.voxel_size = 0.05
    cfg.sparsity_experiments = [
        SparsityExperiment(name="half", keep_ratio=0.5, occlusion=True)
    ]
    path = tmp_path / "cfg.yaml"
    cfg.save(path)
    loaded = PipelineConfig.load(path)
    assert loaded.simulation.num_waypoints == 7
    assert loaded.nksr.voxel_size == 0.05
    assert loaded.sparsity_experiments[0].name == "half"
    assert loaded.sparsity_experiments[0].occlusion


def test_config_loads_reference_era_yaml(tmp_path):
    """Keys from the reference yaml (incl. unknown extras) load unchanged."""
    yaml_text = """
data:
  data_root: "X/"
  area_name: "Area_6"
  room_name: office_2
nksr:
  detail_level: 0.15
  voxel_size: 0.03
  chunked: true
  chunk_size: 60.0
  device: "cuda"
preprocessing:
  estimate_normals: true
  use_shs_net: false
  shs_model_path: "ignored/extra/key.pt"
  normal_search_radius: 0.1
  normal_max_nn: 30
  remove_outliers: true
  outlier_nb_neighbors: 20
  outlier_std_ratio: 2.0
sparsity_experiments:
  - name: "dense"
    keep_ratio: 1.0
    occlusion: false
evaluation:
  max_eval_points: 100000
  compute_chamfer: false
  compute_mesh_quality: false
"""
    path = tmp_path / "ref.yaml"
    path.write_text(yaml_text)
    cfg = PipelineConfig.load(path)
    assert cfg.data.area_name == "Area_6"
    assert cfg.nksr.chunk_size == 60.0
    assert not cfg.evaluation.compute_chamfer
    sim_cfg = cfg.simulator_config()
    assert sim_cfg["area"] == "Area_6"
    assert "raycast_engine" in sim_cfg


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    points, hit = out
    assert points.shape[0] == 4
    assert bool(np.asarray(hit).all())  # closed room


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_labeled_export_with_annotations(tmp_path, rng):
    """S3DISSimScene label transfer end-to-end with synthetic annotations."""
    from ipcgen_tpu.containers import S3DISSimFrame, S3DISSimScene, ScanQuality
    from ipcgen_tpu.io.ply import read_labeled_ply

    # Synthetic S3DIS room: raw cloud txt + annotations
    room = tmp_path / "Area_1" / "office_1"
    ann = room / "Annotations"
    ann.mkdir(parents=True)
    # chair occupies x<1, floor x>=1; colors encode the region
    chair_pts = rng.uniform(0, 1, (300, 3)) * [1, 2, 1]
    floor_pts = rng.uniform(0, 1, (300, 3)) * [1, 2, 0.1] + [1.5, 0, 0]
    np.savetxt(ann / "chair_1.txt", np.hstack([chair_pts, np.full((300, 3), 10)]))
    np.savetxt(ann / "floor_1.txt", np.hstack([floor_pts, np.full((300, 3), 200)]))
    raw = np.vstack([chair_pts, floor_pts])
    raw_colors = np.vstack([np.full((300, 3), 10), np.full((300, 3), 200)])
    np.savetxt(room / "office_1.txt", np.hstack([raw, raw_colors]))

    scene = S3DISSimScene(
        "Area_1_office_1",
        s3dis_data_root=str(tmp_path),
        area="Area_1",
        room="office_1",
    )
    # Simulated points: half near the chair region, half near the floor region
    sim_pts = np.vstack(
        [rng.uniform(0, 1, (50, 3)) * [1, 2, 1],
         rng.uniform(0, 1, (50, 3)) * [1, 2, 0.1] + [1.5, 0, 0]]
    ).astype(np.float32)
    q = ScanQuality(1.0, 100, 0, 0, 1.0, 0, 0)
    scene.append_frame(S3DISSimFrame(0, sim_pts, np.zeros(100), q))
    scene.save_results(tmp_path / "out")

    pts, colors, sem, ins = read_labeled_ply(
        tmp_path / "out" / "combined_pointcloud_with_label.ply"
    )
    assert len(pts) == 100
    # First 50 points map to chair (S3DIS id 8), rest to floor (id 1)
    assert np.all(sem[:50] == 8)
    assert np.all(sem[50:] == 1)
    assert np.all(ins == 1)
    # Colors transferred from the raw cloud (10 vs 200 per region)
    assert np.all(np.abs(colors[:50].astype(int) - 10) <= 1)
    assert np.all(np.abs(colors[50:].astype(int) - 200) <= 1)


def test_recon_cli_end_to_end(tmp_path, rng):
    """preprocess_room pickle -> recon CLI -> meshes + report."""
    import yaml

    from ipcgen_tpu.preprocess.loader import preprocess_room
    from ipcgen_tpu.recon.cli import reconstruct_room

    room = tmp_path / "Area_1" / "office_1"
    room.mkdir(parents=True)
    # A flat floor patch: dense enough to reconstruct
    pts = rng.uniform(0, 1, (3000, 3)) * [3, 3, 0.02]
    np.savetxt(room / "office_1.txt",
               np.hstack([pts, rng.integers(0, 256, (3000, 3))]))

    room_data = preprocess_room(
        str(tmp_path), "Area_1", "office_1",
        {"preprocessing": {"normal_search_radius": 0.4}},
        output_dir=str(tmp_path / "pre"),
        seed=0,
    )
    config = {
        "nksr": {"detail_level": 0.15, "voxel_size": 0.1, "chunked": False},
        "evaluation": {"max_eval_points": 1000, "compute_chamfer": True,
                       "compute_mesh_quality": True},
    }
    results = reconstruct_room(
        room_data["output_path"], config, str(tmp_path / "recon")
    )
    assert "dense" in results
    assert results["dense"]["reconstruction_stats"]["output_faces"] > 0
    assert results["dense"]["quality_metrics"]["chamfer_distance"] < 0.2
    scene_dir = tmp_path / "recon" / "Area_1_office_1"
    assert (scene_dir / "mesh_dense.ply").exists()
    assert (scene_dir / "mesh_dense.json").exists()
    report = json.loads((scene_dir / "reconstruction_report.json").read_text())
    assert report["room_info"]["room"] == "office_1"
    assert (scene_dir / "reconstruction_summary.txt").exists()


def test_create_simulator_from_pipeline_config(tmp_path):
    from ipcgen_tpu.sim.simulator import create_simulator_from_config

    cfg = PipelineConfig()
    cfg.simulation.use_blk2go = True
    cfg.data.area_name = "Area_3"
    path = tmp_path / "pipe.yaml"
    cfg.save(path)
    sim = create_simulator_from_config(str(path))
    assert sim.use_blk2go
    assert sim.config["area"] == "Area_3"
    # Defaults (no file) also work
    sim2 = create_simulator_from_config(None)
    assert sim2.lidar_config is not None
