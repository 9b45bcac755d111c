"""Full five-stage pipeline integration test on a synthetic S3DIS room."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


@pytest.fixture
def synthetic_s3dis(tmp_path, rng):
    """A tiny synthetic S3DIS Area_1/office_1: dense room-shell cloud + two
    annotated objects."""
    room = tmp_path / "data" / "Area_1" / "office_1"
    ann = room / "Annotations"
    ann.mkdir(parents=True)

    def surface(n, lo, hi, axis, value):
        pts = rng.uniform(0, 1, (n, 3)) * (np.array(hi) - lo) + lo
        pts[:, axis] = value
        return pts

    lo = [0, 0, 0]
    hi = [3.0, 2.5, 2.2]
    floor = surface(3000, lo, hi, 2, 0.0)
    ceiling = surface(2000, lo, hi, 2, 2.2)
    walls = np.vstack(
        [
            surface(1200, lo, hi, 0, 0.0),
            surface(1200, lo, hi, 0, 3.0),
            surface(1200, lo, hi, 1, 0.0),
            surface(1200, lo, hi, 1, 2.5),
        ]
    )
    chair = rng.uniform(0, 1, (500, 3)) * [0.5, 0.5, 0.8] + [1.0, 1.0, 0.0]
    table = rng.uniform(0, 1, (600, 3)) * [1.0, 0.7, 0.1] + [1.8, 1.2, 0.7]
    cloud = np.vstack([floor, ceiling, walls, chair, table])
    colors = rng.integers(60, 200, (len(cloud), 3))
    np.savetxt(room / "office_1.txt", np.hstack([cloud, colors]))

    np.savetxt(ann / "floor_1.txt", np.hstack([floor, np.full((len(floor), 3), 90)]))
    np.savetxt(ann / "chair_1.txt", np.hstack([chair, np.full((len(chair), 3), 200)]))
    np.savetxt(ann / "table_1.txt", np.hstack([table, np.full((len(table), 3), 120)]))
    return tmp_path


def test_pipeline_all_stages(synthetic_s3dis, tmp_path, monkeypatch):
    from run_pipeline import main as pipeline_main

    from ipcgen_tpu.config import PipelineConfig

    monkeypatch.chdir(tmp_path)
    cfg = PipelineConfig()
    cfg.data.data_root = str(synthetic_s3dis / "data")
    cfg.data.output_root = str(tmp_path / "outputs")
    cfg.data.area_name = "Area_1"
    cfg.data.room_name = "office_1"
    cfg.nksr.voxel_size = 0.08
    cfg.nksr.chunked = False
    cfg.preprocessing.normal_search_radius = 0.3
    cfg.simulation.num_waypoints = 3
    cfg.simulation.use_blk2go = False  # standard 8-line, CPU-friendly
    cfg.simulation.use_auto_trajectory = False
    cfg.simulation.use_gpu = False
    cfg.simulation.backend = "xla"
    cfg.simulation.save_visualizations = False
    cfg.simulation.output_base_dir = str(tmp_path / "simulation_results")
    cfg.evaluation.compute_chamfer = False
    cfg.evaluation.compute_mesh_quality = False
    cfg_path = tmp_path / "cfg.yaml"
    cfg.save(cfg_path)

    report = pipeline_main(
        ["--config", str(cfg_path), "--stages", "preprocess,recon,sim,bbox"]
    )
    entry = report["rooms"]["Area_1_office_1"]
    assert "error" not in entry, entry
    assert entry["preprocess"] == "done"
    assert entry["recon"] == "done"
    assert entry["sim"] == "done"
    assert entry["bbox"].startswith("done")

    out = Path(cfg.data.output_root)
    assert (out / "preprocessed" / "Area_1_office_1_preprocessed.pkl").exists()
    mesh = out / "reconstruction_results" / "Area_1_office_1" / "mesh_dense.ply"
    assert mesh.exists()

    sim_scene_dir = Path(cfg.simulation.output_base_dir) / "Area_1_office_1"
    labeled = sim_scene_dir / "combined_pointcloud_with_label.ply"
    assert labeled.exists()
    from ipcgen_tpu.io.ply import read_labeled_ply

    pts, colors, sem, ins = read_labeled_ply(labeled)
    assert len(pts) > 1000
    # Labels transferred from annotations: floor(1), chair(8), table(7)
    present = set(np.unique(sem).tolist())
    assert 1 in present
    # Simulated hits should mostly carry real colors, not the gray default
    assert not np.all(colors == 127)

    bbox_json = sim_scene_dir / "Area_1_office_1_detection_annotations.json"
    assert bbox_json.exists()
    payload = json.loads(bbox_json.read_text())
    names = {a["original_class_name"] for a in payload["annotations"]}
    assert "chair" in names and "table" in names

    # Second run: every stage skips (restartability)
    report2 = pipeline_main(
        ["--config", str(cfg_path), "--stages", "preprocess,recon,sim,bbox"]
    )
    entry2 = report2["rooms"]["Area_1_office_1"]
    assert all("skipped" in str(v) for k, v in entry2.items())
