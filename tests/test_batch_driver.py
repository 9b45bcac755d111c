"""Batch simulation driver: discovery, skip/resume, summary (reference parity)."""

import numpy as np

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.sim.simulator import find_available_scenes, main


def _make_reconstruction_dir(tmp_path):
    recon = tmp_path / "reconstruction_results"
    for i, name in enumerate(["Area_1_office_1", "Area_1_office_2"]):
        d = recon / name
        d.mkdir(parents=True)
        room = TriMesh.box(
            center=(2.0, 1.5, 1.25), size=(4.0 + i, 3.0, 2.5), inward=True
        )
        room.save(d / "mesh_dense.ply")
        # A second mesh variant: discovery must prefer mesh_dense.ply
        room.save(d / "mesh_sparse50.ply")
    return recon


def test_find_available_scenes(tmp_path):
    recon = _make_reconstruction_dir(tmp_path)
    scenes = find_available_scenes(str(recon))
    assert len(scenes) == 2
    for mesh_path, scene_name, area_room in scenes:
        assert mesh_path.endswith("mesh_dense.ply")
        assert scene_name == area_room
    assert find_available_scenes(str(tmp_path / "missing")) == []


def test_batch_main_with_skip_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    recon = _make_reconstruction_dir(tmp_path)
    out = tmp_path / "simulation_results"

    kwargs = dict(
        reconstruction_dir=str(recon),
        num_waypoints=3,
        output_base_dir=str(out),
        use_gpu=False,
        use_blk2go=False,
        use_dense_lidar=False,
        use_auto_trajectory=False,
        s3dis_data_root=str(tmp_path / "nonexistent"),
        # 256 azimuth steps: skip/resume semantics don't depend on scan
        # density, and the 1-core CPU suite pays ~4x wall for the native
        # 2000 (format/values asserted in the golden pipeline instead).
        lidar_horizontal_res=256,
    )
    result = main(**kwargs)
    assert len(result["successful"]) == 2
    assert not result["failed"]
    assert not result["skipped"]
    for name in ("Area_1_office_1", "Area_1_office_2"):
        assert (out / name / "combined_pointcloud_with_label.ply").exists()
        assert (out / name / "simulation_statistics.txt").exists()

    # Second run: both scenes skip (reference: s3dis_simulator.py:643-655)
    result2 = main(**kwargs)
    assert len(result2["skipped"]) == 2
    assert not result2["successful"]

    # Partially-processed scene re-runs
    (out / "Area_1_office_1" / "simulation_statistics.txt").unlink()
    result3 = main(**kwargs)
    assert len(result3["successful"]) == 1
    assert len(result3["skipped"]) == 1


def test_batch_main_async_export(tmp_path, monkeypatch):
    """async_export overlaps exports in a worker thread; outputs identical."""
    monkeypatch.chdir(tmp_path)
    recon = _make_reconstruction_dir(tmp_path)

    res_sync = main(
        reconstruction_dir=str(recon),
        num_waypoints=3,
        output_base_dir=str(tmp_path / "sync_out"),
        use_blk2go=False,
        use_dense_lidar=False,
        lidar_horizontal_res=256,
    )
    res_async = main(
        reconstruction_dir=str(recon),
        num_waypoints=3,
        output_base_dir=str(tmp_path / "async_out"),
        use_blk2go=False,
        use_dense_lidar=False,
        async_export=True,
        lidar_horizontal_res=256,
    )
    assert len(res_async["successful"]) == len(res_sync["successful"]) == 2
    assert not res_async["failed"]
    for name in ("Area_1_office_1", "Area_1_office_2"):
        for fn in ("combined_pointcloud_with_label.ply",
                   "simulation_statistics.txt",
                   "trajectory_analysis.json"):
            a = tmp_path / "async_out" / name / fn
            s = tmp_path / "sync_out" / name / fn
            assert a.exists() and s.exists(), (name, fn)
        # The labeled cloud must carry the same number of points
        from ipcgen_tpu.io.ply import read_labeled_ply

        pa, *_ = read_labeled_ply(tmp_path / "async_out" / name
                                  / "combined_pointcloud_with_label.ply")
        ps, *_ = read_labeled_ply(tmp_path / "sync_out" / name
                                  / "combined_pointcloud_with_label.ply")
        assert len(pa) == len(ps)


def test_dispatch_scan_device_pinned(tmp_path):
    """dispatch_scan(device=d) commits the whole scan program to d."""
    import jax

    from ipcgen_tpu.sim.simulator import S3DISSimulator

    devices = jax.devices()
    if len(devices) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    room = TriMesh.box(center=(2.0, 1.5, 1.25), size=(4.0, 3.0, 2.5), inward=True)
    mesh_path = tmp_path / "mesh_dense.ply"
    room.save(mesh_path)
    sim = S3DISSimulator({"seed": 0}, use_blk2go=False, use_dense_lidar=False)
    sim.load_scene(str(mesh_path), "pin_room")
    from ipcgen_tpu.trajectory import Waypoint

    wps = [Waypoint(1.5 + 0.3 * i, 1.5, 1.0, 0.1 * i) for i in range(3)]
    b0 = sim.dispatch_scan(wps, device=devices[0])
    b1 = sim.dispatch_scan(wps, device=devices[1])
    assert b0.t.devices() == {devices[0]}
    assert b1.t.devices() == {devices[1]}
    # Same geometry scanned on two chips gives identical hit counts
    # (PRNG key advances between dispatches; the 8-line profile is
    # noise-free so the batches are bitwise equal).
    assert np.array_equal(np.asarray(b0.t), np.asarray(b1.t))


def test_batch_main_room_dp(tmp_path, monkeypatch):
    """room_dp=True: rooms round-robin over devices, outputs identical to
    the sequential driver (SURVEY.md §2.4 table row 3)."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    monkeypatch.chdir(tmp_path)
    recon = _make_reconstruction_dir(tmp_path)
    common = dict(
        reconstruction_dir=str(recon),
        num_waypoints=3,
        use_blk2go=False,
        use_dense_lidar=False,
        save_visualizations=False,
        lidar_horizontal_res=256,
    )
    res_seq = main(output_base_dir=str(tmp_path / "seq_out"), **common)
    res_dp = main(
        output_base_dir=str(tmp_path / "dp_out"), room_dp=True, **common
    )
    assert len(res_seq["successful"]) == 2
    assert len(res_dp["successful"]) == 2
    assert not res_dp["failed"]

    from ipcgen_tpu.io.ply import read_labeled_ply

    for name in ("Area_1_office_1", "Area_1_office_2"):
        a = tmp_path / "dp_out" / name / "combined_pointcloud_with_label.ply"
        s = tmp_path / "seq_out" / name / "combined_pointcloud_with_label.ply"
        # Bit-identical labeled clouds: device placement must not enter the
        # computation semantics.
        assert a.read_bytes() == s.read_bytes()
        pa, *_ = read_labeled_ply(a)
        assert len(pa) > 0
        assert (tmp_path / "dp_out" / name / "trajectory_analysis.json").exists()
        assert (tmp_path / "dp_out" / name / "simulation_statistics.txt").exists()

    # Skip/resume works under room_dp too
    res_dp2 = main(
        output_base_dir=str(tmp_path / "dp_out"), room_dp=True, **common
    )
    assert len(res_dp2["skipped"]) == 2
    assert not res_dp2["successful"]
