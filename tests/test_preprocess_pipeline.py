"""S3DIS loader + preprocessing pipeline tests."""

import pickle

import numpy as np

from ipcgen_tpu.preprocess.loader import (
    S3DISLoader,
    S3DISPreprocessor,
    load_preprocessed_data,
    preprocess_room,
)


def _make_room(tmp_path, rng, n=800):
    room = tmp_path / "Area_1" / "office_1"
    room.mkdir(parents=True)
    pts = rng.uniform(0, 1, (n, 3)) * [4, 3, 2.5]
    colors = rng.integers(0, 256, (n, 3))
    labels = rng.integers(0, 13, (n, 1))
    data = np.hstack([pts, colors, labels])
    np.savetxt(room / "office_1.txt", data)
    return pts


def test_loader_room_txt(tmp_path, rng):
    pts = _make_room(tmp_path, rng)
    loader = S3DISLoader(str(tmp_path))
    points, colors, labels = loader.load_room_data("Area_1", "office_1")
    np.testing.assert_allclose(points, pts, atol=1e-5)
    assert colors.max() <= 1.0
    assert labels.dtype.kind == "i"
    assert loader.get_available_rooms("Area_1") == ["office_1"]
    assert loader.get_available_rooms("Area_9") == []


def test_preprocessor_outliers_and_normals(rng):
    pts = rng.uniform(0, 1, (500, 3)) * [4, 3, 0.01]  # near-planar
    pts = np.vstack([pts, [[100, 100, 100]]])  # outlier
    pre = S3DISPreprocessor({"preprocessing": {"normal_search_radius": 0.5}}, seed=0)
    p2, c2, l2, normals = pre.preprocess_pointcloud(pts)
    assert len(p2) == 500  # outlier removed
    assert normals.shape == (500, 3)
    assert np.mean(np.abs(normals[:, 2]) > 0.9) > 0.9  # plane -> z normals


def test_sparsity_and_occlusion(rng):
    pts = rng.uniform(0, 1, (2000, 3)) * [6, 5, 3]
    colors = rng.uniform(size=(2000, 3))
    labels = rng.integers(0, 13, 2000)
    pre = S3DISPreprocessor({}, seed=0)
    sp, sc, sl = pre.simulate_robot_sparsity(
        pts, colors, labels, {"name": "half", "keep_ratio": 0.5, "occlusion": False}
    )
    assert len(sp) == 1000 and len(sc) == 1000 and len(sl) == 1000
    oc, occ_c, occ_l = pre.simulate_robot_sparsity(
        pts, colors, labels, {"name": "occ", "keep_ratio": 1.0, "occlusion": True}
    )
    assert 0 < len(oc) < len(pts)
    # Occluded cloud obeys the range gate (8 m from robot position)
    robot = np.array([3.0, 2.5, pts[:, 2].min() + 0.5])
    assert np.linalg.norm(oc - robot, axis=1).max() < 8.0


def test_preprocess_room_pickle_round_trip(tmp_path, rng):
    _make_room(tmp_path, rng, n=600)
    out_dir = tmp_path / "out"
    room_data = preprocess_room(
        str(tmp_path),
        "Area_1",
        "office_1",
        {"preprocessing": {"normal_search_radius": 0.5}},
        output_dir=str(out_dir),
        sparsity_experiments=[
            {"name": "dense", "keep_ratio": 1.0, "occlusion": False},
            {"name": "sparse50", "keep_ratio": 0.5, "occlusion": False},
        ],
        seed=0,
    )
    pkl = out_dir / "Area_1_office_1_preprocessed.pkl"
    assert pkl.exists()
    loaded = load_preprocessed_data(str(pkl))
    assert set(loaded["variants"].keys()) == {"dense", "sparse50"}
    dense = loaded["variants"]["dense"]
    sparse = loaded["variants"]["sparse50"]
    assert len(sparse["points"]) < len(dense["points"])
    # Sparse variant re-estimates normals at the new point count
    assert len(sparse["normals"]) == len(sparse["points"])
    assert loaded["preprocess_time"] > 0
