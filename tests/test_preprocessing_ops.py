"""Tests for outlier removal, PCA normals, and distribution metrics."""

import numpy as np
import pytest

from ipcgen_tpu.ops.metrics import (
    compute_chamfer_distance,
    compute_hausdorff_distance,
    compute_mmd,
    density,
)
from ipcgen_tpu.ops.normals import estimate_normals
from ipcgen_tpu.ops.outliers import remove_statistical_outliers


def test_outlier_removal_flags_injected_outliers(rng):
    cloud = rng.normal(size=(500, 3)).astype(np.float32) * 0.5
    outliers = np.array([[50, 50, 50], [-40, 0, 0], [0, 60, -3]], dtype=np.float32)
    pts = np.vstack([cloud, outliers])
    mask, _ = remove_statistical_outliers(pts, nb_neighbors=20, std_ratio=2.0)
    assert not mask[-3:].any()  # all injected outliers removed
    assert mask[:-3].mean() > 0.95  # nearly all inliers kept


def test_outlier_removal_small_input():
    pts = np.zeros((5, 3), dtype=np.float32)
    mask, _ = remove_statistical_outliers(pts, nb_neighbors=20)
    assert mask.all()


def test_normals_on_plane(rng):
    pts = np.zeros((400, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 2, 400)
    pts[:, 1] = rng.uniform(0, 2, 400)
    normals = estimate_normals(pts, radius=0.5, max_nn=20)
    # Plane z=0 -> normals +/- z
    assert np.all(np.abs(normals[:, 2]) > 0.99)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-4)


def test_normals_on_sphere(rng):
    v = rng.normal(size=(800, 3))
    pts = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    normals = estimate_normals(pts, radius=0.4, max_nn=20, orient_towards=np.zeros(3))
    # Oriented toward origin -> n ~ -p
    cos = np.sum(normals * (-pts), axis=1)
    assert np.mean(cos > 0.95) > 0.95


def test_normals_orientation_flip(rng):
    pts = np.zeros((200, 3), dtype=np.float32)
    pts[:, :2] = rng.uniform(0, 1, (200, 2))
    viewpoint = np.array([0.5, 0.5, 5.0])
    normals = estimate_normals(pts, radius=0.5, max_nn=15, orient_towards=viewpoint)
    assert np.all(normals[:, 2] > 0.9)


def _reference_mmd(x, y, gamma=1.0):
    def k(a, b):
        an = np.sum(a**2, axis=1)[:, None]
        bn = np.sum(b**2, axis=1)[None, :]
        return np.exp(-gamma * np.maximum(an + bn - 2 * a @ b.T, 0))

    m, n = len(x), len(y)
    return k(x, x).sum() / m**2 + k(y, y).sum() / n**2 - 2 * k(x, y).sum() / (m * n)


def test_mmd_matches_reference_formula(rng):
    x = rng.normal(size=(300, 3)).astype(np.float32)
    y = (rng.normal(size=(250, 3)) + 0.5).astype(np.float32)
    got = compute_mmd(x, y, max_points=1000)
    want = _reference_mmd(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_mmd_identical_clouds_near_zero(rng):
    x = rng.normal(size=(200, 3)).astype(np.float32)
    assert compute_mmd(x, x.copy(), max_points=1000) < 1e-5


def test_chamfer_matches_brute(rng):
    x = rng.normal(size=(150, 3)).astype(np.float32)
    y = rng.normal(size=(180, 3)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - y[None, :], axis=2)
    want = d.min(axis=1).mean() + d.min(axis=0).mean()
    got = compute_chamfer_distance(x, y, max_points=1000)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_hausdorff_matches_brute(rng):
    x = rng.normal(size=(120, 3)).astype(np.float32)
    y = rng.normal(size=(140, 3)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - y[None, :], axis=2)
    want = max(d.min(axis=1).max(), d.min(axis=0).max())
    got = compute_hausdorff_distance(x, y, max_points=1000)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_density():
    pts = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], dtype=np.float32)
    assert np.isclose(density(pts), 3 / 8.0)
    assert density(np.zeros((0, 3))) == 0.0


class TestFusedOutliersNormals:
    """The fused one-join path must match the separate grid-path product
    semantics: identical inlier mask, near-identical normals (VERDICT r4
    item 6: the preprocess stage's two k-NN joins fused into one)."""

    def _cloud(self, rng, n=24_000):
        # Dense planar patches + genuine far outliers, production-ish density
        pts = rng.uniform(0, 1, (n, 3)).astype(np.float32) * [4.0, 3.0, 0.01]
        pts[n // 2:, 2] += 1.5  # second plane
        out = rng.uniform(8, 12, (n // 100, 3)).astype(np.float32)
        return np.vstack([pts, out])

    def test_mask_matches_separate_grid_path(self, rng, monkeypatch):
        from ipcgen_tpu.ops import normals as nrm_mod
        from ipcgen_tpu.ops import outliers as out_mod

        pts = self._cloud(rng)
        monkeypatch.setattr(out_mod, "GRID_MIN_N", 1000)
        monkeypatch.setattr(nrm_mod, "GRID_MIN_N", 1000)
        mask_sep, _ = out_mod.remove_statistical_outliers(
            pts, nb_neighbors=20, std_ratio=2.0)
        mask_fused, normals = out_mod.remove_outliers_and_estimate_normals(
            pts, nb_neighbors=20, std_ratio=2.0, radius=0.1, max_nn=30)
        # Same candidate grid (same cell size, same cap) => the nearest 21
        # of the k=30 join equal the separate k=21 join => identical means
        # => identical mask.
        np.testing.assert_array_equal(mask_fused, mask_sep)
        assert len(normals) == int(mask_fused.sum())
        assert np.allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-3)

    def test_normals_match_separate_grid_path(self, rng, monkeypatch):
        from ipcgen_tpu.ops import normals as nrm_mod
        from ipcgen_tpu.ops import outliers as out_mod

        pts = self._cloud(rng)
        monkeypatch.setattr(out_mod, "GRID_MIN_N", 1000)
        monkeypatch.setattr(nrm_mod, "GRID_MIN_N", 1000)
        mask, fused = out_mod.remove_outliers_and_estimate_normals(
            pts, nb_neighbors=20, std_ratio=2.0, radius=0.1, max_nn=30)
        sep = nrm_mod.estimate_normals(pts[mask], radius=0.1, max_nn=30)
        dot = np.abs(np.sum(fused * sep, axis=1))
        # Differ only where an outlier sat inside a 30-NN neighborhood
        # (fused masks it; separate pulls the next-nearest inlier).
        assert np.median(dot) > 0.999
        assert (dot > 0.99).mean() > 0.97
        # Planar regions: fused normals must still be the plane normal.
        plane = np.abs(fused[:1000, 2])
        assert np.median(plane) > 0.999

    def test_small_input_falls_back(self, rng):
        from ipcgen_tpu.ops import outliers as out_mod

        pts = rng.normal(size=(400, 3)).astype(np.float32)
        mask, normals = out_mod.remove_outliers_and_estimate_normals(
            pts, nb_neighbors=10, std_ratio=2.0, radius=0.5, max_nn=15)
        mask_sep, _ = out_mod.remove_statistical_outliers(
            pts, nb_neighbors=10, std_ratio=2.0)
        np.testing.assert_array_equal(mask, mask_sep)
        assert len(normals) == int(mask.sum())
