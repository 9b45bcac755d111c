"""Tiled on-device KNN vs numpy brute force."""

import numpy as np

from ipcgen_tpu.ops.knn import knn, nearest_neighbor_indices


def _brute_nn(q, r):
    d = np.linalg.norm(q[:, None, :] - r[None, :, :], axis=2)
    return np.argmin(d, axis=1)


def test_nn_matches_brute_force(rng):
    q = rng.normal(size=(257, 3)).astype(np.float32)
    r = rng.normal(size=(511, 3)).astype(np.float32)
    idx = nearest_neighbor_indices(q, r)
    expected = _brute_nn(q, r)
    # Ties can differ in index but not in distance.
    d_got = np.linalg.norm(q - r[idx], axis=1)
    d_exp = np.linalg.norm(q - r[expected], axis=1)
    np.testing.assert_allclose(d_got, d_exp, atol=1e-5)


def test_nn_exact_on_grid():
    r = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], dtype=np.float32)
    q = np.array([[0.1, 0, 0], [0.9, 0.1, 0], [4.9, 5, 5]], dtype=np.float32)
    idx = nearest_neighbor_indices(q, r)
    np.testing.assert_array_equal(idx, [0, 1, 3])


def test_knn_matches_brute_force(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(300, 3)).astype(np.float32)
    k = 5
    idx, dists = knn(q, r, k=k, q_block=32)
    d = np.linalg.norm(q[:, None, :] - r[None, :, :], axis=2)
    expected_d = np.sort(d, axis=1)[:, :k]
    np.testing.assert_allclose(dists, expected_d, atol=1e-4)
    # Sorted ascending
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_knn_k_larger_than_refs(rng):
    q = rng.normal(size=(10, 3)).astype(np.float32)
    r = rng.normal(size=(3, 3)).astype(np.float32)
    idx, dists = knn(q, r, k=5)
    assert idx.shape == (10, 5)
    assert dists.shape == (10, 5)


def test_nn_empty_queries():
    r = np.zeros((4, 3), dtype=np.float32)
    idx = nearest_neighbor_indices(np.zeros((0, 3), np.float32), r)
    assert idx.shape == (0,)
