"""Statistical outlier removal on device.

Replaces Open3D's ``remove_statistical_outlier`` (C++ KD-tree; reference call
sites: s3dis_data_loader.py:96-109, s3dis_bbox_visualizer.py:70-92,
lidar_net_bbox_visualizer.py:203-225) with the tiled brute-force k-NN from
ipcgen_tpu.ops.knn.

Semantics match Open3D: for each point compute the mean distance to its
``nb_neighbors`` nearest neighbors (excluding itself); points whose mean
distance exceeds  global_mean + std_ratio * global_std  are outliers.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ipcgen_tpu.ops.knn import knn

# Below this size the exact tiled k-NN is cheaper than building the hash
# grid; tests monkeypatch it to force the grid/fused path on small clouds.
GRID_MIN_N = 150_000


def remove_statistical_outliers(
    points: np.ndarray,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Statistical outlier removal.

    Returns
    -------
    inlier_mask : (N,) bool — True for kept points.
    mean_dists : (N,) float32 — mean k-NN distance per point (diagnostics).
    """
    points = np.asarray(points, dtype=np.float32)
    n = len(points)
    if n <= nb_neighbors:
        return np.ones(n, dtype=bool), np.zeros(n, dtype=np.float32)
    # k+1 because the query set equals the reference set (self at distance 0).
    if n > GRID_MIN_N:
        # Grid-hashed self-join at room scale (ops.grid_nn); points whose
        # 2x2x2 neighborhood holds fewer than k references get +inf mean
        # distance — they are isolated and flagged as outliers by definition.
        # The per-point mean reduces on device; only (N,) floats come home.
        import jax
        import jax.numpy as jnp

        from ipcgen_tpu.ops.grid_nn import _bucket_len, knn_grid

        # Pad queries to a bucketed length so rooms of similar size share
        # one compiled program (distinct counts would each recompile).
        n_pad = _bucket_len(-(-n // 4096)) * 4096
        pts_pad = np.concatenate(
            [points, np.full((n_pad - n, 3), 1e6, np.float32)]
        ) if n_pad != n else points
        _, d2_dev = knn_grid(pts_pad, points, k=nb_neighbors + 1,
                             device_arrays=True)
        mean_dev = jax.jit(
            lambda d2: jnp.mean(jnp.sqrt(d2[:, 1:]), axis=1)
        )(d2_dev)
        mean_dists = np.asarray(mean_dev)[:n]
    else:
        _, dists = knn(points, points, k=nb_neighbors + 1)
        mean_dists = dists[:, 1:].mean(axis=1)
    finite = np.isfinite(mean_dists)
    mu = float(mean_dists[finite].mean())
    sigma = float(mean_dists[finite].std())
    threshold = mu + std_ratio * sigma
    return finite & (mean_dists <= threshold), mean_dists


def remove_outliers_and_estimate_normals(
    points: np.ndarray,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
    radius: float = 0.1,
    max_nn: int = 30,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused outlier removal + PCA normals from ONE grid self-join.

    The separate product path (reference: s3dis_data_loader.py:96-109 then
    :146-154) runs two k-NN joins per room — outlier means on the full
    cloud, then normals on the filtered cloud — each paying a host hash-grid
    build, a padded upload, and a device program.  At room scale the two
    joins see near-identical neighborhoods (only ~1-2%% of points are
    removed), so one k=max(nb_neighbors+1, max_nn) join serves both: the
    outlier means read the nearest ``nb_neighbors`` (excluding self), and
    the normals PCA reads the nearest ``max_nn`` candidates with outlier
    neighbors masked out of the covariance.

    Semantics vs the separate path: the inlier mask is IDENTICAL (the
    threshold is computed on host from the same mean distances).  Normals
    differ only for points that had an outlier inside their ``max_nn``
    neighborhood — the fused PCA masks it (n-1 neighbors) where the
    separate path would pull in the next-nearest inlier; validated at
    median |dot| > 0.9999 on production-density rooms
    (scripts/preprocess_probe.py).

    Returns (inlier_mask (N,) bool, normals (mask.sum(), 3) float32 for the
    kept points, unit length, orientation-ambiguous).
    """
    import jax
    import jax.numpy as jnp

    from ipcgen_tpu.ops.grid_nn import _bucket_len, knn_grid
    from ipcgen_tpu.ops.normals import _pca_normals, estimate_normals

    points = np.asarray(points, dtype=np.float32)
    n = len(points)
    if n <= max(GRID_MIN_N, nb_neighbors, max_nn):
        mask, _ = remove_statistical_outliers(points, nb_neighbors, std_ratio)
        return mask, estimate_normals(points[mask], radius=radius,
                                      max_nn=max_nn)

    k_join = max(nb_neighbors + 1, max_nn)
    n_pad = _bucket_len(-(-n // 4096)) * 4096
    pts_pad = (
        np.concatenate([points, np.full((n_pad - n, 3), 1e6, np.float32)])
        if n_pad != n else points
    )
    idx_dev, d2_dev = knn_grid(pts_pad, points, k=k_join, device_arrays=True)
    mean_dev = jax.jit(
        lambda d2: jnp.mean(jnp.sqrt(d2[:, 1:nb_neighbors + 1]), axis=1)
    )(d2_dev)
    mean_dists = np.asarray(mean_dev)[:n]
    finite = np.isfinite(mean_dists)
    mu = float(mean_dists[finite].mean())
    sigma = float(mean_dists[finite].std())
    threshold = mu + std_ratio * sigma
    mask = finite & (mean_dists <= threshold)

    normals_dev = _fused_normals(
        jnp.asarray(pts_pad), idx_dev, d2_dev, mean_dev,
        jnp.float32(threshold), max_nn, radius,
    )
    normals = np.array(normals_dev[:n][mask])
    return mask, normals


def _fused_normals(pts_pad, idx, d2, mean_d, threshold, max_nn, radius):
    """PCA normals over the join's nearest ``max_nn`` candidates, with
    outlier neighbors (mean distance above threshold, or non-finite)
    masked out of the covariance.  Runs as one jit program; ``threshold``
    is a traced scalar so rooms share the compile."""
    import functools

    import jax
    import jax.numpy as jnp

    from ipcgen_tpu.ops.normals import _pca_normals

    @functools.partial(jax.jit, static_argnames=("max_nn", "radius"))
    def run(pts_pad, idx, d2, mean_d, threshold, max_nn, radius):
        idx_n = idx[:, :max_nn]
        d2_n = d2[:, :max_nn]
        inlier = jnp.isfinite(mean_d) & (mean_d <= threshold)
        neighbors = pts_pad[idx_n]
        valid = (d2_n <= radius * radius) & inlier[idx_n]
        return _pca_normals(neighbors, valid)

    return run(pts_pad, idx, d2, mean_d, threshold, max_nn, radius)
