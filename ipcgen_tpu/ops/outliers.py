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
    if n > 150_000:
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
