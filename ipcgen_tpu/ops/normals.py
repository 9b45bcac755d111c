"""K-NN PCA normal estimation on device.

Replaces Open3D's KD-tree hybrid ``estimate_normals`` (C++; reference call
site s3dis_data_loader.py:146-154, radius 0.1 / max_nn 30) with a batched
TPU program: k nearest neighbors via the tiled k-NN, per-point 3x3 covariance
of the neighborhood, smallest-eigenvector extraction via a closed-form
symmetric 3x3 eigen-solve — thousands of tiny eigenproblems batched into one
vector program instead of a host loop.

The hybrid-radius semantics are preserved: neighbors beyond ``radius`` are
excluded from the covariance (masked), matching KDTreeSearchParamHybrid.
Normals are orientation-ambiguous (as with Open3D before orientation
propagation); ``orient_towards`` flips them toward a viewpoint if given.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.ops.knn import knn

# Same grid-path threshold as ops.outliers; tests monkeypatch it.
GRID_MIN_N = 150_000


@functools.partial(jax.jit, static_argnames=())
def _smallest_eigenvector_3x3(cov: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue for a batch of symmetric 3x3.

    Closed-form (trigonometric) eigenvalues + nullspace extraction by cross
    products — fully branch-free and batched (cov: (N, 3, 3)).
    """
    a = cov
    tr = jnp.trace(a, axis1=1, axis2=2)
    q = tr / 3.0
    b = a - q[:, None, None] * jnp.eye(3)
    p2 = jnp.sum(b * b, axis=(1, 2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = jnp.linalg.det(b)
    r = detb / (2.0 * p**3 + 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue of a symmetric 3x3 via the trigonometric formula
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Nullspace of (A - eig_min I): cross products of its rows; pick the
    # largest for numerical stability.
    m = a - eig_min[:, None, None] * jnp.eye(3)
    c0 = jnp.cross(m[:, 0], m[:, 1])
    c1 = jnp.cross(m[:, 0], m[:, 2])
    c2 = jnp.cross(m[:, 1], m[:, 2])
    n0, n1, n2 = (jnp.sum(c * c, axis=1) for c in (c0, c1, c2))
    best = jnp.argmax(jnp.stack([n0, n1, n2], axis=1), axis=1)
    v = jnp.where(
        (best == 0)[:, None], c0, jnp.where((best == 1)[:, None], c1, c2)
    )
    # Degenerate (isotropic) neighborhoods: fall back to +z
    norm = jnp.linalg.norm(v, axis=1, keepdims=True)
    v = jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-12),
                  jnp.array([0.0, 0.0, 1.0]))
    return v


@jax.jit
def _pca_normals(neighbors: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """neighbors: (N, K, 3) positions; valid: (N, K) inclusion mask."""
    w = valid.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(neighbors * w, axis=1) / count
    centered = (neighbors - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[:, None]
    return _smallest_eigenvector_3x3(cov)


def estimate_normals(
    points: np.ndarray,
    radius: float = 0.1,
    max_nn: int = 30,
    orient_towards: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Estimate unit normals via hybrid-radius k-NN PCA.

    Parameters mirror the reference config (configs/s3dis_config.yaml:24-25):
    ``radius`` 0.1 m, ``max_nn`` 30.
    """
    points = np.asarray(points, dtype=np.float32)
    n = len(points)
    if n == 0:
        return np.zeros((0, 3), dtype=np.float32)
    k = min(max_nn, n)
    if n > GRID_MIN_N:
        # Grid-hashed self-join at room scale; results stay on device so the
        # neighbor gather + PCA run without a host round trip.  Candidates
        # beyond the radius (incl. +inf for sparse neighborhoods) are masked.
        # The query side is padded to a bucketed length FIRST so every room
        # of similar size reuses the same compiled gather/PCA programs —
        # otherwise each room's distinct post-outlier count costs a fresh
        # ~40-60 s XLA compile.
        from ipcgen_tpu.ops.grid_nn import _bucket_len, knn_grid

        n_pad = _bucket_len(-(-n // 4096)) * 4096
        pts_pad = np.concatenate(
            [points, np.full((n_pad - n, 3), 1e6, np.float32)]
        ) if n_pad != n else points
        idx_dev, d2_dev = knn_grid(pts_pad, points, k=k, device_arrays=True)
        neighbors = jnp.asarray(pts_pad)[idx_dev]
        valid = d2_dev <= radius * radius
        normals = np.array(_pca_normals(neighbors, valid)[:n])
    else:
        idx, dists = knn(points, points, k=k)
        neighbors = jnp.asarray(points)[jnp.asarray(idx)]
        valid = jnp.asarray(dists) <= radius
        normals = np.array(_pca_normals(neighbors, valid))  # writable copy
    if orient_towards is not None:
        to_view = np.asarray(orient_towards, dtype=np.float32) - points
        flip = np.sum(normals * to_view, axis=1) < 0
        normals[flip] = -normals[flip]
    return normals
