"""Mesh surface sampling on device.

Replaces Open3D's Poisson-disk sampling used by the reconstruction evaluator
(reference: s3dis_nksr_reconstructor.py:293-295) with area-weighted uniform
surface sampling — the downstream Chamfer statistics only need an unbiased
surface sample, and uniform-by-area is exactly that.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n",))
def _sample(key, v0, e1, e2, cum_area, n: int):
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,)) * cum_area[-1]
    tri = jnp.searchsorted(cum_area, u, side="right")
    tri = jnp.clip(tri, 0, v0.shape[0] - 1)
    r = jax.random.uniform(k2, (n, 2))
    # Uniform barycentric via square-root trick
    su = jnp.sqrt(r[:, 0:1])
    a = 1.0 - su
    b = su * r[:, 1:2]
    return v0[tri] + a * e1[tri] + b * e2[tri]


def sample_points_on_mesh(
    mesh, n: int, key: Optional[jax.Array] = None
) -> np.ndarray:
    """Sample ``n`` points uniformly by area from a TriMesh surface.

    Triangle arrays are padded to a coarse bucket (zero-probability repeats
    of the last triangle) so per-mesh triangle counts don't each trigger a
    fresh XLA compile.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    corners = mesh.triangle_corners().astype(np.float32)
    v0 = corners[:, 0]
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    cum = np.cumsum(areas)
    if cum[-1] <= 0:
        raise ValueError("sample_points_on_mesh: degenerate mesh (zero area).")
    t = len(v0)
    if t > 8:  # 1/8-pow2 bucket (same scheme as the scene asset)
        step = 1 << max((t - 1).bit_length() - 3, 0)
        target = -(-t // step) * step
        pad = target - t
        if pad:
            v0 = np.concatenate([v0, np.repeat(v0[-1:], pad, axis=0)])
            e1 = np.concatenate([e1, np.repeat(e1[-1:], pad, axis=0)])
            e2 = np.concatenate([e2, np.repeat(e2[-1:], pad, axis=0)])
            # cumulative area stays flat over the padding -> zero probability
            cum = np.concatenate([cum, np.repeat(cum[-1:], pad)])
    pts = _sample(
        key,
        jnp.asarray(v0),
        jnp.asarray(e1),
        jnp.asarray(e2),
        jnp.asarray(cum.astype(np.float32)),
        int(n),
    )
    return np.asarray(pts)


def sample_points_poisson_disk(
    mesh, n: int, key: Optional[jax.Array] = None, oversample: int = 4
) -> np.ndarray:
    """Blue-noise-ish surface sampling (replaces Open3D's
    ``sample_points_poisson_disk``, reference call site
    s3dis_nksr_reconstructor.py:293-295).

    Open3D dart-throws with a KD-tree; here we oversample the surface
    uniformly by area, then thin with a uniform grid whose cell size targets
    the Poisson radius r ≈ sqrt(A / (2√3·n)) (hex-packing density), keeping
    one point per cell — O(N) and vectorized instead of a sequential
    rejection loop. The result has the same near-uniform spacing property
    the evaluator relies on (no two samples much closer than r).
    """
    cand = sample_points_on_mesh(mesh, n * oversample, key=key)
    area = float(mesh.surface_area())
    if area <= 0 or len(cand) == 0:
        return cand[:n]
    r = float(np.sqrt(area / (2.0 * np.sqrt(3.0) * max(n, 1))))
    cell = max(r, 1e-9)
    keys = np.floor((cand - cand.min(axis=0)) / cell).astype(np.int64)
    packed = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
    _, first = np.unique(packed, return_index=True)
    picked = cand[np.sort(first)]
    if len(picked) >= n:
        return picked[:n]
    # Fill the remainder with unused candidates (rare: very rough meshes)
    mask = np.ones(len(cand), bool)
    mask[first] = False
    extra = cand[mask][: n - len(picked)]
    return np.concatenate([picked, extra])
