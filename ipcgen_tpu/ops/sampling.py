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
    """Sample ``n`` points uniformly by area from a TriMesh surface."""
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
    pts = _sample(
        key,
        jnp.asarray(v0),
        jnp.asarray(e1),
        jnp.asarray(e2),
        jnp.asarray(cum.astype(np.float32)),
        int(n),
    )
    return np.asarray(pts)
