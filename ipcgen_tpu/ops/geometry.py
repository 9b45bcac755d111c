"""Shared ray/triangle geometry math (pure jnp; used by XLA and Pallas paths).

Replaces the Embree intersection core the reference reaches through
``o3d.t.geometry.RaycastingScene.cast_rays`` (raycast_engine_cpu.py:46-53).
"""

from __future__ import annotations

import jax.numpy as jnp

MT_EPS = 1e-9  # determinant guard
BARY_EPS = 1e-7  # barycentric tolerance (matches Embree's watertight-ish behavior)


def moller_trumbore(o, d, v0, e1, e2, t_min: float = 1e-6):
    """Möller–Trumbore ray/triangle intersection, fully broadcastable.

    Parameters
    ----------
    o, d : (..., 3) ray origins and directions (d need not be unit length;
        t is measured in units of |d|).
    v0 : (..., 3) triangle base vertex.
    e1, e2 : (..., 3) triangle edge vectors (v1 - v0, v2 - v0).

    Returns
    -------
    t : (...) hit parameter (+inf where no hit).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > MT_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > MT_EPS)
        & (u >= -BARY_EPS)
        & (v >= -BARY_EPS)
        & (u + v <= 1.0 + BARY_EPS)
        & (t > t_min)
    )
    return jnp.where(hit, t, jnp.inf)


def moller_trumbore_components(
    ox, oy, oz, dx, dy, dz,
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
    t_min: float = 1e-6,
):
    """Component-wise Möller–Trumbore for lane-friendly layouts (Pallas).

    All inputs broadcast elementwise; avoids any (..., 3) axis so every
    operation maps 1:1 onto (sublane, lane) vector registers.
    """
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > MT_EPS, 1.0 / det, 0.0)
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > MT_EPS)
        & (u >= -BARY_EPS)
        & (v >= -BARY_EPS)
        & (u + v <= 1.0 + BARY_EPS)
        & (t > t_min)
    )
    return jnp.where(hit, t, jnp.inf)


def ray_aabb_hit(ox, oy, oz, inv_dx, inv_dy, inv_dz, lo, hi, t_best):
    """Slab test: does the ray segment [0, t_best] hit the AABB (lo, hi)?

    ``lo``/``hi`` are 3-element broadcastables (scalars per component);
    ray components are arrays. Handles inf from zero direction components
    (IEEE inf semantics give correct slab results as long as origins are not
    exactly on the slab planes, which the builder's epsilon padding avoids).
    """
    t1x = (lo[0] - ox) * inv_dx
    t2x = (hi[0] - ox) * inv_dx
    t1y = (lo[1] - oy) * inv_dy
    t2y = (hi[1] - oy) * inv_dy
    t1z = (lo[2] - oz) * inv_dz
    t2z = (hi[2] - oz) * inv_dz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_best)
