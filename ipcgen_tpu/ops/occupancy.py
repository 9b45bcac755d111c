"""Batched free-space / occupancy queries over the resident scene.

The reference classifies trajectory-planning grid cells with a per-cell
Python loop testing mesh vertices against the robot AABB
(auto_trajectory_generator.py:131-143, :219-238).  BASELINE.json directs the
TPU build to reuse the raycast kernel for this: every cell asks "is any
geometry within the robot radius?" by casting a small bundle of rays from the
cell center and thresholding the nearest hit — ONE batched query for the
whole grid instead of thousands of host-side vertex scans.

This is geometrically stronger than the vertex test (it sees triangle
*surfaces*, not just vertices — a big coarse triangle spanning a cell is an
obstacle here but invisible to the vertex test), so it is offered as the
``occupancy_mode="raycast"`` option of AutoTrajectoryGenerator while the
vertex mode stays the parity default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.ops.raycast import raycast_asset
from ipcgen_tpu.ops.scene_asset import SceneAsset


def _probe_directions(n_azimuth: int = 8, n_polar: int = 3) -> np.ndarray:
    """A small uniform bundle of probe directions (+/- vertical included)."""
    dirs = [np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, -1.0])]
    for k in range(n_polar):
        theta = (k + 0.5) / n_polar * np.pi - np.pi / 2  # elevation
        for a in range(n_azimuth):
            phi = 2 * np.pi * a / n_azimuth
            dirs.append(
                np.array(
                    [
                        np.cos(theta) * np.cos(phi),
                        np.cos(theta) * np.sin(phi),
                        np.sin(theta),
                    ]
                )
            )
    return np.asarray(dirs, dtype=np.float32)


def obstacle_mask(
    asset: SceneAsset,
    cells: np.ndarray,
    robot_radius: float,
    directions: Optional[np.ndarray] = None,
    backend: str = "auto",
) -> np.ndarray:
    """True where geometry lies within ``robot_radius`` of a cell center.

    Parameters
    ----------
    cells : (N, 3) candidate cell centers (e.g. the planning grid at robot
        height).
    directions : optional (K, 3) probe bundle; defaults to 26 rays.
    """
    cells = np.asarray(cells, dtype=np.float32).reshape(-1, 3)
    if len(cells) == 0:
        return np.zeros(0, dtype=bool)
    if directions is None:
        directions = _probe_directions()
    k = len(directions)
    origins = np.repeat(cells, k, axis=0)
    dirs = np.tile(directions, (len(cells), 1))
    res = raycast_asset(
        jnp.asarray(origins),
        jnp.asarray(dirs),
        asset,
        backend=backend,
        t_max=float(robot_radius),
    )
    from ipcgen_tpu.utils.host import to_host

    hit_any = to_host(res.hit).reshape(len(cells), k).any(axis=1)
    return hit_any
