"""Vectorized LiDAR beam generation (sensor frame) + world transform.

The reference builds rays in Python loops — a 64k-iteration per-ray loop for
the dual-axis scanner (lidar/indoor_lidar.py:224-296) and a double loop for
the uniform grid (:55-91).  Here every profile is closed-form array math with
explicit PRNG keys, jit/vmap-friendly, and returns FIXED-SHAPE directions plus
a keep mask (dropout never changes shapes on device; compaction happens at
host export, SURVEY.md §7 "variable-length results").

Formula parity with the reference (validated in tests/test_lidar.py):
- uniform grid:        indoor_lidar.py:55-91
- vertical-degree grid ("LiT-style"): indoor_lidar.py:93-131
  beta = -(i - W/2) / W * 2*pi, row-major over (line, azimuth)
- dual-axis multi-line: indoor_lidar.py:224-296
  swing = A * sin(f * phi + line_phase), clip to theta range, Gaussian angle
  noise, Bernoulli dropout
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.models.lidar_intrinsics import (
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
)


def spherical_to_cartesian(alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Unit directions from elevation ``alpha`` and azimuth ``beta`` (radians)."""
    ca = jnp.cos(alpha)
    return jnp.stack([ca * jnp.cos(beta), ca * jnp.sin(beta), jnp.sin(alpha)], axis=-1)


def gen_uniform_grid_dirs(
    fov_up: float, fov_down: float, h: int, w: int
) -> jnp.ndarray:
    """Uniform elevation/azimuth grid (reference: indoor_lidar.py:55-91).

    Returns (h*w, 3) unit directions in the sensor frame, vertical-major.
    """
    h = max(1, int(h))
    w = max(1, int(w))
    v = jnp.linspace(np.deg2rad(fov_up), -np.deg2rad(fov_down), h)
    hz = jnp.linspace(0.0, 2.0 * np.pi, w, endpoint=False)
    alpha = jnp.repeat(v, w)
    beta = jnp.tile(hz, h)
    return spherical_to_cartesian(alpha, beta).astype(jnp.float32)


def gen_vertical_degree_dirs(vertical_degrees, w: int) -> jnp.ndarray:
    """LiT-style grid with explicit per-line elevations
    (reference: indoor_lidar.py:93-131).

    Returns (H*w, 3) unit directions, line-major; azimuth
    beta = -(i - w/2) / w * 2*pi for column i.
    """
    w = max(1, int(w))
    if vertical_degrees is None or len(vertical_degrees) == 0:
        vertical_degrees = [0.0]
    h = len(vertical_degrees)
    i = jnp.tile(jnp.arange(w), h)
    alpha = jnp.repeat(jnp.deg2rad(jnp.asarray(vertical_degrees, jnp.float32)), w)
    beta = -(i - w / 2.0) / w * 2.0 * jnp.pi
    return spherical_to_cartesian(alpha, beta).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_points", "num_lines"))
def gen_dual_axis_dirs(
    key: jax.Array,
    num_points: int,
    num_lines: int,
    theta_min: float,
    theta_max: float,
    swing_amplitude: float,
    swing_frequency: float,
    angle_noise_std: float,
    dropout_probability: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized 32-line dual-axis spiral scan
    (reference: indoor_lidar.py:224-296, loop -> closed form).

    Returns
    -------
    dirs : (N, 3) float32 unit directions (N = points_per_line * num_lines),
        line-major like the reference loop order.
    keep : (N,) bool dropout mask (fixed shape; apply downstream).
    """
    points_per_line = num_points // num_lines
    n = points_per_line * num_lines

    line_idx = jnp.repeat(jnp.arange(num_lines), points_per_line)
    base_theta = jnp.linspace(theta_max, theta_min, num_lines)[line_idx]
    phase = line_idx.astype(jnp.float32) * jnp.pi / num_lines
    phi = jnp.tile(
        jnp.linspace(0.0, 2.0 * jnp.pi, points_per_line, endpoint=False), num_lines
    )
    swing = swing_amplitude * jnp.sin(swing_frequency * phi + phase)
    theta = jnp.clip(base_theta + swing, theta_min, theta_max)

    k_phi, k_theta, k_drop = jax.random.split(key, 3)
    # std/probability may be traced values; a zero std / zero probability is
    # the no-noise case, no branching needed.
    phi = phi + angle_noise_std * jax.random.normal(k_phi, (n,))
    theta = theta + angle_noise_std * jax.random.normal(k_theta, (n,))
    dirs = spherical_to_cartesian(theta, phi).astype(jnp.float32)
    keep = jax.random.uniform(k_drop, (n,)) > dropout_probability
    return dirs, keep


def dual_axis_dirs_from_intrinsics(
    intr: DualAxisLidarIntrinsics,
    key: jax.Array,
    num_points: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if num_points is None:
        num_points = int(intr.point_rate * intr.scan_duration)
    return gen_dual_axis_dirs(
        key,
        num_points,
        intr.num_vertical_lines,
        float(intr.theta_range[0]),
        float(intr.theta_range[1]),
        float(intr.swing_amplitude),
        float(intr.swing_frequency),
        float(intr.angle_noise_std),
        float(intr.dropout_probability),
    )


def sensor_dirs_from_intrinsics(
    intr, key: Optional[jax.Array] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam directions for any profile; returns (dirs (N,3), keep (N,))."""
    if isinstance(intr, DualAxisLidarIntrinsics):
        if key is None:
            key = jax.random.PRNGKey(0)
        return dual_axis_dirs_from_intrinsics(intr, key)
    if isinstance(intr, Indoor8LineLidarIntrinsics):
        if intr.vertical_degrees is None:
            dirs = gen_uniform_grid_dirs(
                intr.fov_up, intr.fov_down, intr.vertical_res, intr.horizontal_res
            )
        else:
            dirs = gen_vertical_degree_dirs(intr.vertical_degrees, intr.horizontal_res)
        return dirs, jnp.ones(dirs.shape[0], dtype=bool)
    raise ValueError(f"Unsupported LiDAR intrinsics type: {type(intr)}")


@jax.jit
def dirs_to_world(dirs: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Rotate sensor-frame directions into the world frame.

    Matches the reference transform d_world = d @ R^T
    (indoor_lidar.py:127, :88).  HIGHEST precision keeps unit directions unit
    (the TPU MXU would otherwise round through bf16).
    """
    return jnp.matmul(
        dirs, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.float32)


def rays_to_world(dirs: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) world rays [origin | direction] for one pose (API parity with
    reference get_rays(), indoor_lidar.py:27-53)."""
    d = dirs_to_world(dirs, jnp.asarray(pose, jnp.float32))
    o = jnp.broadcast_to(jnp.asarray(pose[:3, 3], jnp.float32), d.shape)
    return jnp.concatenate([o, d], axis=-1)


@jax.jit
def dirs_to_world_batch(dirs: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """(W, N, 3) world directions for a batch of poses (the fused multi-
    waypoint path: per-waypoint beam patterns and rotations)."""
    return jnp.einsum(
        "wnk,wjk->wnj", dirs, poses[:, :3, :3], precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.float32)
