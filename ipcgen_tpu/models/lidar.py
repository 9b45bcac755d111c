"""LiDAR sensor classes (API parity with reference lidar/indoor_lidar.py).

The classes keep the reference's numpy ``get_rays() -> (N, 6)`` contract for
drop-in compatibility, while exposing the fixed-shape JAX-native path
(``beam_directions`` + keep mask) used by the fused scan pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple, Union

import jax
import numpy as np

from ipcgen_tpu.models import beams
from ipcgen_tpu.models.lidar_intrinsics import (
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
)


@dataclass
class IndoorLidar:
    """Single-axis multi-line scanner (reference: indoor_lidar.py:11-143)."""

    intrinsics: Indoor8LineLidarIntrinsics
    pose: np.ndarray  # (4, 4)

    def __post_init__(self) -> None:
        assert isinstance(self.intrinsics, Indoor8LineLidarIntrinsics)
        self.pose = np.asarray(self.pose, dtype=np.float64)
        assert self.pose.shape == (4, 4)

    def beam_directions(self) -> Tuple[np.ndarray, np.ndarray]:
        """Sensor-frame unit dirs + keep mask (all True for this profile)."""
        dirs, keep = beams.sensor_dirs_from_intrinsics(self.intrinsics)
        return dirs, keep

    def get_rays(self) -> np.ndarray:
        """(N, 6) float32 world rays [origin | unit direction]
        (reference contract: raycast_engine/raycast_engine.py:31-45)."""
        dirs, _ = self.beam_directions()
        return np.asarray(beams.rays_to_world(dirs, self.pose))

    def get_total_rays(self) -> int:
        return self.intrinsics.get_total_points_per_scan()

    def get_scan_frequency(self) -> float:
        return self.intrinsics.get_scan_frequency()

    def get_range_limits(self) -> tuple:
        return self.intrinsics.get_range_limits()


@dataclass
class DualAxisLidar:
    """Dual-axis spiral scanner (reference: indoor_lidar.py:146-369)."""

    intrinsics: DualAxisLidarIntrinsics
    pose: np.ndarray  # (4, 4)
    rng_key: Optional[jax.Array] = None

    def __post_init__(self) -> None:
        assert isinstance(self.intrinsics, DualAxisLidarIntrinsics)
        self.pose = np.asarray(self.pose, dtype=np.float64)
        assert self.pose.shape == (4, 4)
        # Explicit-PRNG design stance (SURVEY.md §7): no global numpy RNG in
        # the compat layer either.  Default key is deterministic; two
        # constructions with the same key produce identical rays.
        if self.rng_key is None:
            self.rng_key = jax.random.PRNGKey(0)
        self._draws = 0

    def _np_rng(self, salt: int = 0) -> np.random.Generator:
        """Deterministic numpy Generator derived from the jax key.

        A per-instance draw counter enters the seed so successive calls get
        fresh, independent noise (frames must not share dropout holes or
        angular bias) while two identically-seeded instances still replay
        the same sequence.
        """
        bits = np.asarray(jax.random.key_data(self.rng_key)).ravel()
        self._draws += 1
        return np.random.default_rng(
            np.concatenate([bits, [salt, self._draws]]).astype(np.uint32)
        )

    # ------------------------------------------------------------------
    def beam_directions(
        self, num_points: Optional[int] = None, key: Optional[jax.Array] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape sensor-frame dirs + dropout keep mask."""
        key = key if key is not None else self.rng_key
        dirs, keep = beams.dual_axis_dirs_from_intrinsics(
            self.intrinsics, key, num_points
        )
        return dirs, keep

    def get_multi_line_rays(self, num_points: Optional[int] = None) -> np.ndarray:
        """32-line dual-axis scan rays, dropout applied by compaction for
        parity with the reference output shape (indoor_lidar.py:224-296)."""
        dirs, keep = self.beam_directions(num_points)
        rays = np.asarray(beams.rays_to_world(dirs, self.pose))
        return rays[np.asarray(keep)]

    def get_rays(self) -> np.ndarray:
        return self.get_multi_line_rays()

    def get_rays_at_time(self, t: float) -> np.ndarray:
        """(1, 6) single ray at time t (reference: :162-190)."""
        phi, theta = self.intrinsics.calculate_angles_at_time(t, line_idx=0)
        direction = np.array(
            [np.cos(theta) * np.cos(phi), np.cos(theta) * np.sin(phi), np.sin(theta)],
            dtype=np.float32,
        )
        direction_world = (self.pose[:3, :3] @ direction).astype(np.float32)
        origin_world = self.pose[:3, 3].astype(np.float32)
        return np.concatenate([origin_world, direction_world]).reshape(1, 6)

    def get_rays_sequence(self, time_sequence: np.ndarray) -> np.ndarray:
        """(N, 6) rays for a time sequence, vectorized
        (reference loop: :192-222)."""
        ts = np.asarray(time_sequence, dtype=np.float64)
        phi = (self.intrinsics.phi_0 + self.intrinsics.omega_phi * ts) % (2 * np.pi)
        base = np.linspace(
            self.intrinsics.theta_range[1],
            self.intrinsics.theta_range[0],
            self.intrinsics.num_vertical_lines,
        )[0]
        swing = self.intrinsics.swing_amplitude * np.sin(
            self.intrinsics.swing_frequency * ts
        )
        theta = np.clip(
            base + swing, self.intrinsics.theta_range[0], self.intrinsics.theta_range[1]
        )
        if self.intrinsics.angle_noise_std > 0:
            rng = self._np_rng(salt=1)
            phi = phi + rng.normal(0, self.intrinsics.angle_noise_std, phi.shape)
            theta = theta + rng.normal(0, self.intrinsics.angle_noise_std, theta.shape)
        dirs = np.stack(
            [np.cos(theta) * np.cos(phi), np.cos(theta) * np.sin(phi), np.sin(theta)],
            axis=1,
        )
        dirs_world = dirs @ self.pose[:3, :3].T
        origins = np.broadcast_to(self.pose[:3, 3], dirs_world.shape)
        return np.concatenate([origins, dirs_world], axis=1).astype(np.float32)

    def get_rays_frame(self, frame_duration: Optional[float] = None) -> np.ndarray:
        return self.get_rays_sequence(
            self.intrinsics.generate_time_sequence(frame_duration)
        )

    def get_spiral_scan_rays(self, num_points: Optional[int] = None):
        if num_points is None:
            num_points = int(self.intrinsics.point_rate * self.intrinsics.scan_duration)
        timestamps = np.linspace(0, self.intrinsics.scan_duration, num_points)
        return self.get_rays_sequence(timestamps), timestamps

    def get_total_rays(self) -> int:
        return int(self.intrinsics.point_rate * self.intrinsics.scan_duration)

    def get_scan_frequency(self) -> float:
        return 1.0 / self.intrinsics.scan_duration

    def get_range_limits(self) -> tuple:
        return (0.5, self.intrinsics.max_range)

    def add_noise_to_rays(self, rays: np.ndarray) -> np.ndarray:
        if self.intrinsics.dropout_probability > 0:
            rng = self._np_rng(salt=2)
            keep = rng.random(len(rays)) > self.intrinsics.dropout_probability
            rays = rays[keep]
        return rays


LidarType = Union[IndoorLidar, DualAxisLidar]
IntrinsicsType = Union[Indoor8LineLidarIntrinsics, DualAxisLidarIntrinsics]


def create_lidar(intrinsics: IntrinsicsType, pose: np.ndarray, rng_key=None) -> LidarType:
    """Factory (reference: indoor_lidar.py:377-393)."""
    if isinstance(intrinsics, DualAxisLidarIntrinsics):
        return DualAxisLidar(intrinsics=intrinsics, pose=pose, rng_key=rng_key)
    if isinstance(intrinsics, Indoor8LineLidarIntrinsics):
        return IndoorLidar(intrinsics=intrinsics, pose=pose)
    raise ValueError(f"Unsupported LiDAR intrinsics type: {type(intrinsics)}")


def get_lidar_type(intrinsics: IntrinsicsType) -> str:
    """Human-readable profile name (reference: indoor_lidar.py:396-414)."""
    if isinstance(intrinsics, DualAxisLidarIntrinsics):
        return "Dual-axis spiral scanning"
    if isinstance(intrinsics, Indoor8LineLidarIntrinsics):
        if getattr(intrinsics, "dual_axis", False):
            return "Single-axis simulated dual-axis"
        return f"{intrinsics.vertical_res}-line single-axis scanning"
    return "Unknown type"
