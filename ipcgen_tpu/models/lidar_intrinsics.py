"""LiDAR intrinsics profiles.

API-parity rewrite of reference lidar/lidar_intrinsics.py:12-389 with all six
factory profiles (SURVEY.md §2.2).  Angle math that the reference evaluates in
per-ray Python loops lives in ipcgen_tpu.models.beams as array programs; the
classes here are plain parameter containers.

Reference bug fixed rather than copied: ``create_custom_dual_axis`` passed
non-fields (theta_0/omega_theta/use_spiral_scan, lidar_intrinsics.py:196-211)
— those are real fields here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


_DEFAULT_SEED_SEQ = np.random.SeedSequence(0)


def _fresh_default_rng() -> np.random.Generator:
    """Deterministic per-process default RNG: every call gets an
    independent stream (per-frame noise must not repeat), while a fresh
    process replays the same overall sequence (explicit-PRNG stance,
    SURVEY.md §7 — no global numpy state)."""
    return np.random.default_rng(_DEFAULT_SEED_SEQ.spawn(1)[0])


@dataclass
class LidarIntrinsics:
    """Base sensor parameters (reference: lidar_intrinsics.py:12-25)."""

    fov_up: float  # positive degrees
    fov_down: float  # positive degrees
    vertical_res: int
    horizontal_res: int
    max_range: float
    vertical_degrees: Optional[List[float]] = None


@dataclass
class DualAxisLidarIntrinsics(LidarIntrinsics):
    """Dual-axis spiral scanner (BLK2GO-style; reference: :28-211)."""

    fov_up: float = 15.0
    fov_down: float = 20.0
    vertical_res: int = 1
    horizontal_res: int = 1
    max_range: float = 25.0
    vertical_degrees: Optional[List[float]] = None

    # Dual-axis scanning core parameters
    phi_0: float = 0.0
    omega_phi: float = 2.0 * np.pi  # rad/s
    theta_0: float = 15.0 * np.pi / 180  # initial vertical angle (rad)
    omega_theta: float = -0.1  # vertical sweep rate (rad/s)
    use_spiral_scan: bool = True

    # Scanning time parameters
    scan_duration: float = 1.0  # s
    point_rate: int = 420_000  # points/s

    # Scanning range
    phi_range: Tuple[float, float] = (0.0, 2.0 * np.pi)
    theta_range: Tuple[float, float] = (-20.0 * np.pi / 180, 15.0 * np.pi / 180)

    # Noise / error model
    angle_noise_std: float = 0.001  # rad
    timing_jitter_std: float = 0.0001  # s
    dropout_probability: float = 0.02

    # Frame / multi-line mode
    frame_duration: float = 0.1  # s
    num_vertical_lines: int = 32

    # Swing parameters
    swing_amplitude: float = 5.0 * np.pi / 180
    swing_frequency: float = 1.0

    def get_scan_parameters(self) -> dict:
        return {
            "phi_0": self.phi_0,
            "omega_phi": self.omega_phi,
            "scan_duration": self.scan_duration,
            "point_rate": self.point_rate,
            "phi_range": self.phi_range,
            "theta_range": self.theta_range,
            "swing_amplitude": self.swing_amplitude,
            "swing_frequency": self.swing_frequency,
        }

    def calculate_angles_at_time(self, t: float, line_idx: int = 0, rng=None):
        """(phi, theta) of one beam at time ``t`` (reference: :81-116).

        ``rng``: optional numpy Generator for the angle noise; the vectorized
        path in models.beams uses JAX PRNG keys instead.
        """
        phi = (self.phi_0 + self.omega_phi * t) % (2 * np.pi)
        theta_start = self.theta_range[1]
        theta_end = self.theta_range[0]
        base = np.linspace(theta_start, theta_end, self.num_vertical_lines)
        base_theta = base[line_idx % self.num_vertical_lines]
        phase_offset = line_idx * 2 * np.pi / self.num_vertical_lines
        swing = self.swing_amplitude * np.sin(self.swing_frequency * t + phase_offset)
        theta = np.clip(base_theta + swing, self.theta_range[0], self.theta_range[1])
        if self.angle_noise_std > 0:
            # Deterministic default with fresh draws per call; pass a
            # Generator to control the stream.
            rng = rng or _fresh_default_rng()
            phi += rng.normal(0, self.angle_noise_std)
            theta += rng.normal(0, self.angle_noise_std)
        return phi, theta

    def generate_time_sequence(self, frame_duration: Optional[float] = None) -> np.ndarray:
        if frame_duration is None:
            frame_duration = self.frame_duration
        points_per_frame = int(self.point_rate * frame_duration)
        dt = frame_duration / points_per_frame
        return np.arange(0, frame_duration, dt)

    def get_total_points_per_scan(self) -> int:
        return int(self.point_rate * self.scan_duration)

    def get_scan_frequency(self) -> float:
        return 1.0 / self.scan_duration

    def get_range_limits(self) -> Tuple[float, float]:
        return (0.5, self.max_range)  # BLK2GO minimum range 0.5 m

    @classmethod
    def create_blk2go_dual_axis(cls) -> "DualAxisLidarIntrinsics":
        """Leica BLK2GO dual-axis spiral profile (reference: :152-186)."""
        return cls(
            fov_up=15.0,
            fov_down=20.0,
            vertical_res=1,
            horizontal_res=1,
            max_range=25.0,
            vertical_degrees=None,
            phi_0=0.0,
            omega_phi=2.0 * np.pi,
            scan_duration=0.1,
            point_rate=640_000,
            phi_range=(0.0, 2.0 * np.pi),
            theta_range=(-20.0 * np.pi / 180, 15.0 * np.pi / 180),
            angle_noise_std=0.001,
            timing_jitter_std=0.0001,
            dropout_probability=0.02,
            frame_duration=0.1,
            num_vertical_lines=32,
            swing_amplitude=5.0 * np.pi / 180,
            swing_frequency=1.0,
        )

    @classmethod
    def create_custom_dual_axis(
        cls,
        phi_0: float = 0.0,
        theta_0: float = 15.0,
        omega_phi: float = 2.0 * np.pi,
        omega_theta: float = -0.1,
        point_rate: int = 420_000,
        scan_duration: float = 1.0,
    ) -> "DualAxisLidarIntrinsics":
        return cls(
            phi_0=phi_0,
            theta_0=theta_0 * np.pi / 180,
            omega_phi=omega_phi,
            omega_theta=omega_theta,
            scan_duration=scan_duration,
            point_rate=point_rate,
            use_spiral_scan=True,
            frame_duration=0.1,
            fov_up=15.0,
            fov_down=20.0,
            vertical_res=1,
            horizontal_res=1,
            max_range=25.0,
        )


@dataclass
class Indoor8LineLidarIntrinsics(LidarIntrinsics):
    """Single-axis multi-line indoor scanner (reference: :214-389)."""

    fov_up: float = 15.0
    fov_down: float = 20.0
    vertical_res: int = 8
    horizontal_res: int = 2000
    max_range: float = 20.0
    vertical_degrees: Optional[List[float]] = field(
        default_factory=lambda: [15, 10, 5, 0, -5, -10, -15, -20]
    )

    min_range: float = 0.1
    range_resolution: float = 0.01
    scan_frequency: float = 10.0
    points_per_beam: int = 2000

    range_noise_std: float = 0.02
    angle_noise_std: float = 0.01  # degrees

    dual_axis: bool = False
    capture_rate: int = 200_000
    intensity_noise_std: float = 0.1
    dropout_probability: float = 0.05

    @classmethod
    def create_standard_8line(cls) -> "Indoor8LineLidarIntrinsics":
        return cls()

    @classmethod
    def create_high_resolution_8line(cls) -> "Indoor8LineLidarIntrinsics":
        return cls(horizontal_res=4000, points_per_beam=4000, range_resolution=0.005)

    @classmethod
    def create_low_cost_8line(cls) -> "Indoor8LineLidarIntrinsics":
        return cls(
            horizontal_res=1000,
            points_per_beam=1000,
            range_resolution=0.02,
            range_noise_std=0.05,
        )

    @classmethod
    def create_dense_32line(cls) -> "Indoor8LineLidarIntrinsics":
        """32 lines x 4000 azimuth steps (reference: :269-289)."""
        vertical_degrees = [round(15.0 - (i * 35.0 / 31.0), 1) for i in range(32)]
        return cls(
            fov_up=15.0,
            fov_down=20.0,
            vertical_res=32,
            horizontal_res=4000,
            max_range=25.0,
            vertical_degrees=vertical_degrees,
            points_per_beam=3000,
            range_resolution=0.005,
            range_noise_std=0.01,
            angle_noise_std=0.005,
        )

    @classmethod
    def create_leica_blk2go(cls) -> "Indoor8LineLidarIntrinsics":
        """Single-axis 64-line emulation of the BLK2GO (reference: :291-317)."""
        vertical_degrees = [round(15.0 - (i * 35.0 / 63.0), 1) for i in range(64)]
        return cls(
            fov_up=15.0,
            fov_down=20.0,
            vertical_res=64,
            horizontal_res=8000,
            max_range=25.0,
            vertical_degrees=vertical_degrees,
            points_per_beam=5000,
            range_resolution=0.003,
            range_noise_std=0.003,
            angle_noise_std=0.002,
            min_range=0.5,
            scan_frequency=20.0,
            dual_axis=True,
            capture_rate=420_000,
        )

    @classmethod
    def create_custom_lidar(
        cls,
        num_beams: int = 8,
        beam_angles: Optional[List[float]] = None,
        horizontal_resolution: float = 0.1,
        max_range: float = 20.0,
        points_per_beam: int = 2000,
    ) -> "Indoor8LineLidarIntrinsics":
        if beam_angles:
            fov_up = max(beam_angles)
            fov_down = abs(min(beam_angles))
            vertical_degrees = beam_angles
        else:
            fov_up = 15.0
            fov_down = 20.0
            vertical_degrees = [15, 10, 5, 0, -5, -10, -15, -20]
        horizontal_res = int(360.0 / horizontal_resolution)
        if horizontal_res > 10000:  # cap to avoid runaway ray counts
            horizontal_res = 10000
        return cls(
            fov_up=fov_up,
            fov_down=fov_down,
            vertical_res=num_beams,
            horizontal_res=horizontal_res,
            max_range=max_range,
            vertical_degrees=vertical_degrees,
            points_per_beam=points_per_beam,
        )

    def get_total_points_per_scan(self) -> int:
        return self.vertical_res * self.horizontal_res

    def get_scan_frequency(self) -> float:
        return self.scan_frequency

    def get_range_limits(self) -> Tuple[float, float]:
        return (self.min_range, self.max_range)

    def add_noise(self, points, ranges, angles, intensities, rng=None):
        """Gaussian range/angle/intensity noise + dropout (reference: :364-389)."""
        rng = rng or _fresh_default_rng()
        noisy_ranges = ranges + rng.normal(0, self.range_noise_std, ranges.shape)
        noisy_angles = angles + rng.normal(
            0, np.deg2rad(self.angle_noise_std), angles.shape
        )
        noisy_intensities = np.clip(
            intensities + rng.normal(0, self.intensity_noise_std, intensities.shape),
            0,
            1,
        )
        if self.dropout_probability > 0:
            keep_mask = rng.random(len(points)) > self.dropout_probability
            noisy_points = points[keep_mask]
            noisy_ranges = noisy_ranges[keep_mask]
            noisy_angles = noisy_angles[keep_mask]
            noisy_intensities = noisy_intensities[keep_mask]
        else:
            noisy_points = points
        return noisy_points, noisy_ranges, noisy_angles, noisy_intensities
