"""LiDAR model tests: formula parity with the reference per-ray loops."""

import numpy as np
import jax

from ipcgen_tpu.models import (
    DualAxisLidar,
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
    IndoorLidar,
    create_lidar,
    get_lidar_type,
)
from ipcgen_tpu.models.beams import (
    gen_dual_axis_dirs,
    gen_uniform_grid_dirs,
    gen_vertical_degree_dirs,
)


def _pose(x=0.0, y=0.0, z=0.0, yaw=0.0):
    m = np.eye(4)
    m[0, 3], m[1, 3], m[2, 3] = x, y, z
    c, s = np.cos(yaw), np.sin(yaw)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def _reference_vertical_degree_dirs(vertical_degrees, W):
    """Reference formula (indoor_lidar.py:93-131), meshgrid version."""
    H = len(vertical_degrees)
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i = i.reshape([H * W])
    j = j.reshape([H * W])
    beta = -(i - W / 2) / W * 2 * np.pi
    alpha = np.array([np.deg2rad(d) for d in vertical_degrees])[j]
    return np.stack(
        [np.cos(alpha) * np.cos(beta), np.cos(alpha) * np.sin(beta), np.sin(alpha)],
        axis=-1,
    )


def _reference_uniform_dirs(fov_up, fov_down, H, W):
    """Reference double loop (indoor_lidar.py:55-91)."""
    v = np.linspace(np.deg2rad(fov_up), -np.deg2rad(fov_down), H)
    h = np.linspace(0, 2 * np.pi, W, endpoint=False)
    out = []
    for va in v:
        for ha in h:
            out.append(
                [np.cos(va) * np.cos(ha), np.cos(va) * np.sin(ha), np.sin(va)]
            )
    return np.array(out)


def _reference_dual_axis_dirs(intr, num_points):
    """Reference per-ray loop (indoor_lidar.py:224-296) without noise/dropout."""
    ppl = num_points // intr.num_vertical_lines
    base = np.linspace(intr.theta_range[1], intr.theta_range[0], intr.num_vertical_lines)
    phis = np.linspace(0, 2 * np.pi, ppl, endpoint=False)
    out = []
    for line_idx, bt in enumerate(base):
        phase = line_idx * np.pi / intr.num_vertical_lines
        for phi in phis:
            swing = intr.swing_amplitude * np.sin(intr.swing_frequency * phi + phase)
            theta = np.clip(bt + swing, intr.theta_range[0], intr.theta_range[1])
            out.append(
                [
                    np.cos(theta) * np.cos(phi),
                    np.cos(theta) * np.sin(phi),
                    np.sin(theta),
                ]
            )
    return np.array(out)


def test_vertical_degree_dirs_match_reference():
    degrees = [15, 10, 5, 0, -5, -10, -15, -20]
    ours = np.asarray(gen_vertical_degree_dirs(degrees, 64))
    ref = _reference_vertical_degree_dirs(degrees, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_uniform_grid_dirs_match_reference():
    ours = np.asarray(gen_uniform_grid_dirs(15.0, 20.0, 4, 16))
    ref = _reference_uniform_dirs(15.0, 20.0, 4, 16)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dual_axis_dirs_match_reference_noiseless():
    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    intr.angle_noise_std = 0.0
    intr.dropout_probability = 0.0
    n = 32 * 100
    dirs, keep = gen_dual_axis_dirs(
        jax.random.PRNGKey(0),
        n,
        intr.num_vertical_lines,
        float(intr.theta_range[0]),
        float(intr.theta_range[1]),
        float(intr.swing_amplitude),
        float(intr.swing_frequency),
        0.0,
        0.0,
    )
    ref = _reference_dual_axis_dirs(intr, n)
    np.testing.assert_allclose(np.asarray(dirs), ref, atol=1e-5)
    assert np.all(np.asarray(keep))


def test_dual_axis_dropout_rate():
    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    lidar = DualAxisLidar(intr, _pose(), rng_key=jax.random.PRNGKey(7))
    dirs, keep = lidar.beam_directions(num_points=64000)
    rate = 1.0 - np.asarray(keep).mean()
    assert abs(rate - intr.dropout_probability) < 0.005


def test_ray_counts_per_profile():
    # SURVEY.md §2.2 ray budgets
    assert Indoor8LineLidarIntrinsics.create_standard_8line().get_total_points_per_scan() == 16000
    assert Indoor8LineLidarIntrinsics.create_high_resolution_8line().get_total_points_per_scan() == 32000
    assert Indoor8LineLidarIntrinsics.create_low_cost_8line().get_total_points_per_scan() == 8000
    assert Indoor8LineLidarIntrinsics.create_dense_32line().get_total_points_per_scan() == 128000
    assert Indoor8LineLidarIntrinsics.create_leica_blk2go().get_total_points_per_scan() == 512000
    assert DualAxisLidarIntrinsics.create_blk2go_dual_axis().get_total_points_per_scan() == 64000


def test_get_rays_world_transform():
    intr = Indoor8LineLidarIntrinsics.create_standard_8line()
    pose = _pose(1.0, 2.0, 0.5, yaw=np.pi / 2)
    lidar = IndoorLidar(intr, pose)
    rays = lidar.get_rays()
    assert rays.shape == (16000, 6)
    assert rays.dtype == np.float32
    np.testing.assert_allclose(
        rays[:, :3], np.tile([1.0, 2.0, 0.5], (len(rays), 1)), atol=1e-6
    )
    # Directions stay unit-length after rotation
    np.testing.assert_allclose(np.linalg.norm(rays[:, 3:], axis=1), 1.0, atol=1e-5)
    # Yaw of pi/2 maps sensor +x to world +y
    dirs_sensor = np.asarray(lidar.beam_directions()[0])
    np.testing.assert_allclose(rays[:, 4], dirs_sensor[:, 0], atol=1e-5)


def test_factory_and_type_names():
    pose = _pose()
    lidar8 = create_lidar(Indoor8LineLidarIntrinsics.create_standard_8line(), pose)
    assert isinstance(lidar8, IndoorLidar)
    lidar_da = create_lidar(DualAxisLidarIntrinsics.create_blk2go_dual_axis(), pose)
    assert isinstance(lidar_da, DualAxisLidar)
    assert get_lidar_type(lidar8.intrinsics) == "8-line single-axis scanning"
    assert get_lidar_type(lidar_da.intrinsics) == "Dual-axis spiral scanning"
    assert (
        get_lidar_type(Indoor8LineLidarIntrinsics.create_leica_blk2go())
        == "Single-axis simulated dual-axis"
    )


def test_custom_profiles():
    custom = Indoor8LineLidarIntrinsics.create_custom_lidar(
        num_beams=4, beam_angles=[10, 0, -10, -20], horizontal_resolution=0.5
    )
    assert custom.vertical_res == 4
    assert custom.horizontal_res == 720
    assert custom.fov_up == 10 and custom.fov_down == 20
    da = DualAxisLidarIntrinsics.create_custom_dual_axis(theta_0=10.0)
    assert np.isclose(da.theta_0, np.deg2rad(10.0))


def test_dual_axis_time_sequence():
    intr = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
    intr.angle_noise_std = 0.0
    lidar = DualAxisLidar(intr, _pose(), rng_key=jax.random.PRNGKey(0))
    rays = lidar.get_rays_frame(0.001)
    assert rays.shape == (int(intr.point_rate * 0.001), 6)
    single = lidar.get_rays_at_time(0.0)
    assert single.shape == (1, 6)
