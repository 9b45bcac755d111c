"""Raycast-based occupancy queries + raycast-mode trajectory planning."""

import numpy as np

from ipcgen_tpu.ops.occupancy import obstacle_mask
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.trajectory import AutoTrajectoryGenerator


def test_obstacle_mask_box_room(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    cells = np.array(
        [
            [2.0, 1.5, 1.25],  # room center: free
            [0.05, 1.5, 1.25],  # 5 cm from the x=0 wall: obstacle at r=0.15
            [3.9, 1.5, 1.25],  # 10 cm from the x=4 wall: obstacle
            [2.0, 1.5, 0.1],  # 10 cm above the floor: obstacle
            [2.0, 1.5, 0.5],  # 50 cm above the floor: free at r=0.15
        ],
        dtype=np.float32,
    )
    occ = obstacle_mask(asset, cells, robot_radius=0.15, backend="xla")
    np.testing.assert_array_equal(occ, [False, True, True, True, False])


def test_obstacle_mask_sees_surfaces_not_just_vertices(box_room):
    """A cell near the middle of a huge wall triangle: the vertex test misses
    it (vertices are at the room corners) but the raycast test catches it."""
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    cell = np.array([[2.0, 0.05, 1.25]], dtype=np.float32)  # 5 cm off y=0 wall
    occ = obstacle_mask(asset, cell, robot_radius=0.15, backend="xla")
    assert occ[0]
    # The reference's vertex test is blind here: no vertex within the AABB.
    gen = AutoTrajectoryGenerator(robot_radius=0.15)
    assert not gen._is_point_inside_mesh(cell[0], box_room)


def test_auto_trajectory_raycast_mode(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    bounds = {"x_min": 0, "x_max": 4, "y_min": 0, "y_max": 3, "z_min": 0,
              "z_max": 2.5}
    gen = AutoTrajectoryGenerator(
        robot_radius=0.15, seed=0, occupancy_mode="raycast", scene_asset=asset
    )
    wps, info = gen.generate_optimal_trajectory(box_room, bounds, num_waypoints=10)
    assert len(wps) >= 20
    assert info["room_analysis"]["free_space_points"] > 50
    # Interior cells free, so a decent path exists
    assert info["best_trajectory"]["length"] >= gen.min_trajectory_length
