"""Trajectory subsystem tests: formulas, planning, collision."""

import numpy as np
import pytest

from ipcgen_tpu.trajectory import (
    AutoTrajectoryGenerator,
    CollisionDetector,
    FurnitureInfo,
    PathType,
    SmartTrajectoryGenerator,
    TrajectoryQuality,
    Waypoint,
)


def test_waypoint_pose_matrix():
    w = Waypoint(x=1.0, y=2.0, z=0.5, yaw=np.pi / 2)
    m = w.to_pose_matrix()
    np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 0.5])
    # Yaw-only Z rotation (reference: trajectory_generator.py:30-44)
    np.testing.assert_allclose(
        m[:2, :2], [[0, -1], [1, 0]], atol=1e-12
    )
    np.testing.assert_allclose(m[2], [0, 0, 1, 0.5])


def test_waypoint_distance_angle():
    a = Waypoint(0, 0, 0, 0)
    b = Waypoint(3, 4, 0, 0)
    assert np.isclose(a.distance_to(b), 5.0)
    assert np.isclose(a.angle_to(b), np.arctan2(4, 3))


def _bounds():
    return {"x_min": 0, "x_max": 4, "y_min": 0, "y_max": 3, "z_min": 0, "z_max": 2.5}


def test_smart_generator_straight():
    gen = SmartTrajectoryGenerator(_bounds())
    wps, quality = gen.generate_trajectory(
        (0.5, 1.5, 1.0), (3.5, 1.5, 1.0), PathType.STRAIGHT, num_waypoints=10
    )
    assert len(wps) == 10
    assert np.isclose(wps[0].x, 0.5) and np.isclose(wps[-1].x, 3.5)
    assert isinstance(quality, TrajectoryQuality)
    assert np.isclose(quality.path_length, 3.0, atol=1e-6)
    # Straight path in +x -> yaw 0 everywhere, perfectly smooth
    assert all(np.isclose(w.yaw, 0.0) for w in wps)
    assert np.isclose(quality.smoothness, 1.0)
    assert quality.turn_count == 0


@pytest.mark.parametrize("path_type", [PathType.ARC, PathType.ZIGZAG, PathType.SPIRAL])
def test_smart_generator_shapes(path_type):
    gen = SmartTrajectoryGenerator(_bounds())
    wps, quality = gen.generate_trajectory(
        (0.5, 1.5, 1.0), (3.5, 1.5, 1.0), path_type, num_waypoints=21
    )
    assert len(wps) == 21
    np.testing.assert_allclose([wps[0].x, wps[0].y], [0.5, 1.5], atol=1e-6)
    np.testing.assert_allclose([wps[-1].x, wps[-1].y], [3.5, 1.5], atol=1e-6)
    # All inside room bounds (clipped)
    for w in wps:
        assert gen.is_point_in_room(w)
    # Non-straight paths are longer than the chord
    assert quality.path_length > 3.0


def test_quality_metrics_parity():
    gen = SmartTrajectoryGenerator(_bounds())
    wps = [Waypoint(x=i * 0.5, y=0.0, z=1.0, yaw=(0.0 if i < 3 else np.pi / 4))
           for i in range(6)]
    # count_turns: yaw changes above 0.1 rad between interior waypoints
    assert gen.count_turns(wps) == 1
    # smoothness = 1/(1+std of yaw changes)
    changes = np.abs(np.diff([w.yaw for w in wps]))[1:]
    expected = 1.0 / (1.0 + np.std(changes))
    assert np.isclose(gen.calculate_smoothness(wps), expected)
    # coverage = waypoint bbox area / room area (reference formula)
    q = gen.evaluate_trajectory_quality(wps)
    assert np.isclose(q.coverage_ratio, 0.0)  # straight line -> zero area


def test_clip_to_room_bounds():
    gen = SmartTrajectoryGenerator(_bounds())
    clipped = gen.clip_to_room_bounds(Waypoint(x=-5, y=10, z=1.0, yaw=0.3))
    assert clipped.x == 0 and clipped.y == 3 and clipped.z == 1.0
    assert clipped.yaw == 0.3


def test_collision_detector():
    det = CollisionDetector(robot_radius=0.3)
    det.add_furniture(
        FurnitureInfo(
            name="table",
            position=np.array([2.0, 2.0, 0.5]),
            size=np.array([1.0, 1.0, 1.0]),
            category="table",
        )
    )
    hit, furn = det.detect_collision(Waypoint(2.0, 2.0, 0.5, 0))
    assert hit and furn.name == "table"
    # Just outside expanded bbox (0.5 half + 0.3 radius = 0.8)
    hit2, _ = det.detect_collision(Waypoint(2.0, 2.95, 0.5, 0))
    assert not hit2
    # On the expansion boundary side: inside
    hit3, _ = det.detect_collision(Waypoint(2.0, 2.7, 0.5, 0))
    assert hit3

    stats = det.get_collision_statistics(
        [Waypoint(2, 2, 0.5, 0), Waypoint(0, 0, 0.5, 0)]
    )
    assert stats["total_collisions"] == 1
    assert stats["collision_rate"] == 0.5

    paths = det.suggest_avoidance_path(Waypoint(2.0, 1.0, 0.5, 0), furn)
    assert len(paths) == 3


def test_auto_trajectory_on_box_room(box_room):
    gen = AutoTrajectoryGenerator(robot_radius=0.15, seed=0)
    bounds = {"x_min": 0, "x_max": 4, "y_min": 0, "y_max": 3, "z_min": 0, "z_max": 2.5}
    wps, info = gen.generate_optimal_trajectory(box_room, bounds, num_waypoints=10)
    assert len(wps) >= 20  # dense interpolation floor (reference :83)
    assert info["total_candidates"] > 0
    assert info["room_analysis"]["free_space_points"] > 50
    # All waypoints collision-free inside an empty box room
    assert info["best_trajectory"]["collision_count"] == 0
    best_len = info["best_trajectory"]["length"]
    assert best_len >= gen.min_trajectory_length


def test_auto_trajectory_occupancy_matches_pointwise(box_room):
    """Vectorized cell classification must agree with the per-cell test."""
    gen = AutoTrajectoryGenerator(robot_radius=0.15, seed=0)
    bounds = {"x_min": 0, "x_max": 4, "y_min": 0, "y_max": 3, "z_min": 0, "z_max": 2.5}
    analysis = gen._analyze_room_layout(box_room, bounds)
    for p in analysis.free_space_points[:50]:
        assert gen._is_point_in_room_bounds(p, bounds)
        assert not gen._is_point_inside_mesh(p, box_room)
    for p in analysis.obstacle_points[:50]:
        assert gen._is_point_inside_mesh(p, box_room)


def test_a_star_finds_path():
    gen = AutoTrajectoryGenerator(robot_radius=0.15, seed=0)
    # A small hand-built free-space line: points 0.25m apart (< 2*r = 0.3)
    pts = [np.array([i * 0.25, 0.0, 1.0]) for i in range(10)]
    from ipcgen_tpu.trajectory.auto import RoomAnalysis

    graph = gen._build_connectivity_graph(pts)
    gen.room_analysis = RoomAnalysis(
        bounds={}, center=np.zeros(3), dimensions=np.ones(3),
        free_space_points=pts, obstacle_points=[], connectivity_graph=graph,
        mesh=None,
    )
    path = gen._a_star_search(0, 9, pts)
    assert path is not None
    assert path[0] == 0 and path[-1] == 9
    assert len(path) == 10  # chain graph -> every node


def test_waypoint_resampling_arc_length():
    gen = AutoTrajectoryGenerator(seed=0)
    path = [np.array([0, 0, 1.0]), np.array([1.0, 0, 1.0]), np.array([1.0, 2.0, 1.0])]
    wps = gen._generate_waypoints_along_path(path, 7)
    assert len(wps) == 7
    np.testing.assert_allclose([wps[0].x, wps[0].y], [0, 0], atol=1e-9)
    np.testing.assert_allclose([wps[-1].x, wps[-1].y], [1, 2], atol=1e-9)
    # Evenly spaced along arc length (total 3.0 -> 0.5 spacing)
    pts = np.array([[w.x, w.y, w.z] for w in wps])
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    np.testing.assert_allclose(seg, 0.5, atol=1e-9)


def test_smoothing_preserves_endpoints():
    gen = AutoTrajectoryGenerator(seed=0)
    wps = [Waypoint(x=float(i), y=float(i % 2), z=1.0, yaw=0) for i in range(8)]
    sm = gen._smooth_trajectory(wps)
    assert sm[0].x == wps[0].x and sm[-1].x == wps[-1].x
    # Interior points pulled toward neighbors' mean
    assert abs(sm[3].y - 0.5) < abs(wps[3].y - 0.5) + 1e-12


def test_selection_scoring():
    gen = AutoTrajectoryGenerator(seed=0)
    gen.min_trajectory_length = 1.0

    def cand(length, smooth, collisions):
        from ipcgen_tpu.trajectory.auto import TrajectoryCandidate

        return TrajectoryCandidate(
            start_point=np.zeros(3), end_point=np.ones(3), waypoints=[],
            quality=TrajectoryQuality(1, length, 0, 1, collisions, smooth),
            length=length, collision_count=collisions, smoothness_score=smooth,
        )

    # Score = 0.4*min(L/Lmin, 2) + 0.4*smooth - 0.1*collisions
    c_short = cand(1.0, 1.0, 0)  # 0.4 + 0.4 = 0.8
    c_long = cand(5.0, 1.0, 0)  # 0.8 + 0.4 = 1.2
    c_hit = cand(5.0, 1.0, 5)  # 1.2 - 0.5 = 0.7
    best = gen._select_best_trajectory([c_short, c_long, c_hit])
    assert best is c_long


def test_collision_recount_grid_matches_bruteforce():
    """The CSR cell-grid recount must equal the full (W, V') vertex scan.

    The broad phase only skips cells the robot AABB cannot overlap, so the
    count is exact by construction; fuzz with waypoints both inside and
    out of bounds, against furniture clusters at robot height."""
    from ipcgen_tpu.containers.mesh import TriMesh

    rng = np.random.default_rng(7)
    w, h, z = 6.0, 5.0, 2.7
    pieces = [rng.uniform(0, 1, (20000, 3)) * np.array([w, h, 0.02])]
    for _ in range(5):
        pos = np.array([rng.uniform(0.5, w - 1.5),
                        rng.uniform(0.5, h - 1.5), 0.0])
        pieces.append(
            rng.uniform(0, 1, (3000, 3)) * np.array([0.8, 0.8, 1.6]) + pos
        )
    verts = np.vstack(pieces).astype(np.float32)
    mesh = TriMesh(verts, np.array([[0, 1, 2]], np.int32))
    rb = {"x_min": 0.0, "x_max": w, "y_min": 0.0, "y_max": h,
          "z_min": 0.0, "z_max": z}
    gen = AutoTrajectoryGenerator(seed=0)
    gen.room_analysis = type(
        "RA", (), {"bounds": rb, "mesh": mesh, "free_space_points": []}
    )()
    r = gen.robot_radius
    for _ in range(3):
        wps = [
            Waypoint(x=rng.uniform(-0.2, w + 0.2),
                     y=rng.uniform(-0.2, h + 0.2), z=1.0, yaw=0)
            for _ in range(60)
        ]
        pts = np.array([[p.x, p.y, p.z] for p in wps])
        oob = ~(
            (rb["x_min"] <= pts[:, 0] - r) & (pts[:, 0] + r <= rb["x_max"])
            & (rb["y_min"] <= pts[:, 1] - r) & (pts[:, 1] + r <= rb["y_max"])
            & (rb["z_min"] <= pts[:, 2] - r) & (pts[:, 2] + r <= rb["z_max"])
        )
        z_lo, z_hi = pts[:, 2].min() - r, pts[:, 2].max() + r
        band = verts[(verts[:, 2] >= z_lo) & (verts[:, 2] <= z_hi)]
        hits = np.array([
            bool(np.any(np.all((band >= p - r) & (band <= p + r), axis=1)))
            for p in pts
        ])
        brute = int(np.sum(oob | (~oob & hits)))
        assert gen._count_waypoint_collisions(wps) == brute
