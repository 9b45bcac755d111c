"""Raycast correctness: closed-form cases + cross-validation of all backends."""

import numpy as np
import jax.numpy as jnp
import pytest

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.ops.raycast import raycast_asset_xla, raycast_brute
from ipcgen_tpu.ops.raycast_pallas import raycast_asset_pallas
from ipcgen_tpu.ops.scene_asset import build_scene_asset


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return v / np.linalg.norm(v)


def test_single_triangle_closed_form():
    # Triangle in the z=2 plane covering the unit square corner.
    verts = np.array([[0, 0, 2], [4, 0, 2], [0, 4, 2]], dtype=np.float32)
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    asset = build_scene_asset(verts, tris, block_size=8, super_factor=2)

    origins = np.array(
        [[1, 1, 0], [1, 1, 5], [10, 10, 0], [1, 1, 0]], dtype=np.float32
    )
    dirs = np.stack(
        [_unit([0, 0, 1]), _unit([0, 0, -1]), _unit([0, 0, 1]), _unit([0, 0, -1])]
    )
    res = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_array_equal(np.asarray(res.hit), [True, True, False, False])
    np.testing.assert_allclose(np.asarray(res.t)[:2], [2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.points)[0], [1, 1, 2], atol=1e-5)
    # Geometric normal of the triangle is +z
    assert abs(abs(np.asarray(res.normals)[0, 2]) - 1.0) < 1e-5


def test_box_room_wall_distances(box_room):
    """From the room center, axis rays must hit walls at half extents."""
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    center = np.array([2.0, 1.5, 1.25], dtype=np.float32)
    dirs = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float32,
    )
    origins = np.tile(center, (6, 1))
    res = raycast_asset_xla(origins, dirs, asset)
    assert np.all(np.asarray(res.hit))
    np.testing.assert_allclose(
        np.asarray(res.t), [2.0, 2.0, 1.5, 1.5, 1.25, 1.25], atol=1e-5
    )


def _random_soup(rng, n_tris=100, scale=5.0):
    base = rng.uniform(-scale, scale, size=(n_tris, 3))
    verts = np.concatenate(
        [base, base + rng.normal(0, 1, (n_tris, 3)), base + rng.normal(0, 1, (n_tris, 3))]
    ).astype(np.float32)
    tris = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T
    return verts, tris


def _random_rays(rng, n=300, scale=5.0):
    origins = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


def test_asset_xla_matches_brute(rng):
    verts, tris = _random_soup(rng)
    origins, dirs = _random_rays(rng)
    corners = verts[tris]
    v0 = jnp.asarray(corners[:, 0])
    e1 = jnp.asarray(corners[:, 1] - corners[:, 0])
    e2 = jnp.asarray(corners[:, 2] - corners[:, 0])
    t_brute, _ = raycast_brute(jnp.asarray(origins), jnp.asarray(dirs), v0, e1, e2)
    asset = build_scene_asset(verts, tris, block_size=16, super_factor=4)
    res = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(t_brute), rtol=1e-4, atol=1e-5
    )


def test_pallas_interpret_matches_xla(rng):
    verts, tris = _random_soup(rng, n_tris=60)
    origins, dirs = _random_rays(rng, n=257)
    asset = build_scene_asset(verts, tris, block_size=16, super_factor=4)
    res_x = raycast_asset_xla(origins, dirs, asset)
    res_p = raycast_asset_pallas(origins, dirs, asset, interpret=True)
    np.testing.assert_array_equal(np.asarray(res_p.hit), np.asarray(res_x.hit))
    np.testing.assert_allclose(
        np.asarray(res_p.t)[np.asarray(res_x.hit)],
        np.asarray(res_x.t)[np.asarray(res_x.hit)],
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_p.points), np.asarray(res_x.points), rtol=1e-4, atol=1e-4
    )


def test_pallas_interpret_box_room(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    center = np.array([2.0, 1.5, 1.25], dtype=np.float32)
    n = 400
    phis = np.linspace(0, 2 * np.pi, n, endpoint=False)
    dirs = np.stack([np.cos(phis), np.sin(phis), np.zeros(n)], axis=1).astype(
        np.float32
    )
    origins = np.tile(center, (n, 1)).astype(np.float32)
    res = raycast_asset_pallas(origins, dirs, asset, interpret=True)
    assert np.all(np.asarray(res.hit))
    # Every horizontal ray from inside the room must land on a wall plane.
    pts = np.asarray(res.points)
    on_wall = (
        np.isclose(pts[:, 0], 0.0, atol=1e-4)
        | np.isclose(pts[:, 0], 4.0, atol=1e-4)
        | np.isclose(pts[:, 1], 0.0, atol=1e-4)
        | np.isclose(pts[:, 1], 3.0, atol=1e-4)
    )
    assert np.all(on_wall)


def test_t_max_range_cull(box_room):
    asset = build_scene_asset(box_room.vertices, box_room.triangles, block_size=8)
    center = np.array([2.0, 1.5, 1.25], dtype=np.float32)
    dirs = np.array([[1, 0, 0], [-1, 0, 0]], dtype=np.float32)  # hits at t=2
    origins = np.tile(center, (2, 1))
    res = raycast_asset_pallas(origins, dirs, asset, t_max=1.0, interpret=True)
    assert not np.any(np.asarray(res.hit))
    res2 = raycast_asset_pallas(origins, dirs, asset, t_max=3.0, interpret=True)
    assert np.all(np.asarray(res2.hit))


def test_miss_semantics(rng):
    verts, tris = _random_soup(rng, n_tris=10)
    asset = build_scene_asset(verts, tris, block_size=8)
    # Rays pointing away from everything
    origins = np.full((5, 3), 100.0, dtype=np.float32)
    dirs = np.tile(np.array([[1.0, 0, 0]], dtype=np.float32), (5, 1))
    res = raycast_asset_xla(origins, dirs, asset)
    assert not np.any(np.asarray(res.hit))
    assert np.all(np.isinf(np.asarray(res.t)))
    assert np.all(np.asarray(res.tri_id) == -1)
    np.testing.assert_array_equal(np.asarray(res.points), 0.0)


def test_large_block_padding(rng):
    """Triangle count not a multiple of block size exercises padding."""
    verts, tris = _random_soup(rng, n_tris=37)
    origins, dirs = _random_rays(rng, n=100)
    asset = build_scene_asset(verts, tris, block_size=32, super_factor=4)
    assert asset.num_blocks == 2
    corners = verts[tris]
    t_brute, _ = raycast_brute(
        jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(corners[:, 0]),
        jnp.asarray(corners[:, 1] - corners[:, 0]),
        jnp.asarray(corners[:, 2] - corners[:, 0]),
    )
    res = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_brute), rtol=1e-4)


def test_culled_xla_matches_brute(rng):
    """Two-level AABB-culled XLA traversal is exact vs the brute oracle on an
    open scene (misses present) with random incoherent rays."""
    from ipcgen_tpu.ops.raycast import raycast_asset_xla_culled

    verts, tris = _random_soup(rng)
    origins, dirs = _random_rays(rng, n=700)
    asset = build_scene_asset(verts, tris, block_size=16, super_factor=4)
    res_o = raycast_asset_xla(origins, dirs, asset)
    res_c = raycast_asset_xla_culled(origins, dirs, asset)
    np.testing.assert_array_equal(np.asarray(res_c.hit), np.asarray(res_o.hit))
    np.testing.assert_allclose(
        np.asarray(res_c.t), np.asarray(res_o.t), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res_c.tri_id), np.asarray(res_o.tri_id)
    )


def test_culled_xla_t_max_matches_postfilter(box_room, rng):
    """Range culling at the AABB level == post-hoc strict < filter."""
    from ipcgen_tpu.ops.raycast import raycast_asset, raycast_asset_xla_culled

    asset = build_scene_asset(box_room.vertices, box_room.triangles,
                              block_size=8, super_factor=2)
    origins = np.tile(np.array([2.0, 1.5, 1.25], np.float32), (400, 1))
    dirs = rng.normal(size=(400, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t_max = 1.9
    res_c = raycast_asset_xla_culled(origins, dirs, asset, t_max=t_max)
    res_b = raycast_asset(origins, dirs, asset, backend="xla_brute", t_max=t_max)
    np.testing.assert_array_equal(np.asarray(res_c.hit), np.asarray(res_b.hit))
    np.testing.assert_allclose(
        np.asarray(res_c.t), np.asarray(res_b.t), rtol=1e-6
    )


def test_backend_xla_dispatch_uses_culled(box_room):
    """backend='xla' dispatches to the culled core with identical results."""
    from ipcgen_tpu.ops.raycast import raycast_asset

    asset = build_scene_asset(box_room.vertices, box_room.triangles,
                              block_size=8, super_factor=2)
    origins = np.tile(np.array([1.0, 1.0, 1.0], np.float32), (256, 1))
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    res_x = raycast_asset(origins, dirs, asset, backend="xla")
    res_b = raycast_asset(origins, dirs, asset, backend="xla_brute")
    np.testing.assert_allclose(np.asarray(res_x.t), np.asarray(res_b.t), rtol=1e-6)
