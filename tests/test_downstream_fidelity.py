"""Downstream fidelity: reconstruction validated by the scan-vs-TLS metrics.

SURVEY.md §7: the NKSR substitute must be validated by the *downstream*
metric (simulated-scan distances vs the source cloud), not mesh-to-mesh
identity.  This test runs the full cycle: TLS cloud -> SDF reconstruction ->
LiDAR scan of the mesh -> Chamfer/Hausdorff between scan and TLS cloud.
"""

import numpy as np
from ipcgen_tpu.ops.normals import estimate_normals
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.recon.reconstructor import SurfaceReconstructor
from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.trajectory import Waypoint
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


def _tls_room(rng, n=24000):
    """Dense TLS-style shell cloud of a 4x3x2.5 room (inward surfaces)."""
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32) * [4, 3, 2.5]
    side = rng.integers(0, 6, n)
    for ax, v0, v1 in ((0, 0, 4.0), (1, 0, 3.0), (2, 0, 2.5)):
        pts[side == 2 * ax, ax] = v0
        pts[side == 2 * ax + 1, ax] = v1
    return pts


def test_reconstruct_then_scan_matches_tls(rng):
    tls = _tls_room(rng)
    normals = estimate_normals(tls, radius=0.4, max_nn=16,
                               orient_towards=np.array([2.0, 1.5, 1.25]))
    recon = SurfaceReconstructor(voxel_size=0.12)
    mesh, stats = recon.reconstruct(tls, normals)
    assert stats["output_faces"] > 500

    asset = build_scene_asset(mesh.vertices, mesh.triangles)
    intr = Indoor8LineLidarIntrinsics(
        vertical_res=8, horizontal_res=256,
        vertical_degrees=[15, 10, 5, 0, -5, -10, -15, -20], max_range=20.0,
    )
    poses = waypoints_to_pose_batch(
        [Waypoint(1.5, 1.5, 1.2, 0.0), Waypoint(2.5, 1.5, 1.2, 1.0)]
    )
    batch = scan_waypoints(asset, intr, poses, backend="xla")
    mask = np.asarray(batch.mask)
    assert mask.mean() > 0.9  # closed reconstructed room: nearly all rays hit
    scan_pts = np.asarray(batch.points)[mask]

    # Every simulated-scan point must sit close to the original TLS surface
    # (directed distance scan->TLS; the reverse direction measures sensor
    # coverage, not reconstruction fidelity — an 8-line scan from two poses
    # legitimately leaves TLS regions unseen).
    rng2 = np.random.default_rng(1)
    sel = rng2.choice(len(scan_pts), min(3000, len(scan_pts)), replace=False)
    d = np.linalg.norm(scan_pts[sel][:, None, :] - tls[None, :, :], axis=2).min(axis=1)
    assert np.mean(d) < 2 * recon.voxel_size, np.mean(d)
    assert np.percentile(d, 95) < 4 * recon.voxel_size
