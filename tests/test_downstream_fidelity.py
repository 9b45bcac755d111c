"""Downstream fidelity: reconstruction validated by the scan-vs-TLS metrics.

SURVEY.md §7: the NKSR substitute must be validated by the *downstream*
metric (simulated-scan distances vs the source cloud), not mesh-to-mesh
identity.  This test runs the full cycle: TLS cloud -> SDF reconstruction ->
LiDAR scan of the mesh -> Chamfer/Hausdorff between scan and TLS cloud.

Reconstructions are shared through module-scope fixtures (each one costs
minutes on CPU; round 2 recomputed them per test and the suite ballooned to
~22 min).  The voxel-0.02 cluttered rerun duplicates the 0.04 coverage at 4x
the cost, so it is marked ``slow`` (``--runslow`` includes it).  Cloud
densities are sized to keep the nearest-distance floor (~half the point
spacing) several times below the voxel-scaled assertions while the 1-core
CPU suite stays fast: 14k points over ~59 m^2 floors the directed distance
at ~0.03 m against a 0.24 m threshold.
"""

import numpy as np
import pytest
from ipcgen_tpu.ops.normals import estimate_normals
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.recon.reconstructor import SurfaceReconstructor
from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.trajectory import Waypoint
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


def _tls_room(rng, n=14000):
    """Dense TLS-style shell cloud of a 4x3x2.5 room (inward surfaces)."""
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32) * [4, 3, 2.5]
    side = rng.integers(0, 6, n)
    for ax, v0, v1 in ((0, 0, 4.0), (1, 0, 3.0), (2, 0, 2.5)):
        pts[side == 2 * ax, ax] = v0
        pts[side == 2 * ax + 1, ax] = v1
    return pts


@pytest.fixture(scope="module")
def room_cloud():
    rng = np.random.default_rng(0)
    tls = _tls_room(rng)
    normals = estimate_normals(tls, radius=0.4, max_nn=16,
                               orient_towards=np.array([2.0, 1.5, 1.25]))
    return tls, normals


@pytest.fixture(scope="module")
def room_recon(room_cloud):
    """One shared voxel-0.12 reconstruction of the plain room (no MISE)."""
    tls, normals = room_cloud
    recon = SurfaceReconstructor(voxel_size=0.12)
    mesh, stats = recon.reconstruct(tls, normals)
    return mesh, stats, recon.voxel_size


def _directed_scan_to_tls(scan_pts, tls, n_sample, seed=1):
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(scan_pts), min(n_sample, len(scan_pts)),
                     replace=False)
    return np.linalg.norm(
        scan_pts[sel][:, None, :] - tls[None, :, :], axis=2
    ).min(axis=1)


def test_reconstruct_then_scan_matches_tls(room_cloud, room_recon):
    tls, _ = room_cloud
    mesh, stats, voxel = room_recon
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
    d = _directed_scan_to_tls(scan_pts, tls, 3000)
    assert np.mean(d) < 2 * voxel, np.mean(d)
    assert np.percentile(d, 95) < 4 * voxel


def _tls_cluttered_room(rng, n_shell=12000, n_box=2500):
    """TLS-style cloud of a 2.4 x 1.8 x 1.6 room with two furniture boxes
    (concavity + occluded regions behind them)."""
    pts = rng.uniform(0, 1, (n_shell, 3)).astype(np.float32) * [2.4, 1.8, 1.6]
    side = rng.integers(0, 6, n_shell)
    for ax, v0, v1 in ((0, 0, 2.4), (1, 0, 1.8), (2, 0, 1.6)):
        pts[side == 2 * ax, ax] = v0
        pts[side == 2 * ax + 1, ax] = v1
    boxes = [((0.5, 0.5, 0.0), (0.5, 0.4, 0.6)),
             ((1.6, 1.2, 0.0), (0.4, 0.4, 0.9))]
    clouds = [pts]
    for (bx, by, bz), (sx, sy, sz) in boxes:
        q = rng.uniform(0, 1, (n_box, 3)).astype(np.float32) * [sx, sy, sz]
        bside = rng.integers(0, 5, n_box)  # no bottom face (sits on floor)
        q[bside == 0, 0] = 0.0
        q[bside == 1, 0] = sx
        q[bside == 2, 1] = 0.0
        q[bside == 3, 1] = sy
        q[bside == 4, 2] = sz
        clouds.append(q + [bx, by, bz])
    return np.concatenate(clouds)


@pytest.fixture(scope="module")
def cluttered_cloud():
    rng = np.random.default_rng(0)
    tls = _tls_cluttered_room(rng)
    normals = estimate_normals(tls, radius=0.15, max_nn=16,
                               orient_towards=np.array([1.2, 0.9, 0.8]))
    return tls, normals


def _run_cluttered(tls, normals, voxel):
    """Concave, occluded geometry at the reference's working resolutions
    (config voxel 0.03, hard-coded 0.02): every simulated-scan point must
    sit near the original TLS surface."""
    recon = SurfaceReconstructor(voxel_size=voxel, mise_iter=2)
    mesh, stats = recon.reconstruct(tls, normals)
    assert stats["output_faces"] > 2000
    assert stats["mise_iter"] == 2

    asset = build_scene_asset(mesh.vertices, mesh.triangles)
    intr = Indoor8LineLidarIntrinsics(
        vertical_res=8, horizontal_res=192,
        vertical_degrees=[15, 10, 5, 0, -5, -10, -15, -20], max_range=20.0,
    )
    poses = waypoints_to_pose_batch(
        [Waypoint(0.3, 0.3, 0.8, 0.8), Waypoint(1.9, 0.9, 0.8, 3.0)]
    )
    batch = scan_waypoints(asset, intr, poses, backend="xla")
    mask = np.asarray(batch.mask)
    assert mask.mean() > 0.85
    scan_pts = np.asarray(batch.points)[mask]

    d = _directed_scan_to_tls(scan_pts, tls, 2500)
    assert np.mean(d) < 2 * voxel, np.mean(d)
    assert np.percentile(d, 95) < 4 * voxel


def test_reconstruct_then_scan_cluttered(cluttered_cloud):
    _run_cluttered(*cluttered_cloud, voxel=0.04)


@pytest.mark.slow
def test_reconstruct_then_scan_cluttered_fine(cluttered_cloud):
    # Same assertions at the reference's hard-coded 0.02 resolution — ~4x
    # the 0.04 run's cost for the same code paths, hence slow-marked.
    _run_cluttered(*cluttered_cloud, voxel=0.02)


def test_mise_refinement_improves_surface(room_cloud, room_recon):
    """IMLS vertex projection (the extract_dual_mesh mise_iter analog) must
    tighten mesh vertices toward the input surface."""
    tls, normals = room_cloud

    def vertex_err(mesh):
        v = mesh.vertices
        rng2 = np.random.default_rng(0)
        sel = rng2.choice(len(v), min(1500, len(v)), replace=False)
        return np.linalg.norm(
            v[sel][:, None, :] - tls[None, :, :], axis=2
        ).min(axis=1).mean()

    mesh0, _, _ = room_recon  # shared mise_iter=0 reconstruction
    mesh2, _ = SurfaceReconstructor(
        voxel_size=0.12, mise_iter=2
    ).reconstruct(tls, normals)
    e0, e2 = vertex_err(mesh0), vertex_err(mesh2)
    # nearest-TLS-point distance floors at the cloud's ~6 cm point spacing,
    # so the attainable reduction is bounded; 20% is well beyond noise.
    assert e2 < 0.8 * e0, (e0, e2)


def test_volume_metric_not_constant(room_cloud, room_recon):
    """Open reconstructed meshes report a divergence-proxy volume instead of
    the r1 constant -1."""
    from ipcgen_tpu.recon.reconstructor import S3DISEvaluator

    tls, _ = room_cloud
    mesh, _, _ = room_recon
    ev = S3DISEvaluator({"evaluation": {"compute_chamfer": False,
                                        "compute_mesh_quality": True}})
    m = ev.evaluate_reconstruction_quality(mesh, tls)
    assert m["volume"] > 0, m
    # 4 x 3 x 2.5 room = 30 m^3; proxy within 40%
    assert 0.6 * 30 < m["volume"] < 1.4 * 30, m["volume"]
    assert m["volume_method"] in ("exact_watertight", "divergence_proxy_open")
