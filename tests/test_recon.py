"""Surface reconstruction substitute tests (SDF fusion + marching tetrahedra)."""

import numpy as np
import pytest

from ipcgen_tpu.ops.marching import marching_tetrahedra, weld_triangle_soup
from ipcgen_tpu.ops.sampling import sample_points_on_mesh
from ipcgen_tpu.ops.sdf import fuse_point_normal_sdf
from ipcgen_tpu.recon.reconstructor import (
    S3DISEvaluator,
    S3DISReconstructor,
    SemanticMeshReconstructor,
    SurfaceReconstructor,
)


def _sphere_cloud(rng, n=4000, radius=1.0):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    points = (v * radius).astype(np.float32)
    normals = v.astype(np.float32)  # outward
    return points, normals


def _plane_cloud(rng, n=3000):
    pts = np.zeros((n, 3), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 2, n)
    pts[:, 1] = rng.uniform(0, 2, n)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    return pts, normals


def test_sdf_sign_structure_sphere(rng):
    points, normals = _sphere_cloud(rng, radius=1.0)
    grid = fuse_point_normal_sdf(points, normals, voxel_size=0.1, splat_radius=2)
    sdf = np.asarray(grid.sdf)
    w = np.asarray(grid.weight)
    # Voxel at a known inside location near the surface band
    def sdf_at(p):
        idx = np.floor((np.asarray(p) - grid.origin) / grid.voxel_size).astype(int)
        return sdf[tuple(idx)], w[tuple(idx)]

    s_in, w_in = sdf_at([0.9, 0, 0])
    s_out, w_out = sdf_at([1.12, 0, 0])
    assert w_in > 0 and w_out > 0
    assert s_in < 0 < s_out


def test_marching_tetra_sphere_surface(rng):
    points, normals = _sphere_cloud(rng, n=6000, radius=1.0)
    grid = fuse_point_normal_sdf(points, normals, voxel_size=0.08, splat_radius=2)
    soup, _ = marching_tetrahedra(grid)
    assert len(soup) > 100
    # Every emitted vertex lies near the unit sphere
    r = np.linalg.norm(soup.reshape(-1, 3), axis=1)
    assert np.percentile(np.abs(r - 1.0), 95) < 0.1


def test_weld_triangle_soup():
    tri1 = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tri2 = np.array([[[1, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float32)
    soup = np.concatenate([tri1, tri2])
    verts, tris = weld_triangle_soup(soup)
    assert len(verts) == 4  # shared edge verts welded
    assert len(tris) == 2


def test_reconstruct_sphere_end_to_end(rng):
    points, normals = _sphere_cloud(rng, n=6000)
    recon = SurfaceReconstructor(voxel_size=0.08)
    mesh, stats = recon.reconstruct(points, normals)
    assert stats["input_points"] == 6000
    assert stats["output_faces"] > 100
    assert stats["reconstruction_time"] > 0
    assert mesh.num_vertices == stats["output_vertices"]
    # Surface accuracy
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(r) - 1.0) < 0.05
    # Face orientation matches the input normals (outward)
    fn = mesh.face_normals()
    centroids = mesh.triangle_corners().mean(axis=1)
    outward = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    assert np.mean(np.sum(fn * outward, axis=1) > 0) > 0.95
    # Chamfer between input cloud and mesh sampling is small
    ev = S3DISEvaluator({"evaluation": {"max_eval_points": 2000,
                                        "compute_chamfer": True,
                                        "compute_mesh_quality": True}})
    metrics = ev.evaluate_reconstruction_quality(mesh, points)
    assert metrics["chamfer_distance"] < 0.1
    assert metrics["surface_area"] == pytest.approx(4 * np.pi, rel=0.2)


def test_reconstruct_without_normals(rng):
    points, _ = _plane_cloud(rng)
    recon = SurfaceReconstructor(voxel_size=0.1)
    mesh, stats = recon.reconstruct(points, normals=None)
    assert stats["output_faces"] > 0
    # Reconstructed plane sits near z=0
    assert np.abs(mesh.vertices[:, 2]).max() < 0.15


def test_color_transfer(rng):
    points, normals = _sphere_cloud(rng, n=4000)
    colors = (points + 1) / 2  # position-coded colors
    recon = SurfaceReconstructor(voxel_size=0.1)
    mesh, stats = recon.reconstruct(points, normals, colors)
    assert stats["has_colors"]
    assert mesh.vertex_colors.shape == (mesh.num_vertices, 3)
    # Colors follow position
    expect = (mesh.vertices / np.linalg.norm(mesh.vertices, axis=1, keepdims=True) + 1) / 2
    err = np.abs(mesh.vertex_colors - expect).mean()
    assert err < 0.1


def test_s3dis_reconstructor_facade(rng, tmp_path):
    points, normals = _sphere_cloud(rng, n=3000)
    cfg = {"nksr": {"detail_level": 0.15, "voxel_size": 0.1, "chunked": False,
                    "chunk_size": 60.0, "device": "auto"}}
    recon = S3DISReconstructor(cfg)
    mesh, stats = recon.reconstruct_mesh(points, normals)
    assert stats["output_faces"] > 0
    out = tmp_path / "mesh_dense.ply"
    assert recon.save_mesh(mesh, out, stats)
    assert out.exists() and out.with_suffix(".json").exists()
    from ipcgen_tpu.containers import TriMesh

    loaded = TriMesh.load(out)
    assert loaded.num_triangles == mesh.num_triangles


def test_semantic_mesh_reconstructor(rng, tmp_path):
    points, normals = _sphere_cloud(rng, n=3000)
    labels = (points[:, 2] > 0).astype(np.int32) * 8  # two classes: 0 / chair
    smr = SemanticMeshReconstructor(num_classes=13, voxel_size=0.1)
    mesh, stats = smr.reconstruct_with_semantics(points, normals, labels)
    assert stats["num_classes"] == 13
    assert mesh.vertex_colors is not None
    out = tmp_path / "semantic.ply"
    assert smr.save_semantic_mesh(mesh, out, stats)
    assert out.with_suffix(".colormap.txt").exists()
    decoded = smr.decode_mesh_labels(mesh)
    # Top hemisphere decodes to class 8, bottom to 0 (majority-wise)
    top = decoded[mesh.vertices[:, 2] > 0.3]
    bottom = decoded[mesh.vertices[:, 2] < -0.3]
    assert (top == 8).mean() > 0.9
    assert (bottom == 0).mean() > 0.9


def test_chunked_reconstruction(rng):
    # A long plane strip forces chunking with a small chunk_size
    pts = np.zeros((4000, 3), np.float32)
    pts[:, 0] = rng.uniform(0, 6, 4000)
    pts[:, 1] = rng.uniform(0, 1, 4000)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4000, 1))
    recon = SurfaceReconstructor(voxel_size=0.12, chunked=True, chunk_size=2.0)
    mesh, stats = recon.reconstruct(pts, normals)
    assert stats["output_faces"] > 0
    # Coverage spans (most of) the strip despite chunking
    assert mesh.vertices[:, 0].max() - mesh.vertices[:, 0].min() > 4.5


def test_sample_points_on_mesh(box_room):
    pts = sample_points_on_mesh(box_room, 5000)
    assert pts.shape == (5000, 3)
    # Samples lie on the box surface
    on_face = (
        np.isclose(pts[:, 0], 0, atol=1e-4) | np.isclose(pts[:, 0], 4, atol=1e-4)
        | np.isclose(pts[:, 1], 0, atol=1e-4) | np.isclose(pts[:, 1], 3, atol=1e-4)
        | np.isclose(pts[:, 2], 0, atol=1e-4) | np.isclose(pts[:, 2], 2.5, atol=1e-4)
    )
    assert on_face.all()
    # Area-weighted: the two largest faces (z) get the most samples
    frac_z = (np.isclose(pts[:, 2], 0, atol=1e-4) | np.isclose(pts[:, 2], 2.5, atol=1e-4)).mean()
    area_z = 2 * 4 * 3
    total = 2 * (4 * 3 + 4 * 2.5 + 3 * 2.5)
    assert abs(frac_z - area_z / total) < 0.05


def test_watertight_check(box_room):
    ev = S3DISEvaluator({})
    assert ev._is_watertight(box_room)
    from ipcgen_tpu.containers import TriMesh

    open_mesh = TriMesh(box_room.vertices, box_room.triangles[:-1])
    assert not ev._is_watertight(open_mesh)


def test_poisson_disk_sampling_spacing(rng):
    """Blue-noise sampler: near-uniform spacing, no tight clusters."""
    from ipcgen_tpu.containers import TriMesh
    from ipcgen_tpu.ops.sampling import (
        sample_points_on_mesh,
        sample_points_poisson_disk,
    )

    mesh = TriMesh.box(center=(0, 0, 0), size=(2.0, 2.0, 2.0))
    n = 1500
    pd = sample_points_poisson_disk(mesh, n)
    un = sample_points_on_mesh(mesh, n)
    assert len(pd) == n

    def min_nn(pts):
        d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1)

    # Poisson-disk minimum spacing distribution is much tighter than uniform:
    # its 1st percentile nearest-neighbor distance must beat uniform's.
    assert np.percentile(min_nn(pd), 1) > 2 * np.percentile(min_nn(un), 1)
    # All samples still lie on the box surface
    assert np.all(np.isclose(np.abs(pd), 1.0, atol=1e-5).any(axis=1))
