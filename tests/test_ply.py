"""PLY codec tests: round trips + byte-compat with the reference labeled writer."""

import struct

import numpy as np

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.io import (
    read_labeled_ply,
    read_point_cloud,
    read_triangle_mesh,
    write_labeled_ply,
    write_point_cloud,
    write_triangle_mesh,
)


def _reference_labeled_ply_bytes(points, colors, sem, ins):
    """Byte stream the reference writer produces (s3dis_sim_scene.py:614-641)."""
    out = bytearray()
    out += b"ply\n"
    out += b"format binary_little_endian 1.0\n"
    out += b"element vertex %d\n" % len(points)
    out += b"property float x\n"
    out += b"property float y\n"
    out += b"property float z\n"
    out += b"property uchar red\n"
    out += b"property uchar green\n"
    out += b"property uchar blue\n"
    out += b"property ushort sem\n"
    out += b"property ushort ins\n"
    out += b"end_header\n"
    for i in range(len(points)):
        out += struct.pack("<fff", points[i, 0], points[i, 1], points[i, 2])
        out += struct.pack("<BBB", colors[i, 0], colors[i, 1], colors[i, 2])
        out += struct.pack("<HH", sem[i], ins[i])
    return bytes(out)


def test_labeled_ply_byte_identical(tmp_path, rng):
    n = 137
    points = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    sem = rng.integers(0, 30, size=n).astype(np.uint16)
    ins = rng.integers(0, 20, size=n).astype(np.uint16)

    path = tmp_path / "labeled.ply"
    write_labeled_ply(path, points, colors, sem, ins)
    ours = path.read_bytes()
    assert ours == _reference_labeled_ply_bytes(points, colors, sem, ins)


def test_labeled_ply_round_trip(tmp_path, rng):
    n = 513
    points = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    sem = rng.integers(0, 40, size=n).astype(np.uint16)
    ins = rng.integers(0, 25, size=n).astype(np.uint16)

    path = tmp_path / "rt.ply"
    write_labeled_ply(path, points, colors, sem, ins)
    p2, c2, s2, i2 = read_labeled_ply(path)
    np.testing.assert_array_equal(p2, points)
    np.testing.assert_array_equal(c2, colors)
    np.testing.assert_array_equal(s2, sem)
    np.testing.assert_array_equal(i2, ins)


def test_point_cloud_round_trip(tmp_path, rng):
    points = rng.normal(size=(64, 3))
    colors = rng.uniform(size=(64, 3))
    normals = rng.normal(size=(64, 3))
    path = tmp_path / "pc.ply"
    write_point_cloud(path, points, colors=colors, normals=normals)
    p2, c2, n2 = read_point_cloud(path)
    np.testing.assert_allclose(p2, points, atol=1e-6)
    np.testing.assert_allclose(c2, colors, atol=1.0 / 255.0)
    np.testing.assert_allclose(n2, normals, atol=1e-6)


def test_point_cloud_double_precision(tmp_path, rng):
    points = rng.normal(size=(16, 3)) * 1e3
    path = tmp_path / "pc64.ply"
    write_point_cloud(path, points, coord_dtype="double")
    p2, _, _ = read_point_cloud(path)
    np.testing.assert_allclose(p2, points, atol=0)


def test_mesh_round_trip(tmp_path):
    mesh = TriMesh.box(center=(1, 2, 3), size=(2, 3, 4))
    path = tmp_path / "mesh.ply"
    write_triangle_mesh(path, mesh.vertices, mesh.triangles)
    v, t, _ = read_triangle_mesh(path)
    np.testing.assert_allclose(v, mesh.vertices, atol=1e-5)
    np.testing.assert_array_equal(t, mesh.triangles)


def test_mesh_with_colors_round_trip(tmp_path, rng):
    mesh = TriMesh.box()
    colors = rng.uniform(size=(mesh.num_vertices, 3))
    path = tmp_path / "meshc.ply"
    write_triangle_mesh(path, mesh.vertices, mesh.triangles, vertex_colors=colors)
    v, t, c = read_triangle_mesh(path)
    assert c is not None
    np.testing.assert_allclose(c, colors, atol=1.0 / 255.0)


def test_ascii_ply(tmp_path):
    content = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""
    path = tmp_path / "ascii.ply"
    path.write_text(content)
    v, t, _ = read_triangle_mesh(path)
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(t, [[0, 1, 2]])


def test_trimesh_geometry():
    mesh = TriMesh.box(size=(2.0, 2.0, 2.0))
    assert np.isclose(mesh.surface_area(), 6 * 4.0)
    assert np.isclose(abs(mesh.signed_volume()), 8.0)
    lo, hi = mesh.bounds()
    np.testing.assert_allclose(hi - lo, [2, 2, 2])
    vn = mesh.compute_vertex_normals()
    assert np.allclose(np.linalg.norm(vn, axis=1), 1.0)
