"""Surface reconstruction with an NKSR-compatible API.

The reference delegates surface reconstruction to the NKSR CUDA library
(s3dis_nksr_reconstructor.py:25-155; semantic_mesh_reconstructor.py:14-220).
Exact NKSR (learned kernels) is not reproducible on TPU — per SURVEY.md §7
the substitute is an on-device SDF fusion + isosurface extraction exposing the
same ``reconstruct_mesh(points, normals, colors) -> (mesh, stats)`` contract
with NKSR-compatible stats reporting, validated by the *downstream* metric
(simulated-scan MMD/CD/HD), not mesh-to-mesh identity.

Chunking semantics: NKSR's ``chunked`` mode splits huge scenes spatially
(configs/s3dis_config.yaml:15-16, chunk 60 m); here chunking splits the SDF
fusion into spatial slabs whose triangle soups concatenate before welding —
same interface, TPU-resident throughout.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ipcgen_tpu.containers.mesh import TriMesh
from ipcgen_tpu.ops.marching import marching_tetrahedra, weld_triangle_soup
from ipcgen_tpu.ops.sdf import fuse_point_normal_sdf


def _surface_nn(queries: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """Surface-to-surface 1-NN (budget-gated exact/grid dispatch)."""
    from ipcgen_tpu.ops.knn import nearest_neighbor_auto

    return nearest_neighbor_auto(queries, refs)


class SurfaceReconstructor:
    """Core point+normal -> TriMesh reconstruction."""

    def __init__(
        self,
        voxel_size: float = 0.03,
        splat_radius: int = 2,
        min_weight: float = 1e-3,
        chunked: bool = False,
        chunk_size: float = 60.0,
        mise_iter: int = 0,
    ):
        self.voxel_size = voxel_size
        self.splat_radius = splat_radius
        self.min_weight = min_weight
        self.chunked = chunked
        self.chunk_size = chunk_size
        # MISE-analog refinement steps (reference extract_dual_mesh
        # mise_iter=2, s3dis_nksr_reconstructor.py:89-90): IMLS projection
        # of extracted vertices onto the input cloud's implicit surface.
        self.mise_iter = mise_iter

    # ------------------------------------------------------------------
    def reconstruct(
        self,
        points: np.ndarray,
        normals: Optional[np.ndarray] = None,
        colors: Optional[np.ndarray] = None,
    ) -> Tuple[TriMesh, Dict]:
        """Reconstruct a mesh; returns (mesh, stats dict).

        ``stats`` carries the NKSR-compatible keys
        (reference: s3dis_nksr_reconstructor.py:93-100).
        """
        start = time.time()
        points = np.asarray(points, dtype=np.float32)
        if normals is None:
            # Degraded mode mirrors the reference warning path
            # (s3dis_nksr_reconstructor.py:56-58): estimate normals on device.
            from ipcgen_tpu.ops.normals import estimate_normals

            normals = estimate_normals(points, radius=4 * self.voxel_size, max_nn=30)
        normals = np.asarray(normals, dtype=np.float32)

        spans: Dict[str, float] = {}
        t0 = time.time()
        if self.chunked and self._needs_chunking(points):
            soup = self._reconstruct_chunked_soup(points, normals)
            spans["fuse_and_march"] = time.time() - t0
        else:
            grid = fuse_point_normal_sdf(
                points, normals, voxel_size=self.voxel_size,
                splat_radius=self.splat_radius,
            )
            spans["fuse"] = time.time() - t0
            t0 = time.time()
            soup, _ = marching_tetrahedra(grid, min_weight=self.min_weight)
            spans["march"] = time.time() - t0

        t0 = time.time()
        verts, tris = weld_triangle_soup(soup)
        spans["weld"] = time.time() - t0
        if self.mise_iter > 0 and len(verts):
            from ipcgen_tpu.ops.sdf import imls_project_vertices

            t0 = time.time()
            verts = imls_project_vertices(
                verts, points, normals,
                radius=1.5 * self.voxel_size, iters=self.mise_iter,
            )
            spans["imls"] = time.time() - t0
        mesh = TriMesh(vertices=verts, triangles=tris)
        t0 = time.time()
        self._orient_faces(mesh, points, normals)
        spans["orient"] = time.time() - t0

        if colors is not None and mesh.num_vertices > 0:
            t0 = time.time()
            mesh.vertex_colors = self._transfer_colors(mesh, points, colors)
            spans["colors"] = time.time() - t0

        stats = {
            "input_points": len(points),
            "output_vertices": mesh.num_vertices,
            "output_faces": mesh.num_triangles,
            "reconstruction_time": time.time() - start,
            "spans": {k: round(v, 3) for k, v in spans.items()},
            "has_colors": mesh.vertex_colors is not None,
            "device_used": self._device_name(),
            "voxel_size": self.voxel_size,
            "method": "sdf_fusion+marching_tetrahedra",
            "mise_iter": self.mise_iter,
        }
        return mesh, stats

    def _needs_chunking(self, points: np.ndarray) -> bool:
        extent = points.max(axis=0) - points.min(axis=0)
        return bool(np.any(extent > self.chunk_size))

    def _reconstruct_chunked_soup(self, points, normals) -> np.ndarray:
        """Slab-split fusion along the longest axis; soups concatenate."""
        axis = int(np.argmax(points.max(axis=0) - points.min(axis=0)))
        lo = points[:, axis].min()
        hi = points[:, axis].max()
        n_chunks = int(np.ceil((hi - lo) / self.chunk_size))
        overlap = 4 * self.voxel_size
        soups = []
        for c in range(n_chunks):
            a = lo + c * self.chunk_size
            b = min(a + self.chunk_size, hi)
            sel = (points[:, axis] >= a - overlap) & (points[:, axis] <= b + overlap)
            if sel.sum() < 4:
                continue
            grid = fuse_point_normal_sdf(
                points[sel], normals[sel], voxel_size=self.voxel_size,
                splat_radius=self.splat_radius,
            )
            soup, _ = marching_tetrahedra(grid, min_weight=self.min_weight)
            if len(soup):
                centers = soup.mean(axis=1)
                keep = (centers[:, axis] >= a) & (centers[:, axis] < b)
                soups.append(soup[keep])
        if not soups:
            return np.zeros((0, 3, 3), np.float32)
        return np.concatenate(soups)

    @staticmethod
    def _device_name() -> str:
        import jax

        return str(jax.devices()[0])

    @staticmethod
    def _orient_faces(mesh: TriMesh, points: np.ndarray, normals: np.ndarray) -> None:
        """Flip triangle winding so face normals agree with the nearest input
        normal (marching tetrahedra emits numerically, not consistently,
        wound triangles)."""
        if mesh.num_triangles == 0:
            return
        centroids = mesh.triangle_corners().mean(axis=1).astype(np.float32)
        idx = _surface_nn(centroids, points)
        target = normals[idx]
        fn = mesh.face_normals()
        flip = np.sum(fn * target, axis=1) < 0
        tris = mesh.triangles
        tris[flip] = tris[flip][:, [0, 2, 1]]
        mesh.triangles = tris

    @staticmethod
    def _transfer_colors(mesh: TriMesh, points: np.ndarray, colors: np.ndarray
                         ) -> np.ndarray:
        """1-NN color texture transfer (replaces nksr.fields.PCNNField,
        reference: s3dis_nksr_reconstructor.py:84-87)."""
        idx = _surface_nn(mesh.vertices.astype(np.float32), points.astype(np.float32))
        return np.asarray(colors)[idx]


class S3DISReconstructor:
    """Config-driven reconstructor facade (reference: s3dis_nksr_reconstructor.py:25-155).

    Honors the config's ``detail_level``/``voxel_size``/``chunked``/
    ``chunk_size`` — the reference parsed but ignored detail_level and
    chunk_size in its main path (:71-82); here detail_level scales the
    effective voxel size (smaller detail level -> finer grid).
    """

    def __init__(self, config_dict: Dict):
        self.config = config_dict.get("nksr", config_dict)
        voxel = float(self.config.get("voxel_size", 0.03))
        detail = self.config.get("detail_level", None)
        if detail is not None:
            # detail_level in (0, 1]: 1.0 keeps voxel_size, smaller refines.
            voxel = voxel * float(np.clip(detail / 0.15, 0.25, 2.0))
        self.core = SurfaceReconstructor(
            voxel_size=voxel,
            chunked=bool(self.config.get("chunked", False)),
            chunk_size=float(self.config.get("chunk_size", 60.0)),
            mise_iter=int(self.config.get("mise_iter", 2)),
        )

    def reconstruct_mesh(
        self,
        points,
        normals=None,
        colors=None,
        use_semantic_colors: bool = False,
        s3dis_data_root: Optional[str] = None,
        area: Optional[str] = None,
        room: Optional[str] = None,
    ) -> Tuple[TriMesh, Dict]:
        """Reconstruct with optional semantic color texturing
        (reference: :45-108)."""
        if (
            use_semantic_colors
            and s3dis_data_root is not None
            and area is not None
            and room is not None
        ):
            from ipcgen_tpu.semantic.annotations import get_semantic_colors_from_points

            colors = get_semantic_colors_from_points(
                np.asarray(points), s3dis_data_root, area, room
            )
        return self.core.reconstruct(points, normals, colors)

    def save_mesh(self, mesh: TriMesh, output_path, stats: Optional[Dict] = None) -> bool:
        """PLY + .json stats sidecar (reference: :114-155)."""
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        mesh.compute_vertex_normals()
        mesh.save(output_path)
        if stats is not None:
            with open(output_path.with_suffix(".json"), "w") as f:
                json.dump(stats, f, indent=2)
        return True


class SemanticMeshReconstructor:
    """Label-colored reconstruction (reference: semantic_mesh_reconstructor.py:14-220,
    with its encode_labels-vs-encode_labels_to_colors bug fixed)."""

    def __init__(self, num_classes: int = 13, device: Optional[str] = None,
                 **recon_kwargs):
        from ipcgen_tpu.semantic.color_encoder import SemanticColorEncoder

        self.color_encoder = SemanticColorEncoder(num_classes=num_classes)
        self.core = SurfaceReconstructor(**recon_kwargs)

    def reconstruct_with_semantics(
        self, points, normals, labels,
        detail_level: Optional[float] = None,
        voxel_size: Optional[float] = None,
    ) -> Tuple[TriMesh, Dict]:
        if voxel_size is not None:
            self.core.voxel_size = voxel_size
        colors = self.color_encoder.encode_labels_to_colors(np.asarray(labels))
        mesh, stats = self.core.reconstruct(points, normals, colors)
        stats["num_classes"] = self.color_encoder.num_classes
        return mesh, stats

    def save_semantic_mesh(self, mesh: TriMesh, output_path, stats=None) -> bool:
        """PLY + colormap txt sidecar (reference: :185-220)."""
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        mesh.save(output_path)
        cmap_path = output_path.with_suffix(".colormap.txt")
        with open(cmap_path, "w") as f:
            f.write("label_id r g b\n")
            for i, c in enumerate(self.color_encoder.colormap):
                f.write(f"{i} {c[0]} {c[1]} {c[2]}\n")
        if stats is not None:
            with open(output_path.with_suffix(".json"), "w") as f:
                json.dump(stats, f, indent=2)
        return True

    def decode_mesh_labels(self, mesh: TriMesh) -> Optional[np.ndarray]:
        if mesh.vertex_colors is None:
            return None
        return self.color_encoder.decode_colors(mesh.vertex_colors)


class S3DISEvaluator:
    """Reconstruction-quality evaluation (reference: s3dis_nksr_reconstructor.py:267-335)."""

    def __init__(self, config_dict: Dict):
        self.config = config_dict.get("evaluation", config_dict)

    def evaluate_reconstruction_quality(
        self, mesh: TriMesh, original_points: np.ndarray, original_colors=None
    ) -> Dict:
        metrics: Dict = {}
        n_sample = min(len(original_points), int(self.config.get("max_eval_points", 100000)))
        if self.config.get("compute_chamfer", True):
            from ipcgen_tpu.ops.metrics import chamfer_distance_mean
            from ipcgen_tpu.ops.sampling import sample_points_poisson_disk

            # Blue-noise surface sampling, as the reference's Open3D
            # sample_points_poisson_disk (s3dis_nksr_reconstructor.py:293-295)
            sampled = sample_points_poisson_disk(mesh, n_sample)
            pts = np.asarray(original_points)
            if len(pts) > n_sample:
                # Uniform random subsample — a head slice is order-biased
                # (room loaders concatenate surfaces part by part).
                sel = np.random.default_rng(0).choice(
                    len(pts), n_sample, replace=False
                )
                pts = pts[sel]
            metrics["chamfer_distance"] = chamfer_distance_mean(
                pts, sampled, max_points=n_sample
            )
        if self.config.get("compute_mesh_quality", True):
            metrics["mesh_vertices"] = mesh.num_vertices
            metrics["mesh_faces"] = mesh.num_triangles
            metrics["surface_area"] = mesh.surface_area()
            watertight = self._is_watertight(mesh)
            metrics["is_watertight"] = watertight
            # Open meshes (the weight mask ends at unobserved regions, as
            # with NKSR) still get a meaningful volume: faces are oriented
            # consistently (SurfaceReconstructor._orient_faces), so the
            # divergence-theorem sum is a proxy whose error is the flux
            # through the boundary holes.
            volume = abs(mesh.signed_volume())
            metrics["volume"] = volume
            metrics["volume_method"] = (
                "exact_watertight" if watertight else "divergence_proxy_open"
            )
        return metrics

    @staticmethod
    def _is_watertight(mesh: TriMesh) -> bool:
        """Every edge shared by exactly two triangles."""
        if mesh.num_triangles == 0:
            return False
        t = mesh.triangles
        edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        return bool(np.all(counts == 2))
