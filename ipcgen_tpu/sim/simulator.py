"""S3DIS simulation orchestration.

API-parity rewrite of reference s3dis_simulator.py:36-811 over the TPU-native
stack.  The per-waypoint Python loop (reference :254-288 — fresh lidar object,
fresh Embree BVH, per-ray Python generation each frame) becomes ONE fused
device batch: the scene asset is built once at load_scene and the whole
trajectory is scanned by ipcgen_tpu.sim.scan.scan_waypoints.

Reference bugs resolved rather than copied (SURVEY.md §7):
- SmartTrajectoryGenerator / PathType exist (trajectory.smart);
- run_single_scene_simulation's manual branch no longer re-runs the complete
  simulation with unbound variables (reference :530-550).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.containers import (
    RoomBounds,
    S3DISScene,
    S3DISSimFrame,
    S3DISSimScene,
    ScanQuality,
    TriMesh,
)
from ipcgen_tpu.containers.sim_scene import (
    LabelPrefetch,
    claim_prewarmed_labels,
)
from ipcgen_tpu.models import (
    DualAxisLidarIntrinsics,
    Indoor8LineLidarIntrinsics,
    create_lidar,
)
from ipcgen_tpu.ops.scene_asset import SceneAsset, build_scene_asset
from ipcgen_tpu.sim.engine import RaycastEngineCPU, RaycastEngineTPU
from ipcgen_tpu.sim.scan import scan_waypoints
from ipcgen_tpu.trajectory import (
    AutoTrajectoryGenerator,
    CollisionDetector,
    PathType,
    SmartTrajectoryGenerator,
    Waypoint,
)
from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch


class S3DISSimulator:
    """High-level simulator orchestrating the full scanning workflow
    (reference: s3dis_simulator.py:36-444)."""

    def __init__(
        self,
        config: Dict[str, Any],
        use_dense_lidar: bool = False,
        use_blk2go: bool = False,
    ):
        self.config = config
        self.use_dense_lidar = use_dense_lidar
        self.use_blk2go = use_blk2go
        self.scene: Optional[S3DISScene] = None
        self.scene_asset: Optional[SceneAsset] = None
        self.lidar_config = None
        self.raycast_engine = None
        self.trajectory_generator: Optional[SmartTrajectoryGenerator] = None
        self.auto_trajectory_generator: Optional[AutoTrajectoryGenerator] = None
        self.collision_detector: Optional[CollisionDetector] = None
        self.rng_key = jax.random.PRNGKey(int(config.get("seed", 0)))

        # Visualization utilities (lazy; headless matplotlib)
        from ipcgen_tpu.viz import (
            MeshVisualizer,
            ScanResultVisualizer,
            TrajectoryVisualizer,
        )

        self.trajectory_visualizer = TrajectoryVisualizer()
        self.scan_visualizer = ScanResultVisualizer()
        self.mesh_visualizer = MeshVisualizer()

        self._initialize_components()

    def _initialize_components(self) -> None:
        """Select LiDAR profile + engine (reference: :57-78)."""
        _enable_compilation_cache(self.config)
        if self.use_blk2go:
            self.lidar_config = DualAxisLidarIntrinsics.create_blk2go_dual_axis()
        elif self.use_dense_lidar:
            self.lidar_config = Indoor8LineLidarIntrinsics.create_dense_32line()
        else:
            self.lidar_config = Indoor8LineLidarIntrinsics.create_standard_8line()
        hres = (self.config.get("lidar", {}) or {}).get("horizontal_res")
        if hres and hasattr(self.lidar_config, "horizontal_res"):
            # Config-tree analog of the reference's create_custom_lidar
            # (lidar_intrinsics.py:319): same profile, different azimuth
            # density.  Dual-axis profiles size by point rate instead.
            self.lidar_config.horizontal_res = int(hres)

        use_gpu = self.config.get("raycast_engine", {}).get("use_gpu", True)
        if use_gpu:
            try:
                self.raycast_engine = RaycastEngineTPU()
            except Exception:
                self.raycast_engine = RaycastEngineCPU()
        else:
            self.raycast_engine = RaycastEngineCPU()
        self.collision_detector = CollisionDetector()

    # ------------------------------------------------------------------
    def load_scene(self, scene_path: str, scene_name: Optional[str] = None) -> S3DISScene:
        """Load a reconstructed mesh, build the resident scene asset, and
        prepare trajectory generators (reference: :80-130)."""
        mesh = TriMesh.load(scene_path)
        if mesh.num_vertices == 0:
            raise ValueError(f"Failed to load mesh file: {scene_path}")

        room_bounds_obj = RoomBounds.from_mesh(mesh)
        if scene_name is None:
            scene_name = Path(scene_path).stem
        self.scene = S3DISScene(scene_name, mesh, room_bounds=room_bounds_obj)

        # Built ONCE here; resident in HBM for the whole trajectory (the
        # reference instead rebuilt its BVH on every cast_rays call).
        self.scene_asset = build_scene_asset(mesh.vertices, mesh.triangles)

        # Start loading this room's annotation/label data in the background
        # NOW: the labeled export needs it only after the scan completes, so
        # its ~2-3 s disk parse hides behind trajectory planning + the scan
        # (the native parser is a GIL-releasing ctypes call).
        root = self.config.get("s3dis_data_root")
        area, room = self.config.get("area"), self.config.get("room")
        # A batch driver may have prewarmed this room's labels while the
        # recon stage ran (containers.sim_scene.prewarm_labels) — claim
        # that; otherwise start the prefetch now.
        self._label_prefetch = claim_prewarmed_labels(root, area, room)
        if self._label_prefetch is None:
            self._label_prefetch = (
                LabelPrefetch(root, area, room)
                if root and area and room else None
            )

        self.trajectory_generator = SmartTrajectoryGenerator(
            room_bounds_obj.to_dict(),
            robot_height=self.config.get("trajectory", {}).get("robot_height", 1.0),
        )
        self.auto_trajectory_generator = AutoTrajectoryGenerator(
            robot_radius=0.15,  # narrow-space default (reference: :128)
            seed=self.config.get("seed"),
            occupancy_mode=self.config.get("trajectory", {}).get(
                "occupancy_mode", "vertices"
            ),
            scene_asset=self.scene_asset,
        )
        return self.scene

    def generate_auto_trajectory(
        self, num_waypoints: int = 20
    ) -> Tuple[List[Waypoint], Dict[str, Any]]:
        """Coverage-maximizing automatic trajectory (reference: :132-167)."""
        if self.auto_trajectory_generator is None or self.scene is None:
            raise ValueError("Scene not loaded. Call load_scene() first.")
        waypoints, analysis_info = (
            self.auto_trajectory_generator.generate_optimal_trajectory(
                mesh=self.scene.room_mesh,
                room_bounds=self.scene.room_bounds.to_dict(),
                num_waypoints=num_waypoints,
            )
        )
        return waypoints, analysis_info

    def add_furniture(self, furniture_mesh, name: str, category: str = "unknown") -> None:
        """Register furniture for planning (reference: :169-179)."""
        if self.collision_detector is None:
            raise ValueError("Scene not loaded. Call load_scene() first.")
        self.collision_detector.add_furniture_from_mesh(furniture_mesh, name, category)

    def generate_trajectory(
        self,
        start_point: Tuple[float, float, float],
        end_point: Tuple[float, float, float],
        path_type: PathType = PathType.STRAIGHT,
        num_waypoints: int = 20,
    ) -> Tuple[List[Waypoint], Dict[str, Any]]:
        """Manual trajectory between two poses (reference: :180-218)."""
        if self.trajectory_generator is None:
            raise ValueError("Scene not loaded. Call load_scene() first.")
        if self.collision_detector and self.collision_detector.furniture_list:
            self.trajectory_generator.collision_detector = self.collision_detector
        waypoints, quality = self.trajectory_generator.generate_trajectory(
            start_point=start_point,
            end_point=end_point,
            path_type=path_type,
            num_waypoints=num_waypoints,
        )
        return waypoints, quality.to_dict()

    # ------------------------------------------------------------------
    def dispatch_scan(self, waypoints: List[Waypoint], device=None):
        """Launch the fused multi-waypoint scan (async JAX dispatch).

        With ``device`` the scene asset, poses, and PRNG key are committed to
        that device so the compiled scan executes there — several rooms'
        scans dispatched on different chips then run concurrently (the
        room-level DP axis, SURVEY.md §2.4 "one room per chip").  Without
        ``device`` placement follows the default (opt-in multi-chip ray-DP
        shards one room's rays instead).
        """
        if self.scene is None or self.scene_asset is None:
            raise ValueError("Scene not loaded. Call load_scene() first.")
        poses = waypoints_to_pose_batch(waypoints)
        self.rng_key, scan_key = jax.random.split(self.rng_key)
        # Multi-chip ray-DP is opt-in: the production topology for room
        # batches is room-level DP with the per-chip Pallas kernel; sharding
        # one room's rays across chips is for single-room latency or meshes
        # exceeding one chip's HBM.
        multichip = self.config.get("raycast_engine", {}).get("multichip", False)
        if device is None and bool(multichip) and len(jax.devices()) > 1:
            from ipcgen_tpu.parallel.shard import (
                make_device_mesh,
                scan_waypoints_sharded,
            )

            device_mesh = make_device_mesh()
            return scan_waypoints_sharded(
                self.scene_asset, self.lidar_config, poses, device_mesh,
                key=scan_key,
                backend=self.config.get("raycast_engine", {}).get(
                    "backend", "auto"
                ),
                apply_range_noise=bool(
                    self.config.get("apply_range_noise", False)
                ),
            )
        if device is not None:
            self.scene_asset = jax.device_put(self.scene_asset, device)
            poses = jax.device_put(jnp.asarray(poses, jnp.float32), device)
            scan_key = jax.device_put(scan_key, device)
        return scan_waypoints(
            self.scene_asset,
            self.lidar_config,
            poses,
            key=scan_key,
            backend=self.config.get("raycast_engine", {}).get("backend", "auto"),
            apply_range_noise=bool(self.config.get("apply_range_noise", False)),
            # collect_scan consumes only points + mask and derives angles/
            # ranges host-side; skipping the angle/normal outputs lets XLA
            # DCE the finalize gather, and "unordered" drops the remaining
            # inverse permutations too (collect_scan only mask-selects per
            # waypoint, so the in-waypoint ray order is immaterial).
            outputs="unordered",
        )

    def collect_scan(
        self, batch, waypoints: List[Waypoint], start_time: float
    ) -> S3DISSimScene:
        """Block on a dispatched scan and build the S3DISSimScene (reference
        per-frame quality formulas preserved exactly, :276-284)."""
        sim_scene = S3DISSimScene(
            scene_name=self.scene.scene_name,
            simulation_config=self.config,
            mesh=self.scene.room_mesh,
            s3dis_data_root=self.config.get("s3dis_data_root", None),
            area=self.config.get("area", None),
            room=self.config.get("room", None),
            label_prefetch=getattr(self, "_label_prefetch", None),
        )
        # The scene owns the prefetch now; dropping the simulator's handle
        # lets its pinned room cloud + grid free with the scene.
        self._label_prefetch = None
        total_points_per_scan = self.lidar_config.get_total_points_per_scan()
        room_volume = self.scene.room_bounds.get_volume()
        # Download only points + mask (~60% of the full batch): incident
        # angles and sensor ranges are exact functions of (point - origin)
        # — the reference itself derives the angle from the points
        # (raycast_engine_cpu.py:99-109), and t = |p - o| for unit rays.
        # Over the remote tunnel this saves several seconds per room.
        from ipcgen_tpu.utils.host import sync as _sync

        t0 = time.time()
        _sync(batch.t)  # completion barrier: device scan execution
        sim_scene.profile["scan_exec"] = time.time() - t0
        t0 = time.time()
        # uint16-quantized transfer on TPU: 6 B/point instead of 12 over
        # the remote tunnel (measured rounding 0.03 mm — two orders under
        # the sensor's 20 mm sigma); full-precision elsewhere (local CPU
        # transfers are free and the tests byte-compare outputs).
        all_points, all_mask = batch.points_and_mask(
            quantized=jax.default_backend() == "tpu"
        )
        sim_scene.profile["d2h"] = time.time() - t0
        # Hand the device-resident points to the labeled export so the 1-NN
        # label transfer skips re-uploading the cloud over the tunnel.
        sim_scene.set_device_label_queries(
            batch.points.reshape(-1, 3), all_mask
        )
        # Dispatch the 1-NN label transfer on a worker thread NOW: its
        # device argmin + index download overlap the host-side frame
        # building / statistics / non-labeled exports below instead of
        # serializing after them in save_results.
        sim_scene.start_label_transfer_async()
        t0 = time.time()
        origins = np.stack([w.to_pose_matrix()[:3, 3] for w in waypoints])

        for i in range(len(waypoints)):
            m = all_mask[i]
            points = all_points[i][m]
            rel = points - origins[i][None, :]
            sensor_ranges = np.linalg.norm(rel, axis=1)
            safe = np.maximum(sensor_ranges, 1e-12)
            incident_angles = np.degrees(
                np.arccos(np.clip(np.abs(rel[:, 2]) / safe, 0.0, 1.0))
            )
            # Per-frame quality metrics (reference: :276-284; note the range
            # stats are norms of the world positions — preserved verbatim;
            # the true sensor ranges from the t array are dual-reported).
            ranges = np.linalg.norm(points, axis=1) if len(points) else np.zeros(0)
            scan_quality = ScanQuality(
                coverage_ratio=len(points) / total_points_per_scan,
                num_points=len(points),
                incident_angle_mean=(
                    float(np.mean(incident_angles)) if len(incident_angles) > 0 else 0
                ),
                incident_angle_std=(
                    float(np.std(incident_angles)) if len(incident_angles) > 0 else 0
                ),
                scan_density=len(points) / room_volume,
                range_mean=float(np.mean(ranges)) if len(points) > 0 else 0,
                range_std=float(np.std(ranges)) if len(points) > 0 else 0,
                sensor_range_mean=(
                    float(np.mean(sensor_ranges)) if len(points) > 0 else 0.0
                ),
                sensor_range_std=(
                    float(np.std(sensor_ranges)) if len(points) > 0 else 0.0
                ),
            )
            sim_scene.append_frame(
                S3DISSimFrame(i, points, incident_angles, scan_quality)
            )

        sim_scene.profile["frame_build"] = time.time() - t0
        simulation_time = time.time() - start_time
        sim_scene.compute_statistics(simulation_time)
        # Per-kernel throughput counter (SURVEY.md §5.1: the TPU equivalent
        # of the reference's wall-clock spans is rays/sec instrumentation).
        total_rays = int(np.prod(np.asarray(batch.t.shape)))
        if simulation_time > 0:
            print(
                f"[Perf] {total_rays:,} rays / {simulation_time:.3f}s = "
                f"{total_rays / simulation_time / 1e6:.1f} M rays/s "
                f"({len(waypoints)} waypoints, backend="
                f"{self.config.get('raycast_engine', {}).get('backend', 'auto')})"
            )
        return sim_scene

    def run_simulation(self, waypoints: List[Waypoint]) -> S3DISSimScene:
        """Scan every waypoint in one fused device batch (reference loop:
        :220-296)."""
        start_time = time.time()
        batch = self.dispatch_scan(waypoints)
        # dispatch includes eager beam generation and — when this room's
        # block-count bucket is cold — the scan program's XLA compile (the
        # jit call blocks until compiled); spanning it separately keeps
        # compile leakage visible instead of silently inflating the stage.
        dispatch_s = time.time() - start_time
        scene = self.collect_scan(batch, waypoints, start_time)
        scene.profile["dispatch"] = dispatch_s
        return scene

    # ------------------------------------------------------------------
    def save_results(
        self,
        sim_scene: S3DISSimScene,
        output_dir: Path,
        waypoints: Optional[List[Waypoint]] = None,
        save_visualizations: bool = True,
    ) -> None:
        """Persist outputs + optional visualizations (reference: :298-364)."""
        output_dir = Path(output_dir)
        sim_scene.save_results(output_dir)

        if save_visualizations:
            vis_dir = output_dir / "visualizations"
            vis_dir.mkdir(parents=True, exist_ok=True)
            self.trajectory_visualizer.output_dir = vis_dir
            self.scan_visualizer.output_dir = vis_dir
            self.mesh_visualizer.output_dir = vis_dir

            from ipcgen_tpu.viz import S3DISVisualizer, create_visualization_summary

            s3dis_visualizer = S3DISVisualizer(output_dir)
            if waypoints and self.scene:
                self.trajectory_visualizer.visualize_trajectory_2d(
                    waypoints,
                    self.scene.room_bounds.to_dict(),
                    title=f"Robot trajectory - {self.scene.scene_name}",
                )
                self.trajectory_visualizer.visualize_trajectory_3d(
                    waypoints,
                    self.scene.room_bounds.to_dict(),
                    title=f"Robot trajectory 3D - {self.scene.scene_name}",
                )
            self.scan_visualizer.visualize_scan_statistics(sim_scene)
            self.scan_visualizer.visualize_scan_quality_evolution(sim_scene)
            self.scan_visualizer.create_scan_summary_report(sim_scene)
            if self.scene:
                try:
                    viz_results = s3dis_visualizer.generate_all_visualizations(
                        sim_scene, self.scene, num_sample_frames=5
                    )
                    create_visualization_summary(viz_results, output_dir)
                except Exception:
                    pass

    # ------------------------------------------------------------------
    def run_complete_simulation(
        self,
        scene_path: str,
        start_point: Tuple[float, float, float],
        end_point: Tuple[float, float, float],
        path_type: PathType = PathType.STRAIGHT,
        num_waypoints: int = 20,
        output_dir: Optional[Path] = None,
        scene_name: Optional[str] = None,
    ) -> S3DISSimScene:
        """Load -> manual trajectory -> simulate -> save (reference: :366-405)."""
        self.load_scene(scene_path, scene_name)
        waypoints, _trajectory_quality = self.generate_trajectory(
            start_point, end_point, path_type, num_waypoints
        )
        sim_scene = self.run_simulation(waypoints)
        if output_dir is None:
            output_dir = Path("s3dis_simulation_results")
        self.save_results(sim_scene, output_dir, waypoints)
        return sim_scene

    def run_auto_simulation(
        self,
        scene_path: str,
        num_waypoints: int = 20,
        output_dir: Optional[Path] = None,
        scene_name: Optional[str] = None,
        save_visualizations: bool = True,
        save_executor: Optional[Any] = None,
    ) -> S3DISSimScene:
        """Load -> auto trajectory -> simulate -> save (reference: :407-444).

        With ``save_executor`` (a concurrent.futures.Executor) the export
        (label transfer + PLY/stats writing) is submitted to the executor so
        the caller can start the next scene's device work while this scene's
        host-side export drains — the TPU-native analog of the double-buffered
        room staging called out in SURVEY.md §2.4. Visualizations are forced
        off in async mode (matplotlib is not thread-safe). The pending future
        is attached as ``sim_scene.save_future``.
        """
        t0 = time.time()
        self.load_scene(scene_path, scene_name)
        t1 = time.time()
        waypoints, analysis_info = self.generate_auto_trajectory(num_waypoints)
        t2 = time.time()
        sim_scene = self.run_simulation(waypoints)
        sim_scene.profile["load_scene"] = t1 - t0
        sim_scene.profile["trajectory"] = t2 - t1
        if output_dir is None:
            output_dir = Path("s3dis_auto_simulation_results")
        output_dir = Path(output_dir)

        def _save() -> None:
            self.save_results(
                sim_scene, output_dir, waypoints,
                save_visualizations=save_visualizations
                and save_executor is None,
            )
            analysis_file = output_dir / "trajectory_analysis.json"
            with open(analysis_file, "w", encoding="utf-8") as f:
                json.dump(analysis_info, f, indent=2, ensure_ascii=False)

        if save_executor is not None:
            sim_scene.save_future = save_executor.submit(_save)
        else:
            _save()
        return sim_scene


def _enable_compilation_cache(config: Dict[str, Any]) -> None:
    """Persistent XLA compilation cache: the fused scan compiles once per
    (profile, waypoint-count, mesh-size-bucket) — caching it on disk removes
    the ~1-2 min first-room compile from every later process (the batch
    driver already amortizes it within a process)."""
    cache_dir = config.get("compilation_cache_dir", None)
    if cache_dir == "":
        return
    from ipcgen_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(cache_dir)


# ---------------------------------------------------------------------------
# Module-level helpers (reference: s3dis_simulator.py:447-811)
# ---------------------------------------------------------------------------

def load_config(config_path: str) -> Dict[str, Any]:
    """Load a YAML configuration file (reference: :447-454)."""
    import yaml

    with open(config_path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def load_default_config() -> Dict[str, Any]:
    """Default simulator configuration (the reference pointed at a missing
    configs/default_config.yaml, :457-460; here the default ships)."""
    config_path = Path(__file__).resolve().parents[2] / "configs" / "default_config.yaml"
    if config_path.exists():
        return load_config(str(config_path))
    return {"raycast_engine": {"use_gpu": True}, "trajectory": {"robot_height": 1.0}}


def create_simulator_from_config(config_path: Optional[str] = None) -> S3DISSimulator:
    """Simulator from a config file (reference: :463-479).

    Accepts both the reference-style flat dict and the typed PipelineConfig
    tree (configs/default_config.yaml) — the latter is converted through
    PipelineConfig.simulator_config().
    """
    config = load_default_config() if config_path is None else load_config(config_path)
    if "simulation" in config and "raycast_engine" not in config:
        from ipcgen_tpu.config import PipelineConfig

        tree = PipelineConfig.from_dict(config)
        return S3DISSimulator(
            tree.simulator_config(),
            use_dense_lidar=tree.simulation.use_dense_lidar,
            use_blk2go=tree.simulation.use_blk2go,
        )
    return S3DISSimulator(config)


def run_single_scene_simulation(
    scene_path: str,
    scene_name: Optional[str] = None,
    num_waypoints: int = 20,
    output_base_dir: str = "simulation_results",
    use_gpu: bool = True,
    robot_height: float = 1.0,
    use_dense_lidar: bool = False,
    use_blk2go: bool = True,
    enable_mesh_visualization: bool = False,
    use_auto_trajectory: bool = True,
    s3dis_data_root: str = "S3DIS/raw/S3DIS/data/Stanford3dDataset_v1.2_Aligned_Version",
    area: Optional[str] = None,
    room: Optional[str] = None,
    seed: int = 0,
    save_visualizations: bool = True,
    save_executor: Optional[Any] = None,
    lidar_horizontal_res: Optional[int] = None,
) -> S3DISSimScene:
    """Process a single scene end-to-end (reference: :482-553; the dead
    manual-trajectory fallthrough bug at :530-550 is fixed — each branch runs
    exactly one simulation)."""
    if scene_name is None:
        scene_name = Path(scene_path).parent.name
    output_dir = Path(output_base_dir) / scene_name
    config = {
        "raycast_engine": {"use_gpu": use_gpu},
        "trajectory": {"robot_height": robot_height},
        "enable_mesh_visualization": enable_mesh_visualization,
        "s3dis_data_root": s3dis_data_root,
        "area": area,
        "room": room,
        "seed": seed,
        "lidar": {"horizontal_res": lidar_horizontal_res},
    }
    simulator = S3DISSimulator(
        config, use_dense_lidar=use_dense_lidar, use_blk2go=use_blk2go
    )
    if use_auto_trajectory:
        print(f"[Simulation] Using auto-generated trajectory for {scene_name}.")
        # scene_name is propagated so the summary/statistics carry the
        # room id, not the mesh file stem (the reference forgets to pass it
        # in the auto branch, s3dis_simulator.py:551-555 — resolved).
        sim_scene = simulator.run_auto_simulation(
            scene_path=scene_path, num_waypoints=num_waypoints,
            output_dir=output_dir, scene_name=scene_name,
            save_visualizations=save_visualizations,
            save_executor=save_executor,
        )
    else:
        print(f"[Simulation] Using manual trajectory for {scene_name}.")
        simulator.load_scene(scene_path, scene_name)
        bounds = simulator.scene.room_bounds
        center = bounds.get_center()
        size = bounds.get_size()
        start_point = (center[0] - size[0] * 0.25, center[1], robot_height)
        end_point = (center[0] + size[0] * 0.25, center[1], robot_height)
        waypoints, _ = simulator.generate_trajectory(
            start_point, end_point, PathType.STRAIGHT, num_waypoints
        )
        sim_scene = simulator.run_simulation(waypoints)
        simulator.save_results(
            sim_scene, output_dir, waypoints, save_visualizations=save_visualizations
        )
    print(f"[Simulation] Scene {scene_name} completed.")
    return sim_scene


def run_scenes_device_parallel(
    scene_jobs: List[Dict[str, Any]],
    num_waypoints: int = 20,
    output_base_dir: str = "simulation_results",
    devices: Optional[List[Any]] = None,
    robot_height: float = 1.0,
    use_dense_lidar: bool = False,
    use_blk2go: bool = True,
    s3dis_data_root: str = "S3DIS/raw/S3DIS/data/Stanford3dDataset_v1.2_Aligned_Version",
    seed: int = 0,
    save_visualizations: bool = False,
    lidar_horizontal_res: Optional[int] = None,
) -> Tuple[List[Tuple[str, S3DISSimScene]], List[Tuple[str, str]]]:
    """Room-level data parallelism: one room per chip (SURVEY.md §2.4).

    Rooms are assigned round-robin to local devices and processed in waves of
    ``len(devices)``.  Within a wave, each room's scene asset is committed to
    its device and the fused scan program dispatched asynchronously — JAX
    dispatch returns before execution finishes, so up to ``len(devices)``
    rooms' raycast programs run concurrently, one per chip.  Host-side work
    (trajectory planning before, label transfer/export after) drains
    sequentially around the device wave.

    ``scene_jobs`` entries: ``{"scene_path", "scene_name", "area", "room"}``.
    Returns ``(successful [(name, sim_scene)], failed [(name, error)])``.
    Per-room outputs are bit-identical to the sequential driver: each room
    keeps its own simulator instance and PRNG seed, and device placement does
    not enter any computation semantics.
    """
    if devices is None:
        devices = jax.devices()
    successful: List[Tuple[str, S3DISSimScene]] = []
    failed: List[Tuple[str, str]] = []
    n_dev = max(len(devices), 1)
    for wave_start in range(0, len(scene_jobs), n_dev):
        wave = scene_jobs[wave_start : wave_start + n_dev]
        # Phase 1 — load + plan on host, then dispatch each room's scan onto
        # its own device (async).
        inflight = []
        for j, job in enumerate(wave):
            name = job["scene_name"]
            device = devices[j % n_dev]
            try:
                config = {
                    "raycast_engine": {"use_gpu": True},
                    "trajectory": {"robot_height": robot_height},
                    "s3dis_data_root": s3dis_data_root,
                    "area": job.get("area"),
                    "room": job.get("room"),
                    "seed": seed,
                    "lidar": {"horizontal_res": lidar_horizontal_res},
                }
                simulator = S3DISSimulator(
                    config, use_dense_lidar=use_dense_lidar, use_blk2go=use_blk2go
                )
                t0 = time.time()
                simulator.load_scene(job["scene_path"], name)
                waypoints, analysis_info = simulator.generate_auto_trajectory(
                    num_waypoints
                )
                batch = simulator.dispatch_scan(waypoints, device=device)
                inflight.append(
                    (name, simulator, waypoints, analysis_info, batch, t0)
                )
                print(f"[RoomDP] {name} dispatched on {device}")
            except Exception as e:
                failed.append((name, str(e)))
                print(f"[RoomDP] {name} failed at dispatch: {e}")
        # Phase 2 — collect each room's result and export.
        for name, simulator, waypoints, analysis_info, batch, t0 in inflight:
            try:
                sim_scene = simulator.collect_scan(batch, waypoints, t0)
                output_dir = Path(output_base_dir) / name
                simulator.save_results(
                    sim_scene, output_dir, waypoints,
                    save_visualizations=save_visualizations,
                )
                with open(
                    output_dir / "trajectory_analysis.json", "w", encoding="utf-8"
                ) as f:
                    json.dump(analysis_info, f, indent=2, ensure_ascii=False)
                successful.append((name, sim_scene))
                print(f"[RoomDP] {name} completed.")
            except Exception as e:
                failed.append((name, str(e)))
                print(f"[RoomDP] {name} failed at collect/export: {e}")
    return successful, failed


def find_available_scenes(
    reconstruction_dir: str = "outputs/s3dis_reconstruction/reconstruction_results",
) -> List[Tuple[str, str, str]]:
    """Discover reconstructed scene meshes (reference: :556-591)."""
    reconstruction_path = Path(reconstruction_dir)
    if not reconstruction_path.exists():
        print(f"[Discovery] Reconstruction directory not found: {reconstruction_dir}")
        return []
    available_scenes = []
    for scene_dir in sorted(reconstruction_path.iterdir()):
        if scene_dir.is_dir():
            mesh_files = sorted(scene_dir.glob("mesh_*.ply"))
            if mesh_files:
                dense_mesh = scene_dir / "mesh_dense.ply"
                mesh_path = str(dense_mesh) if dense_mesh.exists() else str(mesh_files[0])
                scene_name = scene_dir.name
                available_scenes.append((mesh_path, scene_name, scene_name))
                print(f"[Discovery] Found scene {scene_name}: {mesh_path}")
    print(f"[Discovery] Total scenes discovered: {len(available_scenes)}")
    return available_scenes


def _parse_area_room(area_room: str) -> Tuple[str, str]:
    """Extract (area, room) identifiers from a scene dir name
    (reference: :658-667)."""
    if "_" in area_room:
        parts = area_room.split("_")
        if len(parts) >= 3 and parts[0] == "Area":
            return f"{parts[0]}_{parts[1]}", "_".join(parts[2:])
        area, room = area_room.split("_", 1)
        return area, room
    return area_room, area_room


def _print_batch_summary(
    n_total: int, successful, skipped, failed, total_time: float
) -> None:
    print(f"[Batch] Total scenes: {n_total}")
    print(f"[Batch] Completed: {len(successful)}")
    print(f"[Batch] Skipped: {len(skipped)}")
    print(f"[Batch] Failed: {len(failed)}")
    print(f"[Batch] Total time: {total_time:.1f}s ({total_time / 60:.1f} min)")
    if n_total:
        print(f"[Batch] Average per scene: {total_time / n_total:.1f}s")
        rooms_per_hour = len(successful) / total_time * 3600 if total_time > 0 else 0
        print(f"[Batch] Throughput: {rooms_per_hour:.1f} rooms/hour")


def main(
    reconstruction_dir: str = "outputs/s3dis_reconstruction/reconstruction_results",
    num_waypoints: int = 20,
    output_base_dir: str = "simulation_results",
    use_gpu: bool = True,
    robot_height: float = 1.0,
    use_dense_lidar: bool = False,
    use_blk2go: bool = True,
    use_auto_trajectory: bool = True,
    s3dis_data_root: str = "S3DIS/raw/S3DIS/data/Stanford3dDataset_v1.2_Aligned_Version",
    async_export: bool = False,
    save_visualizations: bool = True,
    room_dp: bool = False,
    lidar_horizontal_res: Optional[int] = None,
) -> Dict[str, Any]:
    """Batch entry point over all reconstructed scenes (reference: :594-726)
    with the same skip/resume semantics: a scene is skipped when BOTH the
    labeled PLY and the statistics txt exist; partially-written scenes rerun
    (reference: :643-655).

    ``async_export=True`` overlaps each scene's host-side export (label
    transfer, PLY/stats writing) with the next scene's device work via a
    single background thread (depth-1 double buffering; visualizations are
    disabled in this mode).

    ``room_dp=True`` with multiple local devices instead schedules rooms
    round-robin onto the devices — one room's fused scan per chip in flight
    (run_scenes_device_parallel); per-room outputs are identical to the
    sequential path."""
    print("=== S3DIS batch simulation ===")
    available_scenes = find_available_scenes(reconstruction_dir)
    if not available_scenes:
        print("[Batch] No scenes found. Verify the reconstruction directory.")
        return {"successful": [], "failed": [], "skipped": []}

    if room_dp and len(jax.devices()) > 1:
        # Room-level DP: rooms round-robin over local devices, one fused
        # scan per chip in flight per wave (SURVEY.md §2.4 table row 3).
        start_time = time.time()
        jobs, skipped_scenes = [], []
        for scene_path, scene_name, area_room in available_scenes:
            scene_output_dir = Path(output_base_dir) / scene_name
            ply_file = scene_output_dir / "combined_pointcloud_with_label.ply"
            stats_file = scene_output_dir / "simulation_statistics.txt"
            if ply_file.exists() and stats_file.exists():
                print(f"[Batch] Scene {scene_name} already processed. Skipping.")
                skipped_scenes.append(scene_name)
                continue
            elif ply_file.exists() or stats_file.exists():
                print(f"[Batch] Scene {scene_name} partially processed. Re-running.")
            area, room = _parse_area_room(area_room)
            jobs.append(
                {
                    "scene_path": scene_path,
                    "scene_name": scene_name,
                    "area": area,
                    "room": room,
                }
            )
        successful_scenes, failed_scenes = run_scenes_device_parallel(
            jobs,
            num_waypoints=num_waypoints,
            output_base_dir=output_base_dir,
            robot_height=robot_height,
            use_dense_lidar=use_dense_lidar,
            use_blk2go=use_blk2go,
            s3dis_data_root=s3dis_data_root,
            save_visualizations=save_visualizations,
            lidar_horizontal_res=lidar_horizontal_res,
        )
        _print_batch_summary(
            len(available_scenes), successful_scenes, skipped_scenes,
            failed_scenes, time.time() - start_time,
        )
        return {
            "successful": successful_scenes,
            "failed": failed_scenes,
            "skipped": skipped_scenes,
            "total_time": time.time() - start_time,
        }

    executor = None
    pending: Optional[Tuple[str, Any]] = None
    if async_export:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)

    successful_scenes, failed_scenes, skipped_scenes = [], [], []
    start_time = time.time()
    for i, (scene_path, scene_name, area_room) in enumerate(available_scenes, 1):
        print(f"[Batch] Processing scene {i}/{len(available_scenes)}: {scene_name}")
        scene_output_dir = Path(output_base_dir) / scene_name
        ply_file = scene_output_dir / "combined_pointcloud_with_label.ply"
        stats_file = scene_output_dir / "simulation_statistics.txt"
        if ply_file.exists() and stats_file.exists():
            print(f"[Batch] Scene {scene_name} already processed. Skipping.")
            skipped_scenes.append(scene_name)
            continue
        elif ply_file.exists() or stats_file.exists():
            print(f"[Batch] Scene {scene_name} partially processed. Re-running.")
        try:
            area, room = _parse_area_room(area_room)
            # Depth-1 double buffering: block on the previous scene's export
            # before submitting a new one so at most one room is in flight.
            if pending is not None:
                prev_name, prev_future = pending
                try:
                    prev_future.result()
                except Exception as e:  # export failure counts as a failure
                    failed_scenes.append((prev_name, str(e)))
                    successful_scenes = [
                        sc for sc in successful_scenes if sc[0] != prev_name
                    ]
                pending = None
            sim_scene = run_single_scene_simulation(
                scene_path=scene_path,
                scene_name=scene_name,
                num_waypoints=num_waypoints,
                output_base_dir=output_base_dir,
                use_gpu=use_gpu,
                robot_height=robot_height,
                use_dense_lidar=use_dense_lidar,
                use_blk2go=use_blk2go,
                use_auto_trajectory=use_auto_trajectory,
                s3dis_data_root=s3dis_data_root,
                area=area,
                room=room,
                save_visualizations=save_visualizations,
                save_executor=executor,
                lidar_horizontal_res=lidar_horizontal_res,
            )
            successful_scenes.append((scene_name, sim_scene))
            if executor is not None and getattr(sim_scene, "save_future", None) is not None:
                pending = (scene_name, sim_scene.save_future)
            print(f"[Batch] Scene {scene_name} succeeded.")
        except Exception as e:
            failed_scenes.append((scene_name, str(e)))
            print(f"[Batch] Scene {scene_name} failed: {e}")

    if pending is not None:
        prev_name, prev_future = pending
        try:
            prev_future.result()
        except Exception as e:
            failed_scenes.append((prev_name, str(e)))
            successful_scenes = [
                sc for sc in successful_scenes if sc[0] != prev_name
            ]
    if executor is not None:
        executor.shutdown(wait=True)

    total_time = time.time() - start_time
    _print_batch_summary(
        len(available_scenes), successful_scenes, skipped_scenes,
        failed_scenes, total_time,
    )
    return {
        "successful": successful_scenes,
        "failed": failed_scenes,
        "skipped": skipped_scenes,
        "total_time": total_time,
    }


def main_single(
    scene_path: str = (
        "outputs/s3dis_reconstruction/reconstruction_results/Area_1_office_1/"
        "mesh_dense.ply"
    ),
    scene_name: str = "Area_1_office_1",
    area: str = "Area_1",
    room: str = "office_1",
    num_waypoints: int = 20,
    **kwargs,
) -> S3DISSimScene:
    """Single hard-coded scene entry point (reference: :729-807)."""
    sim_scene = run_single_scene_simulation(
        scene_path=scene_path,
        scene_name=scene_name,
        num_waypoints=num_waypoints,
        area=area,
        room=room,
        **kwargs,
    )
    print("[Single] Simulation completed.")
    if sim_scene and len(sim_scene.frames) > 0:
        total = sum(len(f.points) for f in sim_scene.frames)
        print(f"Frames: {len(sim_scene.frames)}")
        print(f"Total points: {total:,}")
        print(f"Average points per frame: {total // len(sim_scene.frames):,}")
    return sim_scene


if __name__ == "__main__":
    main()
