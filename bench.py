#!/usr/bin/env python3
"""Benchmark: rays/sec/chip for the 32-line multi-waypoint room scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.md north star): dense 32-line profile (128,000 rays/scan)
over a 20-waypoint trajectory through a furnished synthetic room (~200k
triangles; real S3DIS meshes are not shipped with the repo), raycast by the
Pallas TPU kernel over the resident SceneAsset.

``vs_baseline`` compares against a measured CPU baseline: the same scan
executed by the XLA block-scan engine on the host CPU (the reference's own
CPU engine — Open3D/Embree with a per-frame BVH rebuild and per-ray Python
generation, raycast_engine_cpu.py:16 — is not installable in this image; the
XLA-CPU path is the closest runnable stand-in and is measured, not assumed).
The CPU run uses a reduced workload and the ratio is throughput-normalized.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

WAYPOINTS = 20
BENCH_TRIS = 200_000


def _build_workload(num_waypoints: int, horizontal_res: int = 4000):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    from bench_raycast import synthetic_room

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch

    verts, tris = synthetic_room(BENCH_TRIS)
    asset = build_scene_asset(verts, tris)
    intr = Indoor8LineLidarIntrinsics.create_dense_32line()
    if horizontal_res != 4000:
        intr.horizontal_res = horizontal_res  # reduced CPU-baseline workload
    wps = [
        Waypoint(1.0 + 4.0 * i / max(num_waypoints - 1, 1), 2.5, 1.0, 0.17 * i)
        for i in range(num_waypoints)
    ]
    poses = waypoints_to_pose_batch(wps)
    return asset, intr, poses, len(tris)


def _measure(backend: str, num_waypoints: int, reps: int = 3,
             horizontal_res: int = 4000) -> dict:
    import jax

    from ipcgen_tpu.sim.scan import scan_waypoints

    asset, intr, poses, n_tris = _build_workload(num_waypoints, horizontal_res)
    key = jax.random.PRNGKey(0)

    def run():
        return scan_waypoints(asset, intr, poses, key=key, backend=backend)

    batch = run()
    jax.block_until_ready(batch.t)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        batch = run()
        jax.block_until_ready(batch.t)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_rays = int(np.prod(batch.t.shape))
    return {
        "rays": n_rays,
        "seconds": dt,
        "rays_per_sec": n_rays / dt,
        "tris": n_tris,
        "waypoints": num_waypoints,
        "hit_fraction": float(np.asarray(batch.mask).mean()),
        "backend": backend,
        "platform": jax.default_backend(),
    }


def main():
    if "--cpu-baseline" in sys.argv:
        # Child process: force the CPU platform and measure the XLA path on a
        # reduced workload (2 waypoints is plenty for a throughput number).
        import jax

        jax.config.update("jax_platforms", "cpu")
        # Throughput-normalized reduced workload: 1 waypoint x 32 lines x 125
        # azimuth steps (4,000 rays) against the same 200k-triangle scene.
        result = _measure("xla", num_waypoints=1, reps=1, horizontal_res=125)
        print("CPU_BASELINE " + json.dumps(result))
        return

    result = _measure("auto", num_waypoints=WAYPOINTS)

    baseline_rps = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CPU_BASELINE "):
                baseline_rps = json.loads(line[len("CPU_BASELINE "):])["rays_per_sec"]
    except Exception:
        baseline_rps = None

    vs_baseline = (
        result["rays_per_sec"] / baseline_rps if baseline_rps else None
    )
    out = {
        "metric": "rays_per_sec_per_chip_32line_scan",
        "value": round(result["rays_per_sec"], 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "details": {
            "workload": (
                f"{result['waypoints']} waypoints x 128k-ray 32-line scan, "
                f"{result['tris']} triangles"
            ),
            "room_scan_seconds": round(result["seconds"], 4),
            "platform": result["platform"],
            "backend": result["backend"],
            "hit_fraction": round(result["hit_fraction"], 4),
            "baseline": "XLA block-scan on host CPU (measured)",
            "baseline_rays_per_sec": round(baseline_rps, 1) if baseline_rps else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
