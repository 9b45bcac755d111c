#!/usr/bin/env python3
"""Benchmark: rays/sec/chip for the 32-line multi-waypoint room scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.md north star): dense 32-line profile (128,000 rays/scan)
over a 20-waypoint trajectory through a furnished synthetic room (~200k
triangles; real S3DIS meshes are not shipped with the repo), raycast by the
Pallas TPU kernel over the resident SceneAsset.

``vs_baseline`` compares against a measured CPU baseline: a vectorized numpy
raycaster implementing the SAME two-level culled traversal (slab-test leaf
blocks, Möller–Trumbore on survivors).  The reference's own CPU engine —
Open3D/Embree with a per-frame BVH rebuild, raycast_engine_cpu.py:16 — is not
installable in this image; an algorithm-equivalent culled CPU engine is the
fairest runnable stand-in and is measured, not assumed.  The CPU run uses a
reduced workload and the ratio is throughput-normalized.
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


def _measure(backend: str, num_waypoints: int, reps: int = 5,
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


def _numpy_culled_raycast(origins, dirs, asset, t_max, tile=32):
    """Vectorized numpy CPU engine with the same 2-level culled traversal."""
    tri_data = np.asarray(asset.tri_data)  # (NB, 16, TB)
    blo = np.asarray(asset.block_lo)
    bhi = np.asarray(asset.block_hi)
    n = len(origins)
    best_t = np.full(n, np.inf, np.float32)
    for s in range(0, n, tile):
        o = origins[s : s + tile]
        d = dirs[s : s + tile]
        inv = 1.0 / d
        # slab test: (R, NB)
        t1 = (blo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t2 = (bhi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tmin = np.minimum(t1, t2).max(axis=2)
        tmax = np.maximum(t1, t2).min(axis=2)
        hit = (tmax >= np.maximum(tmin, 0)) & (tmin < t_max)
        cand = np.nonzero(hit.any(axis=0))[0]
        if len(cand) == 0:
            continue
        panels = tri_data[cand]  # (B, 16, TB)
        v0 = panels[:, 0:3].transpose(0, 2, 1).reshape(-1, 3)
        e1 = panels[:, 3:6].transpose(0, 2, 1).reshape(-1, 3)
        e2 = panels[:, 6:9].transpose(0, 2, 1).reshape(-1, 3)
        # Möller–Trumbore, (R, T') broadcast
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("tk,rtk->rt", e1, pvec)
        inv_det = np.where(np.abs(det) > 1e-9, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv_det
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rk,rtk->rt", d, qvec) * inv_det
        t = np.einsum("tk,rtk->rt", e2, qvec) * inv_det
        ok = (
            (np.abs(det) > 1e-9)
            & (u >= -1e-7)
            & (v >= -1e-7)
            & (u + v <= 1 + 1e-7)
            & (t > 1e-6)
        )
        t = np.where(ok, t, np.inf)
        best_t[s : s + tile] = np.minimum(best_t[s : s + tile], t.min(axis=1))
    return best_t


def main():
    if "--cpu-baseline" in sys.argv:
        # Child process: measure the culled numpy CPU engine on a reduced,
        # throughput-normalized workload: 1 waypoint x 32 lines x 250 azimuth
        # steps (8,000 rays) against the same 200k-triangle scene.
        # Force the CPU platform BEFORE any jax array is created — the parent
        # process holds the TPU and the axon backend would block on it.
        import jax

        jax.config.update("jax_platforms", "cpu")
        asset, intr, poses, n_tris = _build_workload(1, horizontal_res=250)
        from ipcgen_tpu.models import beams

        dirs_sensor = np.asarray(
            beams.gen_vertical_degree_dirs(intr.vertical_degrees, intr.horizontal_res)
        )
        pose = np.asarray(poses[0])
        dirs = dirs_sensor @ pose[:3, :3].T
        origins = np.tile(pose[:3, 3], (len(dirs), 1)).astype(np.float32)
        t0 = time.perf_counter()
        best_t = _numpy_culled_raycast(
            origins, dirs.astype(np.float32), asset, t_max=intr.max_range
        )
        dt = time.perf_counter() - t0
        result = {
            "rays": len(dirs),
            "seconds": dt,
            "rays_per_sec": len(dirs) / dt,
            "hit_fraction": float(np.isfinite(best_t).mean()),
            "engine": "numpy 2-level culled raycaster",
        }
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
            "baseline": "numpy 2-level culled raycaster on host CPU (measured)",
            "baseline_rays_per_sec": round(baseline_rps, 1) if baseline_rps else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
