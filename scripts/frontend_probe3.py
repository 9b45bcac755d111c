#!/usr/bin/env python3
"""Does an optimization_barrier between the beam front-end and the kernel
recover the prebuilt-rays throughput?

probe2 measured the front-end standalone at 5.5 ms, yet fused ahead of the
kernel it costs ~26 ms (probe1) — XLA re-materializes the cheap einsum
producer inside the prepass's chunked slab loop.  A barrier pins o/d as
materialized values.  Throwaway diagnostics, not product surface.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def timeit(fn, sync, reps=3, queue=4):
    out = fn()
    sync(out)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(queue):
            out = fn()
        sync(out)
        best.append((time.perf_counter() - t0) / queue)
    return min(best)


def main():
    import jax
    import jax.numpy as jnp
    from bench_raycast import synthetic_room

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics, beams
    from ipcgen_tpu.ops.raycast_mxu import raycast_mxu_components
    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.sim.scan import scan_permutation
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch
    from ipcgen_tpu.utils.host import sync

    print(f"backend: {jax.default_backend()}")
    verts, tris = synthetic_room(160_000)
    asset = build_scene_asset(verts, tris)
    intr = Indoor8LineLidarIntrinsics.create_dense_32line()
    w = 20
    wps = [Waypoint(1.0 + 4.0 * i / 19.0, 2.5, 1.0, 0.17 * i)
           for i in range(w)]
    poses = jnp.asarray(waypoints_to_pose_batch(wps), jnp.float32)
    dirs_sensor = beams.gen_vertical_degree_dirs(
        intr.vertical_degrees, intr.horizontal_res)[None]
    r = dirs_sensor.shape[1]
    n = w * r
    perm, _ = scan_permutation(intr, "mxu", r)
    dirs_sp = jnp.asarray(np.asarray(dirs_sensor)[:, np.asarray(perm)])
    tmax = float(intr.max_range)

    def kern(o, d):
        return raycast_mxu_components(
            o, d, asset.tri_data, asset.block_lo, asset.block_hi,
            t_max=tmax, sort_rays=False)

    def front(dirs_sp, poses):
        dirs_wp = jnp.einsum(
            "wnk,wjk->wnj", jnp.broadcast_to(dirs_sp, (w, r, 3)),
            poses[:, :3, :3], precision=jax.lax.Precision.HIGHEST)
        origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
        return origins.reshape(n, 3), dirs_wp.reshape(n, 3)

    @jax.jit
    def v_fused(dirs_sp, poses):
        o, d = front(dirs_sp, poses)
        return kern(o, d)

    @jax.jit
    def v_barrier(dirs_sp, poses):
        o, d = front(dirs_sp, poses)
        o, d = jax.lax.optimization_barrier((o, d))
        return kern(o, d)

    rows = [
        ("v  fused (probe1 repro)", lambda: v_fused(dirs_sp, poses)),
        ("vb optimization_barrier", lambda: v_barrier(dirs_sp, poses)),
    ]
    ref = None
    for name, fn in rows:
        dt = timeit(fn, lambda o: sync(o[0]))
        print(f"{name}: {dt * 1e3:7.1f} ms -> {n / dt / 1e6:5.2f} M rays/s",
              flush=True)
        out = np.asarray(fn()[0])
        if ref is None:
            ref = out
        else:
            a = np.where(np.isfinite(out), out, 0.0)
            b = np.where(np.isfinite(ref), ref, 0.0)
            print(f"   max |t - ref|: {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    main()
