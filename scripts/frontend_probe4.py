#!/usr/bin/env python3
"""Isolate the unordered epilogue's cost and test a planar formulation.

probe3: front+barrier+kernel(t,slot only) = 132.6 ms — kernel-only speed.
bisect: the full scan (front+barrier+kernel+epilogue) = 156.9 ms.  So the
~24 ms now sits in the epilogue (points = o + d*t, masks, where-zeroing),
presumably the (N, 3)-minor-dim layout traffic.  Ladder:

  e0  prebuilt o,d -> kernel -> (t, slot)            [reference floor]
  e1  prebuilt o,d -> kernel -> current epilogue     [epilogue cost alone]
  e2  front+barrier -> kernel -> current epilogue    [bisect f repro]
  e3  front+barrier -> kernel -> PLANAR epilogue     [layout hypothesis]

e3 computes points as three (W, R) planes from planar dirs (three (R,)
planes) and per-waypoint origin scalars — no (N, 3) tensor anywhere after
the kernel.  Throwaway diagnostics, not product surface.
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

    def epi(o, d, t, slot):
        t2 = t.reshape(w, r)
        hit = (jnp.isfinite(t) & (slot >= 0)).reshape(w, r)
        pts = (o + d * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]).reshape(
            w, r, 3)
        mask = hit & (t2 < tmax)
        return (jnp.where(mask[..., None], pts, 0.0),
                jnp.where(mask, t2, jnp.inf), mask)

    o_pre, d_pre = jax.jit(front)(dirs_sp, poses)
    o_pre = jax.device_put(np.asarray(o_pre))
    d_pre = jax.device_put(np.asarray(d_pre))

    @jax.jit
    def e0(o, d):
        return kern(o, d)

    @jax.jit
    def e1(o, d):
        t, slot = kern(o, d)
        return epi(o, d, t, slot)

    @jax.jit
    def e2(dirs_sp, poses):
        o, d = front(dirs_sp, poses)
        o, d = jax.lax.optimization_barrier((o, d))
        t, slot = kern(o, d)
        return epi(o, d, t, slot)

    @jax.jit
    def e3(dirs_sp, poses):
        o, d = front(dirs_sp, poses)
        o, d = jax.lax.optimization_barrier((o, d))
        t, slot = kern(o, d)
        # Planar epilogue: (W, R) planes only.  Directions re-derived
        # planar from the SENSOR pattern + pose rotation (cheap broadcast
        # math), origins from pose translations.
        t2 = t.reshape(w, r)
        hit = (jnp.isfinite(t) & (slot >= 0)).reshape(w, r)
        mask = hit & (t2 < tmax)
        ts = jnp.where(mask, t2, 0.0)
        R = poses[:, :3, :3]
        planes = []
        dsx = dirs_sp[..., 0]  # (1, R)
        dsy = dirs_sp[..., 1]
        dsz = dirs_sp[..., 2]
        for j in range(3):
            dj = (dsx * R[:, j, 0, None] + dsy * R[:, j, 1, None]
                  + dsz * R[:, j, 2, None])  # (W, R)
            pj = poses[:, j, 3, None] + dj * ts
            planes.append(jnp.where(mask, pj, 0.0))
        return planes[0], planes[1], planes[2], \
            jnp.where(mask, t2, jnp.inf), mask

    rows = [
        ("e0 kernel only (t,slot)  ", lambda: e0(o_pre, d_pre),
         lambda o: o[0]),
        ("e1 +epilogue prebuilt    ", lambda: e1(o_pre, d_pre),
         lambda o: o[1]),
        ("e2 front+barrier+epilogue", lambda: e2(dirs_sp, poses),
         lambda o: o[1]),
        ("e3 planar epilogue       ", lambda: e3(dirs_sp, poses),
         lambda o: o[3]),
    ]
    for name, fn, leaf in rows:
        dt = timeit(fn, lambda o: sync(leaf(o)))
        print(f"{name}: {dt * 1e3:7.1f} ms -> {n / dt / 1e6:5.2f} M rays/s",
              flush=True)
    # Cross-check planar points == packed points.
    pts2 = np.asarray(e2(dirs_sp, poses)[0])
    px, py, pz, tt, mm = e3(dirs_sp, poses)
    pts3 = np.stack([np.asarray(px), np.asarray(py), np.asarray(pz)], -1)
    print(f"max |planar - packed| points: {np.abs(pts3 - pts2).max():.2e}")


if __name__ == "__main__":
    main()
