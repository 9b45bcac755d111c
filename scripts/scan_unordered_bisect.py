#!/usr/bin/env python3
"""Price the remaining product-path overhead over the raw kernel.

Round-5 state: raw kernel 19.5 M rays/s, `outputs="unordered"` product
path 15.3 M on the 160 k-tri bench room.  This ladder isolates what is
left between them: the beam transform front-end, the minimal finalize
(hit + points from o + d*t), the mask/where epilogue, and the output
materialization — each variant is one compiled program timed with the
honest host-read barrier.  Throwaway diagnostics, not product surface.
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
    return min(best), out


def main():
    import jax
    import jax.numpy as jnp
    from bench_raycast import synthetic_room

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics, beams
    from ipcgen_tpu.ops.raycast_mxu import raycast_mxu_components
    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.sim.scan import scan_permutation, scan_waypoints
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
    perm_d = jnp.asarray(perm)
    tmax = float(intr.max_range)

    def front(dirs_sensor, poses):
        dirs_sp = dirs_sensor[:, perm_d]
        dirs_wp = beams.dirs_to_world_batch(
            jnp.broadcast_to(dirs_sp, (w, r, 3)), poses)
        origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
        return origins.reshape(n, 3), dirs_wp.reshape(n, 3)

    def kern(o, d):
        return raycast_mxu_components(
            o, d, asset.tri_data, asset.block_lo, asset.block_hi,
            t_max=tmax, sort_rays=False)

    # a0: kernel alone on PREBUILT world rays (the published "raw" number)
    o_pre, d_pre = jax.jit(front)(dirs_sensor, poses)
    o_pre, d_pre = jax.device_put(np.asarray(o_pre)), jax.device_put(
        np.asarray(d_pre))

    @jax.jit
    def a0(o, d):
        return kern(o, d)

    @jax.jit
    def a1(dirs_sensor, poses):  # + beam transform front-end
        o, d = front(dirs_sensor, poses)
        return kern(o, d)

    @jax.jit
    def u_now(dirs_sensor, poses):  # current unordered epilogue
        o, d = front(dirs_sensor, poses)
        t, slot = kern(o, d)
        t2 = t.reshape(w, r)
        hit = (jnp.isfinite(t) & (slot >= 0)).reshape(w, r)
        pts = (o + d * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]).reshape(
            w, r, 3)
        mask = hit & (t2 < tmax)
        return (jnp.where(mask[..., None], pts, 0.0),
                jnp.where(mask, t2, jnp.inf), mask)

    @jax.jit
    def u_nowhere(dirs_sensor, poses):  # skip the where-zeroing passes
        o, d = front(dirs_sensor, poses)
        t, slot = kern(o, d)
        t2 = t.reshape(w, r)
        hit = (jnp.isfinite(t) & (slot >= 0)).reshape(w, r)
        pts = (o + d * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]).reshape(
            w, r, 3)
        mask = hit & (t2 < tmax)
        return pts, t2, mask

    @jax.jit
    def u_pm(dirs_sensor, poses):  # points + mask ONLY (leanest product)
        o, d = front(dirs_sensor, poses)
        t, slot = kern(o, d)
        hit = (jnp.isfinite(t) & (slot >= 0)).reshape(w, r)
        pts = (o + d * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]).reshape(
            w, r, 3)
        mask = hit & (t.reshape(w, r) < tmax)
        return jnp.where(mask[..., None], pts, 0.0), mask

    @jax.jit
    def u_q16(dirs_sensor, poses):  # + in-program uint16 quantization
        pts, mask = u_pm(dirs_sensor, poses)
        m3 = mask[..., None]
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(m3, pts, big), axis=(0, 1))
        hi = jnp.max(jnp.where(m3, pts, -big), axis=(0, 1))
        scale = jnp.maximum(hi - lo, 1e-6) / 65535.0
        q = jnp.clip(jnp.round((pts - lo) / scale), 0.0, 65535.0
                     ).astype(jnp.uint16)
        return q, lo, scale, mask

    rows = [
        ("a0 kernel_only(prebuilt rays)", lambda: a0(o_pre, d_pre),
         lambda o: o[0]),
        ("a1 +beam_transform_frontend  ", lambda: a1(dirs_sensor, poses),
         lambda o: o[0]),
        ("u  unordered_now (pts,t,mask)", lambda: u_now(dirs_sensor, poses),
         lambda o: o[1]),
        ("u- no_where_zeroing          ", lambda: u_nowhere(
            dirs_sensor, poses), lambda o: o[1]),
        ("u2 points+mask only          ", lambda: u_pm(dirs_sensor, poses),
         lambda o: o[1]),
        ("uq +uint16_quantize_in_prog  ", lambda: u_q16(dirs_sensor, poses),
         lambda o: o[0]),
        ("f  scan_waypoints(unordered) ", lambda: scan_waypoints(
            asset, intr, jnp.asarray(poses), backend="mxu",
            outputs="unordered"), lambda b: b.t),
    ]
    for name, fn, leaf in rows:
        dt, _ = timeit(fn, lambda o: sync(leaf(o)))
        print(f"{name}: {dt * 1e3:7.1f} ms -> {n / dt / 1e6:5.2f} M rays/s",
              flush=True)


if __name__ == "__main__":
    main()
