#!/usr/bin/env python3
"""Bisect the fused-scan overhead: which piece of _scan_core costs 50 ms?

scan_breakdown r4 measured the fused scan ~50 ms SLOWER than the sum of
its standalone stages (205 vs 154 ms real on the 20x128k dense-32 bench
room) — fusing everything into one program costs, which inverts the r2
rationale (eager dispatch over the tunnel).  This probe compiles a ladder
of programs, each adding one piece of _scan_core, to locate the cost.
Throwaway diagnostics, not product surface.
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def timeit(fn, sync, reps=5, queue=4):
    out = fn()
    sync(out)
    best = []
    for _ in range(3):
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
    from ipcgen_tpu.ops.raycast import finalize_result
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
    perm, inv_perm = scan_permutation(intr, "mxu", r)
    perm_d = jnp.asarray(perm)
    inv_d = jnp.asarray(inv_perm)
    keep = jnp.ones((1, r), bool)
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

    @jax.jit
    def ladder_a(dirs_sensor, poses):  # beam+transform+kernel raw
        o, d = front(dirs_sensor, poses)
        return kern(o, d)

    @jax.jit
    def ladder_b(dirs_sensor, poses):  # + finalize
        o, d = front(dirs_sensor, poses)
        t, slot = kern(o, d)
        return finalize_result(o, d, t, slot, asset)

    @jax.jit
    def ladder_c(dirs_sensor, poses):  # + masks/incidence, patch order
        o, d = front(dirs_sensor, poses)
        t, slot = kern(o, d)
        res = finalize_result(o, d, t, slot, asset)
        t2 = res.t.reshape(w, r)
        hit = res.hit.reshape(w, r)
        points = res.points.reshape(w, r, 3)
        normals = res.normals.reshape(w, r, 3)
        dw = d.reshape(w, r, 3)
        mask = hit & jnp.broadcast_to(keep[:, perm_d], (w, r)) & (t2 < tmax)
        incident = jnp.degrees(jnp.arccos(jnp.clip(jnp.abs(dw[..., 2]), 0, 1)))
        incident = jnp.where(mask, incident, 0.0)
        cos_t = jnp.clip(jnp.abs(jnp.sum(dw * normals, axis=-1)), 0, 1)
        true_inc = jnp.where(mask, jnp.degrees(jnp.arccos(cos_t)), 0.0)
        return (jnp.where(mask[..., None], points, 0.0),
                jnp.where(mask, t2, jnp.inf), mask, incident,
                jnp.where(mask[..., None], normals, 0.0), true_inc)

    @jax.jit
    def ladder_d(dirs_sensor, poses):  # + per-output inverse perm (current)
        outs = ladder_c(dirs_sensor, poses)
        return tuple(x[:, inv_d] for x in outs)

    @jax.jit
    def ladder_e(dirs_sensor, poses):  # + ONE stacked inverse perm
        pts, t2, mask, inc, nrm, tinc = ladder_c(dirs_sensor, poses)
        stacked = jnp.concatenate(
            [pts, nrm, t2[..., None], inc[..., None], tinc[..., None],
             mask[..., None].astype(jnp.float32)], axis=-1)
        out = stacked[:, inv_d]
        return (out[..., 0:3], out[..., 9], out[..., 10] > 0.5,
                out[..., 9], out[..., 3:6], out[..., 8])

    for name, fn, leaf in (
        ("a kern_raw ", lambda: ladder_a(dirs_sensor, poses), lambda o: o[0]),
        ("b +finalize", lambda: ladder_b(dirs_sensor, poses), lambda o: o.t),
        ("c +epilogue", lambda: ladder_c(dirs_sensor, poses), lambda o: o[1]),
        ("d +invperm6", lambda: ladder_d(dirs_sensor, poses), lambda o: o[1]),
        ("e +invperm1", lambda: ladder_e(dirs_sensor, poses), lambda o: o[1]),
        ("f scan_waypoints", lambda: scan_waypoints(
            asset, intr, jnp.asarray(poses), backend="mxu"),
         lambda b: b.t),
    ):
        dt, _ = timeit(fn, lambda o: sync(leaf(o)))
        print(f"{name}: {dt*1e3:7.1f} ms -> {n/dt/1e6:5.2f} M rays/s",
              flush=True)


if __name__ == "__main__":
    main()
