#!/usr/bin/env python3
"""Decompose scan_waypoints wall time into sub-jit spans on the device.

The fused scan (`sim/scan.py::_scan_core`) measures notably slower per ray
than `raycast_mxu_components` alone on identical patch-ordered rays
(bench.py box scan vs scripts/kernel_breakdown.py).  This probe times the
scan's constituent stages as STANDALONE jits — beam generation, pose
transform + patch permutation, the raycast (components and the full
asset entry with normals/points), and the noise/mask/incidence epilogue —
so the gap is attributable before any of it is attacked.  Standalone sums
can exceed the fused time (XLA overlaps stages inside one program); the
interesting signal is any stage whose standalone time rivals the kernel's.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def timeit(fn, sync, reps):
    out = fn()
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=160_000)
    ap.add_argument("--waypoints", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench_raycast import synthetic_room

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
    from ipcgen_tpu.models import beams
    from ipcgen_tpu.ops.raycast import raycast_asset
    from ipcgen_tpu.ops import raycast_mxu as M
    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.sim.scan import (
        scan_permutation,
        scan_waypoints,
        sensor_dirs_batch,
    )
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch
    from ipcgen_tpu.utils.host import sync

    print(f"backend: {jax.default_backend()}")
    verts, tris = synthetic_room(args.tris)
    asset = build_scene_asset(verts, tris)
    intr = Indoor8LineLidarIntrinsics.create_dense_32line()
    wps = [
        Waypoint(1.0 + 4.0 * i / max(args.waypoints - 1, 1), 2.5, 1.0,
                 0.17 * i)
        for i in range(args.waypoints)
    ]
    poses = jnp.asarray(waypoints_to_pose_batch(wps), jnp.float32)
    key = jax.random.PRNGKey(0)
    w = args.waypoints

    # 1. beam generation (per-waypoint sensor dirs + dropout keep mask)
    gen = jax.jit(functools.partial(sensor_dirs_batch, intr, w))
    dt_gen, (dirs_sensor, keep) = timeit(
        lambda: gen(key), lambda o: sync(o[0]), args.reps)
    r = dirs_sensor.shape[1]
    n = w * r
    print(f"rays: {n} ({w} x {r})")
    print(f"beam gen:   {dt_gen*1e3:7.1f} ms")

    # 2. pose transform + patch permutation + flatten (permute-before-rotate
    # as in _scan_core; origins are a broadcast, never gathered)
    perm, inv_perm = scan_permutation(intr, "mxu", r)
    perm_d = jnp.asarray(perm)

    @jax.jit
    def transform(dirs_sensor, poses, perm_d):
        dirs_sp = dirs_sensor[:, perm_d]
        dirs_wp = beams.dirs_to_world_batch(
            jnp.broadcast_to(dirs_sp, (w, r, 3)), poses)
        origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
        return (origins.reshape(n, 3), dirs_wp.reshape(n, 3))

    dt_tr, (o_p, d_p) = timeit(
        lambda: transform(dirs_sensor, poses, perm_d),
        lambda o: sync(o[0]), args.reps)
    print(f"transform:  {dt_tr*1e3:7.1f} ms  (world dirs + permute)")

    # 3a. kernel components only (t, slot)
    comp = jax.jit(lambda o, d: M.raycast_mxu_components(
        o, d, asset.tri_data, asset.block_lo, asset.block_hi,
        t_max=float(intr.max_range), sort_rays=False))
    dt_comp, _ = timeit(
        lambda: comp(o_p, d_p), lambda o: sync(o[0]), args.reps)
    print(f"components: {dt_comp*1e3:7.1f} ms  -> "
          f"{n/dt_comp/1e6:.2f} M rays/s")

    # 3b. full raycast_asset (components + tri_id/normals/points gathers)
    rc = jax.jit(lambda o, d: raycast_asset(
        o, d, asset, backend="mxu", t_max=float(intr.max_range)))
    dt_rc, res = timeit(
        lambda: rc(o_p, d_p), lambda o: sync(o.t), args.reps)
    print(f"raycast:    {dt_rc*1e3:7.1f} ms  (finalize adds "
          f"{(dt_rc-dt_comp)*1e3:.1f})")

    # 4. post-raycast epilogue (masks + incidences in patch order, then one
    # inverse permutation per output) as its own jit
    inv_d = jnp.asarray(inv_perm)

    @jax.jit
    def epilogue(t, hit, points, normals, d_p, keep, inv_d):
        t = t.reshape(w, r)
        hit = hit.reshape(w, r)
        points = points.reshape(w, r, 3)
        normals = normals.reshape(w, r, 3)
        dirs_wp = d_p.reshape(w, r, 3)
        mask = hit & keep[:, perm_d] & (t < float(intr.max_range))
        incident = jnp.degrees(
            jnp.arccos(jnp.clip(jnp.abs(dirs_wp[..., 2]), 0.0, 1.0)))
        cos_true = jnp.clip(
            jnp.abs(jnp.sum(dirs_wp * normals, axis=-1)), 0.0, 1.0)
        true_inc = jnp.where(mask, jnp.degrees(jnp.arccos(cos_true)), 0.0)
        return (jnp.where(mask[..., None], points, 0.0)[:, inv_d],
                jnp.where(mask, t, jnp.inf)[:, inv_d], mask[:, inv_d],
                jnp.where(mask, incident, 0.0)[:, inv_d],
                true_inc[:, inv_d])

    dt_ep, _ = timeit(
        lambda: epilogue(res.t, res.hit, res.points, res.normals,
                         d_p, keep, inv_d),
        lambda o: sync(o[1]), args.reps)
    print(f"epilogue:   {dt_ep*1e3:7.1f} ms  (masks + angles + unpermute)")

    # 5. the real fused scan
    dt_full, batch = timeit(
        lambda: scan_waypoints(asset, intr, poses, key=key, backend="mxu"),
        lambda b: sync(b.t), args.reps)
    print(f"fused scan: {dt_full*1e3:7.1f} ms  -> "
          f"{n/dt_full/1e6:.2f} M rays/s")
    parts = dt_gen + dt_tr + dt_rc + dt_ep
    print(f"sum parts:  {parts*1e3:7.1f} ms  (fused - parts = "
          f"{(dt_full-parts)*1e3:+.1f})")


if __name__ == "__main__":
    main()
