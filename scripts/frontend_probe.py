#!/usr/bin/env python3
"""Price the beam-transform front-end variants ahead of the MXU kernel.

The unordered-path bisect (scripts/scan_unordered_bisect.py) measured the
front-end (perm gather + pose rotation + origin broadcast) at ~26 ms over
the bare kernel on the 2.56 M-ray / 160 k-tri bench room.  This ladder
compares rotation formulations fused with the kernel to find the cheap one.
Throwaway diagnostics, not product surface.
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
    perm_d = jnp.asarray(perm)
    # Hoisted: permuted sensor dirs precomputed once per profile.
    dirs_sp_pre = jnp.asarray(np.asarray(dirs_sensor)[:, np.asarray(perm)])
    tmax = float(intr.max_range)

    def kern(o, d):
        return raycast_mxu_components(
            o, d, asset.tri_data, asset.block_lo, asset.block_hi,
            t_max=tmax, sort_rays=False)

    def origins_of(poses):
        return jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3)).reshape(
            n, 3)

    @jax.jit
    def a0(o, d):
        return kern(o, d)

    @jax.jit
    def v_now(dirs_sensor, poses):  # einsum HIGHEST + in-jit perm gather
        dirs_sp = dirs_sensor[:, perm_d]
        dirs_wp = jnp.einsum(
            "wnk,wjk->wnj", jnp.broadcast_to(dirs_sp, (w, r, 3)),
            poses[:, :3, :3], precision=jax.lax.Precision.HIGHEST)
        return kern(origins_of(poses), dirs_wp.reshape(n, 3))

    @jax.jit
    def v_pre(dirs_sp, poses):  # hoisted perm gather, einsum HIGHEST
        dirs_wp = jnp.einsum(
            "wnk,wjk->wnj", jnp.broadcast_to(dirs_sp, (w, r, 3)),
            poses[:, :3, :3], precision=jax.lax.Precision.HIGHEST)
        return kern(origins_of(poses), dirs_wp.reshape(n, 3))

    @jax.jit
    def v_manual(dirs_sp, poses):  # hoisted gather + VPU mul-add rotation
        R = poses[:, :3, :3]  # (W, 3, 3)
        d = dirs_sp  # (1, R, 3)
        dirs_wp = (
            d[..., 0:1] * R[:, None, :, 0]
            + d[..., 1:2] * R[:, None, :, 1]
            + d[..., 2:3] * R[:, None, :, 2]
        )
        return kern(origins_of(poses), dirs_wp.reshape(n, 3))

    @jax.jit
    def v_default(dirs_sp, poses):  # einsum default precision
        dirs_wp = jnp.einsum(
            "wnk,wjk->wnj", jnp.broadcast_to(dirs_sp, (w, r, 3)),
            poses[:, :3, :3])
        return kern(origins_of(poses), dirs_wp.reshape(n, 3))

    o_pre, d_pre = jax.jit(
        lambda ds, p: (origins_of(p),
                       jnp.einsum("wnk,wjk->wnj",
                                  jnp.broadcast_to(ds, (w, r, 3)),
                                  p[:, :3, :3],
                                  precision=jax.lax.Precision.HIGHEST
                                  ).reshape(n, 3))
    )(dirs_sp_pre, poses)
    o_pre = jax.device_put(np.asarray(o_pre))
    d_pre = jax.device_put(np.asarray(d_pre))

    rows = [
        ("a0 kernel_only       ", lambda: a0(o_pre, d_pre)),
        ("v  einsumH + in-gather", lambda: v_now(dirs_sensor, poses)),
        ("vp einsumH hoisted    ", lambda: v_pre(dirs_sp_pre, poses)),
        ("vm manual VPU hoisted ", lambda: v_manual(dirs_sp_pre, poses)),
        ("vd einsum default     ", lambda: v_default(dirs_sp_pre, poses)),
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
            diff = np.nanmax(np.abs(np.where(np.isfinite(out), out, 0.0)
                                    - np.where(np.isfinite(ref), ref, 0.0)))
            print(f"   max |t - ref|: {diff:.2e}")


if __name__ == "__main__":
    main()
