#!/usr/bin/env python3
"""Standalone front-end cost: produce the kernel's inputs WITHOUT the kernel.

The kernel's real per-ray input is the (n_tiles, TILE, 16) Plucker feature
f = [d, o x d, o - c, 1, 0*6] (ops/raycast_mxu.py ray_features) plus the
(T, TILE, 3) o/d tiles for the candidate prepass.  Because sensor-frame ray
origins are zero, the world feature is AFFINE in the static sensor dirs:
f = d_s @ A_w + c_w with A_w = [R | cross(t-?)..] per waypoint — one
MXU matmul, no (N, 3) intermediates.  Times each formulation standalone.
Throwaway diagnostics, not product surface.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def timeit(fn, sync, reps=3, queue=8):
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

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics, beams
    from ipcgen_tpu.ops.raycast_mxu import ray_features
    from ipcgen_tpu.sim.scan import scan_permutation
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch
    from ipcgen_tpu.utils.host import sync

    print(f"backend: {jax.default_backend()}")
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
    center = jnp.zeros((3,), jnp.float32)
    tile = 2048
    n_tiles = n // tile

    @jax.jit
    def w_od(dirs_sp, poses):
        # Current: world o/d as (N, 3) + f via ray_features.
        dirs_wp = jnp.einsum(
            "wnk,wjk->wnj", jnp.broadcast_to(dirs_sp, (w, r, 3)),
            poses[:, :3, :3])
        origins = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3))
        o = origins.reshape(n, 3)
        d = dirs_wp.reshape(n, 3)
        f = ray_features(o - center, d).reshape(n_tiles, tile, 16)
        return o, d, f

    @jax.jit
    def w_affine(dirs_sp, poses):
        # f = d_s @ A + c per waypoint; o/d sliced back out of f for the
        # prepass (o is constant per waypoint -> tiny (W,3)).
        R = poses[:, :3, :3]  # (W,3,3)
        t = poses[:, :3, 3]  # (W,3)
        tc = t - center
        # cross(t) matrix rows: m = (o x d) = t x (R d) = (cross(t) R) d
        zeros = jnp.zeros_like(t[:, 0])
        cx = jnp.stack([
            jnp.stack([zeros, -tc[:, 2], tc[:, 1]], -1),
            jnp.stack([tc[:, 2], zeros, -tc[:, 0]], -1),
            jnp.stack([-tc[:, 1], tc[:, 0], zeros], -1),
        ], 1)  # (W,3,3)
        M = jnp.matmul(cx, R)  # (W,3,3): m = M d_s
        A = jnp.concatenate([R, M, jnp.zeros((w, 3, 3)),
                             jnp.zeros((w, 3, 7))], axis=2)  # (W,3,16)? no
        # rows of A must map d_s (3,) -> f (16,): use (W, 16, 3)
        A = jnp.concatenate([
            R, M, jnp.zeros((w, 10, 3), jnp.float32)], axis=1)  # (W,16,3)
        c = jnp.concatenate([
            jnp.zeros((w, 6), jnp.float32), tc,
            jnp.ones((w, 1), jnp.float32),
            jnp.zeros((w, 6), jnp.float32)], axis=1)  # (W,16)
        f = jnp.einsum("wnk,wfk->wnf", jnp.broadcast_to(dirs_sp, (w, r, 3)),
                       A) + c[:, None, :]
        f = f.reshape(n_tiles, tile, 16)
        d = f[..., 0:3].reshape(n, 3)
        o = jnp.broadcast_to(poses[:, None, :3, 3], (w, r, 3)).reshape(n, 3)
        return o, d, f

    @jax.jit
    def w_f_only(dirs_sp, poses):
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        tc = t - center
        zeros = jnp.zeros_like(t[:, 0])
        cx = jnp.stack([
            jnp.stack([zeros, -tc[:, 2], tc[:, 1]], -1),
            jnp.stack([tc[:, 2], zeros, -tc[:, 0]], -1),
            jnp.stack([-tc[:, 1], tc[:, 0], zeros], -1),
        ], 1)
        M = jnp.matmul(cx, R)
        A = jnp.concatenate([R, M, jnp.zeros((w, 10, 3), jnp.float32)],
                            axis=1)
        c = jnp.concatenate([
            jnp.zeros((w, 6), jnp.float32), tc,
            jnp.ones((w, 1), jnp.float32),
            jnp.zeros((w, 6), jnp.float32)], axis=1)
        f = jnp.einsum("wnk,wfk->wnf", jnp.broadcast_to(dirs_sp, (w, r, 3)),
                       A) + c[:, None, :]
        return f.reshape(n_tiles, tile, 16)

    rows = [
        ("od+features (current)", lambda: w_od(dirs_sp, poses),
         lambda o: o[2]),
        ("affine f + od slices ", lambda: w_affine(dirs_sp, poses),
         lambda o: o[2]),
        ("affine f ONLY        ", lambda: w_f_only(dirs_sp, poses),
         lambda o: o),
    ]
    for name, fn, leaf in rows:
        dt = timeit(fn, lambda o: sync(leaf(o)))
        print(f"{name}: {dt * 1e3:7.2f} ms", flush=True)
    fa = np.asarray(w_od(dirs_sp, poses)[2])
    fb = np.asarray(w_affine(dirs_sp, poses)[2])
    print(f"max |f_affine - f_ref|: {np.abs(fa - fb).max():.2e}")


if __name__ == "__main__":
    main()
