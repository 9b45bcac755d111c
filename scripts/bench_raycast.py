#!/usr/bin/env python3
"""Micro-benchmark of the raycast kernel on real TPU hardware.

Builds a synthetic 'furnished room' mesh (inward box + boxes as furniture,
subdivided to a target triangle count) and measures rays/sec for the Pallas
kernel and the XLA block-scan path.
"""

import argparse
import time

import numpy as np


def subdivide(verts, tris, levels=1):
    """Loop-style 1->4 subdivision (no smoothing) to scale triangle counts."""
    for _ in range(levels):
        c = verts[tris]  # (T,3,3)
        m01 = (c[:, 0] + c[:, 1]) / 2
        m12 = (c[:, 1] + c[:, 2]) / 2
        m20 = (c[:, 2] + c[:, 0]) / 2
        new_pts = np.concatenate([c[:, 0], c[:, 1], c[:, 2], m01, m12, m20], axis=0)
        t = len(tris)
        i0, i1, i2 = np.arange(t), np.arange(t) + t, np.arange(t) + 2 * t
        a, b, cc = np.arange(t) + 3 * t, np.arange(t) + 4 * t, np.arange(t) + 5 * t
        new_tris = np.concatenate(
            [
                np.stack([i0, a, cc], 1),
                np.stack([a, i1, b], 1),
                np.stack([cc, b, i2], 1),
                np.stack([a, b, cc], 1),
            ]
        )
        verts, tris = new_pts, new_tris.astype(np.int32)
    return verts, tris


def synthetic_room(target_tris: int, seed: int = 0):
    from ipcgen_tpu.containers import TriMesh

    rng = np.random.default_rng(seed)
    room = TriMesh.box(center=(3, 2.5, 1.25), size=(6, 5, 2.5), inward=True)
    verts = [room.vertices]
    tris = [room.triangles]
    off = len(room.vertices)
    for _ in range(12):  # furniture boxes
        cx, cy = rng.uniform(0.5, 5.5), rng.uniform(0.5, 4.5)
        sx, sy, sz = rng.uniform(0.3, 1.2, 3)
        b = TriMesh.box(center=(cx, cy, sz / 2), size=(sx, sy, sz))
        verts.append(b.vertices)
        tris.append(b.triangles + off)
        off += len(b.vertices)
    v = np.concatenate(verts)
    t = np.concatenate(tris).astype(np.int32)
    levels = 0
    while len(t) * 4 <= target_tris:
        v, t = subdivide(v, t)
        levels += 1
    return v.astype(np.float32), t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200_000)
    ap.add_argument("--rays", type=int, default=128_000)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--super-factor", type=int, default=8)
    ap.add_argument("--backend", choices=["mxu", "pallas", "xla", "all"], default="mxu")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from ipcgen_tpu.ops.raycast import raycast_asset_xla
    from ipcgen_tpu.ops.raycast_pallas import raycast_asset_pallas
    from ipcgen_tpu.ops.scene_asset import build_scene_asset

    verts, tris = synthetic_room(args.tris)
    print(f"mesh: {len(verts)} verts, {len(tris)} tris")
    t0 = time.perf_counter()
    asset = build_scene_asset(
        verts, tris, block_size=args.block_size, super_factor=args.super_factor
    )
    print(f"asset build: {time.perf_counter()-t0:.3f}s, "
          f"{asset.num_blocks} blocks, {asset.num_supers} supers")

    # 32-line style scan pattern from the room center
    n = args.rays
    phis = np.tile(np.linspace(0, 2 * np.pi, n // 32, endpoint=False), 32)
    thetas = np.repeat(np.deg2rad(np.linspace(15, -20, 32)), n // 32)
    dirs = np.stack(
        [np.cos(thetas) * np.cos(phis), np.cos(thetas) * np.sin(phis), np.sin(thetas)],
        axis=1,
    ).astype(np.float32)
    origins = np.tile(np.array([3.0, 2.5, 1.0], np.float32), (len(dirs), 1))

    from ipcgen_tpu.utils.host import sync

    def bench(name, fn):
        res = fn()
        sync(res.t)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res = fn()
            sync(res.t)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        hits = int(np.asarray(res.hit).sum())
        print(
            f"{name}: {dt*1e3:.2f} ms -> {len(dirs)/dt/1e6:.2f} M rays/s "
            f"({hits}/{len(dirs)} hits, mean t={np.asarray(res.t)[np.asarray(res.hit)].mean():.3f})"
        )
        return res

    if args.backend in ("mxu", "all"):
        from ipcgen_tpu.ops.raycast_mxu import raycast_asset_mxu

        bench("mxu", lambda: raycast_asset_mxu(origins, dirs, asset, t_max=25.0))
    if args.backend in ("pallas", "all"):
        bench(
            "pallas",
            lambda: raycast_asset_pallas(origins, dirs, asset, t_max=25.0, rows=args.rows),
        )
    if args.backend in ("xla", "all"):
        bench("xla", lambda: raycast_asset_xla(origins, dirs, asset))


if __name__ == "__main__":
    main()
