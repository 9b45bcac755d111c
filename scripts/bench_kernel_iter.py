#!/usr/bin/env python3
"""Kernel-iteration harness: raw MXU raycast throughput on the headline
workload shape (20 waypoints x 128k-ray dense-32 scan, patch-ordered rays),
plus the 640k-tri and incoherent-ray stress cases.

Measures the kernel alone (no beam gen / masks / export) with the honest
host-read barrier, so kernel variants can be compared turn by turn.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def patch_ordered_scan_rays(num_waypoints=20, r=128_000, lines=32):
    from ipcgen_tpu.sim.scan import patch_permutation

    phis = np.tile(np.linspace(0, 2 * np.pi, r // lines, endpoint=False), lines)
    thetas = np.repeat(np.deg2rad(np.linspace(15, -20, lines)), r // lines)
    dirs = np.stack(
        [np.cos(thetas) * np.cos(phis), np.cos(thetas) * np.sin(phis),
         np.sin(thetas)], axis=1).astype(np.float32)
    perm = patch_permutation(lines, r // lines)
    dirs = dirs[perm]
    xs = np.linspace(1.0, 5.0, num_waypoints)
    origins = np.repeat(
        np.stack([xs, np.full(num_waypoints, 2.5), np.full(num_waypoints, 1.0)],
                 axis=1), r, axis=0).astype(np.float32)
    dirs = np.tile(dirs, (num_waypoints, 1))
    return origins, dirs


def _sharded_vs_fused(asset, args):
    """Identical 20-waypoint scan through scan_waypoints (fused single-chip)
    and scan_waypoints_sharded on a 1-device mesh: the delta is pure
    shard_map + collective-combine overhead (VERDICT r2 directive 4's bench
    note).  On one device the all_gather/argmin combine is degenerate, so
    this bounds the sharding machinery's cost, not ICI time."""
    import jax
    import numpy as np

    from ipcgen_tpu.models import Indoor8LineLidarIntrinsics
    from ipcgen_tpu.parallel.shard import (
        make_device_mesh,
        scan_waypoints_sharded,
    )
    from ipcgen_tpu.sim.scan import scan_waypoints
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch
    from ipcgen_tpu.utils.host import sync

    intr = Indoor8LineLidarIntrinsics.create_dense_32line()
    wps = [
        Waypoint(1.0 + 4.0 * i / max(args.waypoints - 1, 1), 2.5, 1.0,
                 0.17 * i)
        for i in range(args.waypoints)
    ]
    poses = waypoints_to_pose_batch(wps)
    key = jax.random.PRNGKey(0)
    mesh1 = make_device_mesh(1)

    results = {}
    for name, fn in (
        ("fused", lambda: scan_waypoints(asset, intr, poses, key=key)),
        ("sharded_1dev", lambda: scan_waypoints_sharded(
            asset, intr, poses, mesh1, key=key)),
    ):
        batch = fn()
        sync(batch.t)
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                batch = fn()
            sync(batch.t)
            times.append((time.time() - t0) / args.reps)
        n_rays = int(np.prod(np.asarray(batch.t.shape)))
        dt = min(times)
        results[name] = (dt, n_rays / dt)
        print(f"{name}: {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} M rays/s")
    delta = results["sharded_1dev"][0] - results["fused"][0]
    print(f"sharded-vs-fused single-chip delta: {delta*1e3:+.1f} ms "
          f"({delta / results['fused'][0] * 100:+.1f}%)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=160_000)
    ap.add_argument("--block-size", type=int, default=128,
                    help="triangles per leaf block (finer blocks cull "
                    "tighter per pair at more pairs + fixed per-step cost)")
    ap.add_argument("--pair-budget", type=int, default=None,
                    help="override raycast_mxu.PAIR_BUDGET for tuning")
    ap.add_argument("--mega", type=int, default=None,
                    help="override raycast_mxu.MEGA (tiles per dispatch); "
                    "keep 3*mega*pair_budget*4B within SMEM")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--waypoints", type=int, default=20)
    ap.add_argument("--incoherent", action="store_true")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--backend", default="mxu")
    ap.add_argument("--tile", type=int, default=None,
                    help="rays per kernel tile (None = per-path default)")
    ap.add_argument("--nsub", type=int, default=None,
                    help="subtile-mask granularity (None = default)")
    ap.add_argument(
        "--sharded", action="store_true",
        help="run the full scan through scan_waypoints_sharded on a "
        "1-device mesh vs the fused single-chip scan_waypoints — the "
        "sharded-vs-fused delta (shard_map + collective overhead) on "
        "identical work",
    )
    args = ap.parse_args()

    import jax
    from bench_raycast import synthetic_room

    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.utils.host import sync

    print(f"backend: {jax.default_backend()}")
    if args.pair_budget or args.mega:
        from ipcgen_tpu.ops import raycast_mxu as _rm

        if args.pair_budget:
            _rm.PAIR_BUDGET = args.pair_budget
        if args.mega:
            _rm.MEGA = args.mega
        print(f"tuning: PAIR_BUDGET={_rm.PAIR_BUDGET} MEGA={_rm.MEGA}")
    verts, tris = synthetic_room(args.tris)
    asset = build_scene_asset(verts, tris, block_size=args.block_size)
    print(f"mesh: {len(tris)} tris, {asset.num_blocks} blocks "
          f"(block_size={args.block_size})")

    if args.sharded:
        _sharded_vs_fused(asset, args)
        return

    if args.incoherent:
        rng = np.random.default_rng(0)
        n = 2_560_000
        origins = rng.uniform([0.5, 0.5, 0.3], [5.5, 4.5, 2.2], (n, 3)).astype(np.float32)
        dirs = rng.normal(size=(n, 3))
        dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(np.float32)
    else:
        origins, dirs = patch_ordered_scan_rays(args.waypoints)
    n = len(dirs)

    import functools

    import jax.numpy as jnp

    if args.backend == "mxu":
        from ipcgen_tpu.ops.raycast_mxu import raycast_mxu_components

        @functools.partial(
            jax.jit, static_argnames=("sort_rays", "tile", "n_sub")
        )
        def run(o, d, a, sort_rays=False, tile=None, n_sub=None):
            return raycast_mxu_components(
                o, d, a.tri_data, a.block_lo, a.block_hi, t_max=25.0,
                sort_rays=sort_rays, tile=tile, n_sub=n_sub)
    else:
        raise SystemExit(f"unknown backend {args.backend}")

    o = jnp.asarray(origins)
    d = jnp.asarray(dirs)
    out = run(o, d, asset, sort_rays=args.sort, tile=args.tile,
              n_sub=args.nsub)
    sync(out[0])
    # Amortized timing: the tunnel costs ~31 ms of fixed RTT per sync (the
    # eager reduction + host read), so a single-dispatch measurement carries
    # a constant additive bias.  Back-to-back dispatches serialize on the
    # device; timing `reps` of them under ONE sync isolates the per-call
    # device time.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run(o, d, asset, sort_rays=args.sort, tile=args.tile,
                      n_sub=args.nsub)
        sync(out[0])
        times.append((time.perf_counter() - t0) / args.reps)
    dt = min(times)
    t = np.asarray(out[0])
    hits = np.isfinite(t)
    print(f"{args.backend}{' +sort' if args.sort else ''}: {dt*1e3:.1f} ms -> "
          f"{n/dt/1e6:.2f} M rays/s  ({hits.mean()*100:.1f}% hits, "
          f"mean t={t[hits].mean():.3f})")


if __name__ == "__main__":
    main()
