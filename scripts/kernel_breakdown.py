#!/usr/bin/env python3
"""Where does raycast_mxu_components spend its time?

Times the production path's three phases separately on the headline
workload: the hierarchical candidate prepass, the pair-list build, and
the flat pairs kernel (+ fori fallback cond).  Throwaway diagnostics for
kernel iteration; not part of the product surface.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def timeit(fn, sync_leaf, reps=5):
    out = fn()
    sync_leaf(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync_leaf(out)
        times.append((time.perf_counter() - t0) / reps)
    return min(times), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=160_000)
    ap.add_argument("--waypoints", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--prepass-sweep", action="store_true",
                    help="sweep candidate_blocks chunk sizes and exit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench_kernel_iter import patch_ordered_scan_rays
    from bench_raycast import synthetic_room

    from ipcgen_tpu.ops import raycast_mxu as M
    from ipcgen_tpu.ops.scene_asset import build_scene_asset
    from ipcgen_tpu.utils.host import sync

    print(f"backend: {jax.default_backend()}")
    verts, tris = synthetic_room(args.tris)
    asset = build_scene_asset(verts, tris)
    nb = asset.num_blocks
    tb = asset.tri_data.shape[2]
    print(f"mesh: {len(tris)} tris, {nb} blocks")
    origins, dirs = patch_ordered_scan_rays(args.waypoints)
    o = jnp.asarray(origins)
    d = jnp.asarray(dirs)
    n = o.shape[0]
    n_tiles = n // M.TILE
    t_init = 25.0

    center = (jnp.nanmin(asset.block_lo, axis=0)
              + jnp.nanmax(asset.block_hi, axis=0)) * 0.5
    trif = M.build_trif(asset.tri_data, center)
    sync(trif)

    group = 8 if nb <= 8192 else (16 if nb <= 32768 else 32)
    gmax = 96 if nb <= 2048 else (128 if nb <= 8192 else 192)
    vmax = min(768, nb)

    if args.prepass_sweep:
        for c1, c2 in ((8, 4), (16, 4), (16, 8), (32, 8), (32, 16),
                       (64, 16), (64, 32)):
            def pp(c1=c1, c2=c2):
                return M.candidate_blocks(
                    o, d, asset.block_lo, asset.block_hi, t_max=t_init,
                    vmax=vmax, group=group, gmax=gmax,
                    chunk1=c1, chunk2=c2)

            dt, _ = timeit(pp, lambda out: sync(out[1]), args.reps)
            print(f"prepass chunk1={c1:3d} chunk2={c2:3d}: {dt*1e3:7.1f} ms")
        return

    # 1. prepass
    def prepass():
        return M.candidate_blocks(
            o, d, asset.block_lo, asset.block_hi, t_max=t_init,
            vmax=vmax, group=group, gmax=gmax)

    dt, (ids, counts, ovf, submasks) = timeit(
        prepass, lambda out: sync(out[1]), args.reps)
    cnts = np.asarray(counts)
    print(f"prepass: {dt*1e3:7.1f} ms  (counts mean {cnts.mean():.1f} "
          f"max {cnts.max()}, ovf {np.asarray(ovf).sum()})")

    # 2. full components call
    @functools.partial(jax.jit, static_argnames=())
    def full():
        return M.raycast_mxu_components(
            o, d, asset.tri_data, asset.block_lo, asset.block_hi,
            t_max=t_init, sort_rays=False)

    dt_full, out = timeit(full, lambda out: sync(out[0]), args.reps)
    print(f"full:    {dt_full*1e3:7.1f} ms  -> "
          f"{n/dt_full/1e6:.2f} M rays/s")

    # 3. pair build + flat kernel, prepass outputs held fixed
    f = M.ray_features(o - center, d).reshape(n_tiles, M.TILE, 16)
    sync(f)

    @jax.jit
    def pairs_only(ids, counts, ovf, submasks, f, trif):
        ts = []
        for s in range(0, n_tiles, M.MEGA):
            e = min(s + M.MEGA, n_tiles)
            cap = -(-(e - s) * M.PAIR_BUDGET // M._INNER) * M._INNER
            tiles_c, blocks_c, masks_c, n_steps, handled = \
                M._build_pair_list(
                    ids[:, s:e], counts[s:e], ovf[s:e],
                    submasks[:, s:e], cap)
            t_flat, s_flat = M._flat_call(
                tiles_c, blocks_c, masks_c, n_steps, f[s:e], trif,
                tb=tb, t_init=t_init)
            ts.append(t_flat)
        return jnp.concatenate(ts) if len(ts) > 1 else ts[0]

    dt_pairs, _ = timeit(
        lambda: pairs_only(ids, counts, ovf, submasks, f, trif),
        sync, args.reps)
    npairs = int(cnts.sum())
    print(f"pairs:   {dt_pairs*1e3:7.1f} ms  ({npairs} pairs, "
          f"{dt_pairs/max(npairs,1)*1e6:.2f} us/pair)")

    @jax.jit
    def build_only(ids, counts, ovf, submasks):
        outs = []
        for s in range(0, n_tiles, M.MEGA):
            e = min(s + M.MEGA, n_tiles)
            cap = -(-(e - s) * M.PAIR_BUDGET // M._INNER) * M._INNER
            outs.append(M._build_pair_list(
                ids[:, s:e], counts[s:e], ovf[s:e], submasks[:, s:e],
                cap)[3])
        return jnp.stack(outs)

    dt_build, _ = timeit(
        lambda: build_only(ids, counts, ovf, submasks), sync, args.reps)
    print(f"build:   {dt_build*1e3:7.1f} ms")
    resid = dt_full - dt - dt_pairs - dt_build
    print(f"resid:   {resid*1e3:7.1f} ms (ray_features, fori cond, "
          f"where-combine, dispatch)")


if __name__ == "__main__":
    main()
