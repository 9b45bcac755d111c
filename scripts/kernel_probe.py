#!/usr/bin/env python3
"""Probe where the pairs-kernel time goes: DMA+loop floor, matmul-only,
epilogue-only (resident panel), and the full kernel.  Throwaway diagnostics
for kernel iteration; not part of the product surface.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/scripts")
from bench_kernel_iter import patch_ordered_scan_rays
from bench_raycast import synthetic_room

from ipcgen_tpu.ops import raycast_mxu as M
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.utils.host import sync

TILE = M.TILE
_BIG = 3.0e38


def make_kernel(mode, tb, nb, vmax, t_init):
    def kern(f_ref, ids_ref, counts_ref, ovf_ref, trif_hbm, t_out, i_out,
             trif_vmem, sems):
        pid = pl.program_id(0)
        f = f_ref[0]
        ovf = ovf_ref[pid] != 0
        trip = jnp.where(ovf, nb, counts_ref[pid])

        def block_id(v):
            return jnp.where(ovf, v, ids_ref[jnp.minimum(v, vmax - 1), pid])

        init_key = M._key_const(t_init)
        init = (
            jnp.full((TILE, tb), init_key, jnp.int32),
            jnp.full((TILE, tb), 0, jnp.int32),
        )
        f_hi = f.astype(jnp.bfloat16).astype(jnp.float32)
        f_cat = jnp.concatenate([f_hi, f_hi, f - f_hi], axis=1)

        def body(v, carry):
            best_key, best_blk = carry
            b = block_id(v)
            if mode != "nodma":
                cp = pltpu.make_async_copy(trif_hbm.at[b], trif_vmem, sems)
                cp.start()
                cp.wait()
            if mode == "dmaonly":
                # touch one lane of the panel so the DMA can't be elided
                best_key = jnp.minimum(
                    best_key,
                    jax.lax.bitcast_convert_type(trif_vmem[0:1, :tb], jnp.int32),
                )
                return best_key, best_blk
            g = jnp.dot(f_cat, trif_vmem[:], preferred_element_type=jnp.float32)
            if mode == "matmul":
                best_key = jnp.minimum(
                    best_key,
                    jax.lax.bitcast_convert_type(g[:, :tb], jnp.int32))
                return best_key, best_blk
            i0 = jax.lax.bitcast_convert_type(g[:, 0 * tb:1 * tb], jnp.int32)
            i1 = jax.lax.bitcast_convert_type(g[:, 1 * tb:2 * tb], jnp.int32)
            i2 = jax.lax.bitcast_convert_type(g[:, 2 * tb:3 * tb], jnp.int32)
            tnum = g[:, 3 * tb:4 * tb]
            tden = g[:, 4 * tb:5 * tb]
            ok = ((i0 ^ i1) | (i0 ^ i2)) >= 0
            t = tnum / tden
            ok = ok & (t > 1e-6) & (jnp.abs(tden) > 1e-9)
            key = jnp.where(
                ok, jax.lax.bitcast_convert_type(t, jnp.int32), init_key)
            take = key < best_key
            return (jnp.where(take, key, best_key),
                    jnp.where(take, b, best_blk))

        best_key, best_blk = jax.lax.fori_loop(0, trip, body, init)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, tb), 1)
        kmin = jnp.min(best_key, axis=1, keepdims=True)
        packed = best_blk * tb + lane
        slot = jnp.min(
            jnp.where(best_key == kmin, packed,
                      jnp.int32(np.iinfo(np.int32).max)),
            axis=1, keepdims=True)
        miss = kmin >= init_key
        t_out[0] = jax.lax.bitcast_convert_type(kmin, jnp.float32)
        i_out[0] = jnp.where(miss, -1, slot)

    return kern


@functools.partial(jax.jit, static_argnames=("mode", "tb", "nb", "vmax", "t_init"))
def call(f_tiles, ids, counts, ovf, trif, *, mode, tb, nb, vmax, t_init):
    n_tiles = f_tiles.shape[0]
    kern = make_kernel(mode, tb, nb, vmax, t_init)
    t, slot = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((48, 5 * tb), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(f_tiles, ids, counts, ovf, trif)
    return t.reshape(-1), slot.reshape(-1)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    verts, tris = synthetic_room(160_000)
    asset = build_scene_asset(verts, tris)
    origins, dirs = patch_ordered_scan_rays(20)
    o = jnp.asarray(origins)
    d = jnp.asarray(dirs)
    n = len(dirs)
    nt = n // TILE
    nb = asset.num_blocks
    center = (jnp.nanmin(asset.block_lo, axis=0)
              + jnp.nanmax(asset.block_hi, axis=0)) * 0.5
    trif = M.build_trif(asset.tri_data, center)
    ids, counts, ovf = M.candidate_blocks(
        o, d, asset.block_lo, asset.block_hi, t_max=25.0, vmax=M.VMAX)
    f = M.ray_features(o - center, d).reshape(nt, TILE, 16)
    ovf_i = ovf.astype(jnp.int32)
    sync(f)
    pairs = int(np.asarray(counts).sum())
    print(f"{nt} tiles, {pairs} pairs", flush=True)

    for mode in sys.argv[1:] or ["dmaonly", "matmul", "nodma", "full"]:
        def run():
            outs = []
            for s in range(0, nt, M.MEGA):
                e = min(s + M.MEGA, nt)
                outs.append(call(
                    f[s:e], ids[:, s:e], counts[s:e], ovf_i[s:e], trif,
                    mode=mode, tb=128, nb=nb, vmax=M.VMAX, t_init=25.0))
            return outs
        outs = run()
        sync(outs[-1][0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = run()
            sync(outs[-1][0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{mode:8s}: {dt*1e3:7.1f} ms  ({dt/pairs*1e6:.2f} us/pair)",
              flush=True)


if __name__ == "__main__":
    main()
