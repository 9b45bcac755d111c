#!/usr/bin/env python3
"""Microbench of _grid_nn_core variants at the label-transfer scale."""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ipcgen_tpu.ops import grid_nn
from ipcgen_tpu.utils.host import sync as device_sync
from scripts.label_transfer_probe import surface_cloud


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def core_flat(queries, refs_sorted, starts, lo, inv_h, dims, cap, q_block):
    """Variant B: all 8 offsets in ONE flattened (B, 8*cap) candidate gather."""
    table_mask = starts.shape[0] - 2
    m = refs_sorted.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)  # (B,3)
        c = base[:, None, :] + offs[None, :, :]  # (B, 8, 3)
        in_grid = jnp.all((c >= 0) & (c < dims), axis=-1)  # (B, 8)
        cu = c.astype(jnp.uint32)
        hsh = (
            cu[..., 0] * jnp.uint32(grid_nn._P1)
            ^ cu[..., 1] * jnp.uint32(grid_nn._P2)
            ^ cu[..., 2] * jnp.uint32(grid_nn._P3)
        )
        cid = (hsh & jnp.uint32(table_mask)).astype(jnp.int32)  # (B, 8)
        s = starts[cid]
        e = starts[cid + 1]
        ovf = jnp.any(in_grid & ((e - s) > cap), axis=1)
        idx = s[..., None] + jnp.arange(cap, dtype=jnp.int32)  # (B,8,cap)
        valid = (idx < e[..., None]) & in_grid[..., None]
        idx_c = jnp.clip(idx, 0, m - 1).reshape(q_block, 8 * cap)
        valid = valid.reshape(q_block, 8 * cap)
        cand = refs_sorted[idx_c]  # (B, 8*cap, 3)
        d2 = jnp.sum((q[:, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
        bi = jnp.take_along_axis(idx_c, best[:, None], axis=1)[:, 0]
        return bi, bd, ovf

    idx, d2, ovf = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1), d2.reshape(-1), ovf.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def core_slab(queries, table, counts, slot_ids, lo, inv_h, dims, cap,
              q_block):
    """Variant F: dense per-bucket slab table (T, cap, 3) — contiguous
    (cap,3) block gathers instead of per-row gathers."""
    t_size = counts.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)
        c = base[:, None, :] + offs[None, :, :]  # (B,8,3)
        in_grid = jnp.all((c >= 0) & (c < dims), axis=-1)
        cu = c.astype(jnp.uint32)
        hsh = (
            cu[..., 0] * jnp.uint32(grid_nn._P1)
            ^ cu[..., 1] * jnp.uint32(grid_nn._P2)
            ^ cu[..., 2] * jnp.uint32(grid_nn._P3)
        )
        cid = (hsh & jnp.uint32(t_size - 1)).astype(jnp.int32)  # (B,8)
        cnt = counts[cid]  # (B,8)
        ovf = jnp.any(in_grid & (cnt > cap), axis=1)
        cand = table[cid]  # (B,8,cap,3) — contiguous slab gather
        nvalid = jnp.minimum(cnt, cap)
        valid = (jnp.arange(cap, dtype=jnp.int32)[None, None, :]
                 < nvalid[..., None]) & in_grid[..., None]
        d2 = jnp.sum((q[:, None, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf).reshape(q_block, 8 * cap)
        slot = (cid[..., None] * cap
                + jnp.arange(cap, dtype=jnp.int32)).reshape(q_block, 8 * cap)
        best = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
        bslot = jnp.take_along_axis(slot, best[:, None], axis=1)[:, 0]
        bi = slot_ids[bslot]  # one extra row gather per query
        return bi, bd, ovf

    idx, d2, ovf = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1), d2.reshape(-1), ovf.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def core_csr_block(queries, refs_sorted, starts, lo, inv_h, dims, cap,
                   q_block):
    """Variant G: CSR layout (as A) but candidates fetched as contiguous
    (cap, 3) blocks via vmapped dynamic_slice -> gather w/ big slices."""
    table_mask = starts.shape[0] - 2
    m = refs_sorted.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)
        c = base[:, None, :] + offs[None, :, :]
        in_grid = jnp.all((c >= 0) & (c < dims), axis=-1)
        cu = c.astype(jnp.uint32)
        hsh = (
            cu[..., 0] * jnp.uint32(grid_nn._P1)
            ^ cu[..., 1] * jnp.uint32(grid_nn._P2)
            ^ cu[..., 2] * jnp.uint32(grid_nn._P3)
        )
        cid = (hsh & jnp.uint32(table_mask)).astype(jnp.int32)
        s = starts[cid]  # (B,8)
        e = starts[cid + 1]
        ovf = jnp.any(in_grid & ((e - s) > cap), axis=1)
        s_cl = jnp.clip(s, 0, m - cap).reshape(-1)  # (B*8,)
        cand = jax.vmap(
            lambda st: jax.lax.dynamic_slice(refs_sorted, (st, 0), (cap, 3))
        )(s_cl).reshape(q_block, 8, cap, 3)
        idx = s_cl.reshape(q_block, 8)[..., None] + jnp.arange(
            cap, dtype=jnp.int32)
        valid = (idx < e[..., None]) & in_grid[..., None]
        d2 = jnp.sum((q[:, None, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf).reshape(q_block, 8 * cap)
        idx = idx.reshape(q_block, 8 * cap)
        best = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
        bi = jnp.take_along_axis(idx, best[:, None], axis=1)[:, 0]
        return bi, bd, ovf

    idx, d2, ovf = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1), d2.reshape(-1), ovf.reshape(-1)


def build_slab(refs, h, cap, t_bits=None):
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    inv_h = 1.0 / h
    dims = np.maximum(np.ceil(extent * inv_h).astype(np.int64) + 1, 1)
    cells = np.clip(np.floor((refs - lo) * inv_h).astype(np.int64), 0,
                    dims - 1)
    if t_bits is None:
        t_size = 1 << max(int(2 * max(len(refs), 1) - 1).bit_length(), 10)
        t_size = min(t_size, grid_nn._MAX_TABLE)
    else:
        t_size = 1 << t_bits
    cu = cells.astype(np.uint32)
    bucket = ((cu[:, 0] * np.uint32(grid_nn._P1))
              ^ (cu[:, 1] * np.uint32(grid_nn._P2))
              ^ (cu[:, 2] * np.uint32(grid_nn._P3))) & np.uint32(t_size - 1)
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket.astype(np.int64), minlength=t_size)
    starts = np.zeros(t_size + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    # slot within bucket for each sorted ref
    slot_in_bucket = np.arange(len(refs)) - starts[bucket.astype(np.int64)][order]
    keep = slot_in_bucket < cap
    flat = bucket.astype(np.int64)[order][keep] * cap + slot_in_bucket[keep]
    table = np.full((t_size * cap, 3), 1e7, np.float32)
    table[flat] = refs[order][keep]
    slot_ids = np.zeros(t_size * cap, np.int32)
    slot_ids[flat] = order[keep].astype(np.int32)
    return (table.reshape(t_size, cap, 3),
            np.minimum(counts, 2 ** 31 - 1).astype(np.int32),
            slot_ids, lo, inv_h, dims)


def run(name, fn, q_dev, refs_dev, starts_dev, lo, inv_h, dims, cap, q_block,
        reps=3):
    # warm
    out = fn(q_dev, refs_dev, starts_dev, lo, inv_h, dims, cap, q_block)
    device_sync(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(q_dev, refs_dev, starts_dev, lo, inv_h, dims, cap, q_block)
        device_sync(out[0])
        ts.append(time.time() - t0)
    n_un = int(np.asarray(
        grid_nn._accept_exact(out[0], out[1], out[2],
                              jnp.float32((0.5 / float(inv_h)) ** 2)) < 0
    ).sum())
    print(f"{name:>40}: {min(ts):6.3f}s best of {reps} "
          f"(unresolved {n_un})", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    n_q, n_r = 2_621_440, 630_000  # q multiple of 131072 (bench shapes)
    refs = surface_cloud(rng, n_r)
    q = surface_cloud(rng, n_q)
    q += rng.normal(0, 0.004, q.shape).astype(np.float32)

    cap = 24
    h = grid_nn._choose_cell_size(refs, cap)
    order, starts, lo, dims, inv_h = grid_nn._build_hash_grid(refs, h)
    refs_sorted = refs[order]
    m_pad = grid_nn._bucket_len(len(refs))
    refs_b = np.concatenate(
        [refs_sorted, np.full((m_pad - len(refs), 3), 1e7, np.float32)]
    )
    q_dev = jnp.asarray(q)
    refs_dev = jnp.asarray(refs_b)
    starts_dev = jnp.asarray(starts)
    lo_d = jnp.asarray(lo, jnp.float32)
    inv_d = jnp.float32(inv_h)
    dims_d = jnp.asarray(dims.astype(np.int32))
    device_sync(q_dev)

    base = run("A: current (8192, fori8, cap24)", grid_nn._grid_nn_core,
               q_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, 8192)
    for qb in (8192, 32768, 131072):
        out = run(f"B: flat offsets, q_block={qb}", core_flat,
                  q_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, qb)
        same = int((np.asarray(out[0]) == np.asarray(base[0])).sum())
        print(f"      agree with A on {same}/{n_q}")
    run("C: current, cap16", grid_nn._grid_nn_core,
        q_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 16, 8192)
    run("C2: flat, cap16, qb=32768", core_flat,
        q_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 16, 32768)

    # D: bucket-sorted queries (gather locality)
    cells = np.clip(np.floor((q - lo) * inv_h).astype(np.int64), 0,
                    dims - 1).astype(np.uint32)
    qh = ((cells[:, 0] * np.uint32(grid_nn._P1))
          ^ (cells[:, 1] * np.uint32(grid_nn._P2))
          ^ (cells[:, 2] * np.uint32(grid_nn._P3))) & np.uint32(len(starts) - 2)
    qorder = np.argsort(qh, kind="stable")
    q_sorted_dev = jnp.asarray(q[qorder])
    device_sync(q_sorted_dev)
    run("D: A w/ bucket-sorted queries", grid_nn._grid_nn_core,
        q_sorted_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, 8192)
    run("D2: flat qb=32768, sorted queries", core_flat,
        q_sorted_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, 32768)

    # E: Morton/z-curve sorted queries (spatial, not hash, locality)
    cell16 = np.clip((cells & 0xFFFF).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    morton = (spread(cell16[:, 0]) | (spread(cell16[:, 1]) << np.uint64(1))
              | (spread(cell16[:, 2]) << np.uint64(2)))
    morder = np.argsort(morton, kind="stable")
    q_m_dev = jnp.asarray(q[morder])
    device_sync(q_m_dev)
    run("E: A w/ morton-sorted queries", grid_nn._grid_nn_core,
        q_m_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, 8192)
    run("E2: flat qb=32768, morton queries", core_flat,
        q_m_dev, refs_dev, starts_dev, lo_d, inv_d, dims_d, 24, 32768)

    # F: dense slab table
    for t_bits, capf in ((18, 24), (17, 24), (18, 16), (19, 32)):
        table, counts, slot_ids, lo2, inv2, dims2 = build_slab(
            refs, h, capf, t_bits=t_bits)
        tb = jnp.asarray(table)
        cn = jnp.asarray(counts)
        si = jnp.asarray(slot_ids)
        device_sync(tb)
        lo_f = jnp.asarray(lo2, jnp.float32)
        inv_f = jnp.float32(inv2)
        dims_f = jnp.asarray(dims2.astype(np.int32))
        for qb in (8192, 32768):
            out = core_slab(q_dev, tb, cn, si, lo_f, inv_f, dims_f, capf, qb)
            device_sync(out[0])
            ts = []
            for _ in range(3):
                t0 = time.time()
                out = core_slab(q_dev, tb, cn, si, lo_f, inv_f, dims_f,
                                capf, qb)
                device_sync(out[0])
                ts.append(time.time() - t0)
            n_un = int(np.asarray(
                grid_nn._accept_exact(
                    out[0], out[1], out[2],
                    jnp.float32((0.5 * h) ** 2)) < 0).sum())
            print(f"{f'F: slab T=2^{t_bits} cap={capf} qb={qb}':>40}: "
                  f"{min(ts):6.3f}s best of 3 (unresolved {n_un})",
                  flush=True)
        same_d = int(np.isclose(np.asarray(out[1]),
                                np.asarray(base[1])).sum())
        print(f"      dist agrees with A on {same_d}/{n_q} "
              f"(table {table.nbytes/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
