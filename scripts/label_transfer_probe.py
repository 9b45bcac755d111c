#!/usr/bin/env python3
"""Sub-cost attribution for the label-transfer 1-NN at production scale.

Times every piece of ``nearest_neighbor_indices_grid`` (2.5 M device
queries x 630 k host refs, the sim-stage shape) separately on the real
chip: cell-size search, grid build, ref upload, core dispatch+execute,
index D2H, retry ladder, exact fallback.  The r4 pipeline measured the
whole call at 6.9-13.4 s/room; this names the seconds.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def surface_cloud(rng, n, w=6.0, h=5.0, z=2.7):
    """Box-shell surface cloud approximating a TLS room scan."""
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32) * [w, h, z]
    face = rng.integers(0, 6, n)
    for ax, ext in enumerate((w, h, z)):
        pts[face == 2 * ax, ax] = 0.0
        pts[face == 2 * ax + 1, ax] = ext
    return pts


def main():
    from ipcgen_tpu.ops import grid_nn
    from ipcgen_tpu.utils.host import sync as device_sync

    rng = np.random.default_rng(0)
    n_q, n_r = 2_560_000, 630_000
    refs = surface_cloud(rng, n_r)
    # queries: scan hits = ref surface + small noise, some off-surface
    q = surface_cloud(rng, n_q)
    q += rng.normal(0, 0.004, q.shape).astype(np.float32)
    off = rng.integers(0, n_q, n_q // 8)
    q[off] += rng.normal(0, 0.25, (len(off), 3)).astype(np.float32)

    q_dev = jnp.asarray(q)
    device_sync(q_dev)

    spans = {}

    def t(name):
        class T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                spans[name] = spans.get(name, 0.0) + time.time() - self.t0

        return T()

    # warm: run the full call once so compiles are out of the way
    print("warm call (cold compiles)...", flush=True)
    t0 = time.time()
    idx_warm = grid_nn.nearest_neighbor_indices_grid(q_dev, refs)
    print(f"  cold total: {time.time()-t0:.2f}s", flush=True)

    # --- instrumented steady pass (mirror the internals) ---
    for rep in range(2):
        spans.clear()
        with t("choose_cell_size"):
            h = grid_nn._choose_cell_size(refs, 24)
        with t("build_hash_grid"):
            order, starts, lo, dims, inv_h = grid_nn._build_hash_grid(refs, h)
        with t("refs_sort_host"):
            refs_sorted = refs[order]
        m = len(refs)
        m_pad = grid_nn._bucket_len(m)
        with t("refs_pad_upload"):
            refs_b = np.concatenate(
                [refs_sorted, np.full((m_pad - m, 3), 1e7, np.float32)]
            )
            refs_dev = jnp.asarray(refs_b)
            starts_dev = jnp.asarray(starts)
            device_sync(refs_dev)
        q_block = 8192
        n = n_q
        n_pad = grid_nn._bucket_len(-(-n // q_block)) * q_block
        qp = q_dev if n_pad == n else None
        assert qp is not None or True
        with t("core_exec"):
            idx_s, d2, ovf = grid_nn._grid_nn_core(
                q_dev if n_pad == n else jnp.concatenate(
                    [q_dev, jnp.broadcast_to(
                        jnp.asarray(lo - 10 * h, jnp.float32),
                        (n_pad - n, 3))]),
                refs_dev, starts_dev,
                jnp.asarray(lo, jnp.float32), jnp.float32(inv_h),
                jnp.asarray(dims.astype(np.int32)), 24, q_block,
            )
            r2 = jnp.float32((0.5 * h) ** 2)
            idx_enc_dev = grid_nn._accept_exact(idx_s, d2, ovf, r2)
            device_sync(idx_enc_dev)
        with t("idx_d2h"):
            idx_enc = np.asarray(idx_enc_dev[:n])
        with t("host_finish"):
            resolved = idx_enc >= 0
            result = order[np.clip(idx_enc, 0, m - 1)].astype(np.int32)
        n_un = int((~resolved).sum())
        with t("unresolved_gather"):
            if n_un:
                un_idx = np.nonzero(~resolved)[0]
                pad_len = grid_nn._bucket_len(len(un_idx), minimum=1024)
                un_pad = np.zeros(pad_len, np.int64)
                un_pad[: len(un_idx)] = un_idx
                q_un = np.asarray(q_dev[jnp.asarray(un_pad)])[: len(un_idx)]
        with t("retry_ladder"):
            if n_un > 65536:
                result[~resolved] = grid_nn.nearest_neighbor_indices_grid(
                    q_un, refs, cell_size=2.0 * h, cap=48, _depth=1
                )
            elif n_un:
                from ipcgen_tpu.ops.knn import nearest_neighbor_indices

                result[~resolved] = nearest_neighbor_indices(q_un, refs)
        total = sum(spans.values())
        print(f"pass {rep}: total {total:.2f}s  unresolved {n_un} "
              f"({100.0*n_un/n:.1f}%)", flush=True)
        for k, v in sorted(spans.items(), key=lambda kv: -kv[1]):
            print(f"  {k:>20}: {v:6.2f}s", flush=True)

    # sanity: instrumented result == library result
    mismatch = int((result != idx_warm).sum())
    d_lib = np.linalg.norm(q - refs[idx_warm], axis=1)
    d_ins = np.linalg.norm(q - refs[result], axis=1)
    print(f"mismatch vs library: {mismatch} rows "
          f"(dist-equal: {int((np.abs(d_lib-d_ins)<1e-5).sum())})")
    print(json.dumps({k: round(v, 3) for k, v in spans.items()}))


if __name__ == "__main__":
    main()
