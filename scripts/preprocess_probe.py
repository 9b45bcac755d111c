#!/usr/bin/env python3
"""Attribute the preprocess stage's outliers+normals span (~6.9 s steady).

Times each sub-step of ``remove_statistical_outliers`` + ``estimate_normals``
on a 600 k-point synthetic room at production density: host grid builds,
uploads, the two k-NN programs, the PCA program, and the D2H — plus a fused
variant that computes one k=34 join on the full cloud and derives BOTH the
outlier means and the filtered-cloud PCA neighborhoods from it.
Throwaway diagnostics, not product surface.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_room_cloud(n=600_000, seed=0):
    rng = np.random.default_rng(seed)
    w, h, z = 6.0, 5.0, 2.7
    n6 = n // 6
    pts = []
    for axis, value, count in ((2, 0.0, n6 * 2), (2, z, n6),
                               (0, 0.0, n6 // 2), (0, w, n6 // 2),
                               (1, 0.0, n6), (1, h, n6)):
        p = rng.uniform(0, 1, (count, 3)) * np.array([w, h, z])
        p[:, axis] = value
        pts.append(p)
    cloud = np.vstack(pts)[:n].astype(np.float32)
    cloud += rng.normal(0, 0.003, cloud.shape).astype(np.float32)
    # 1% genuine outliers
    n_out = n // 100
    cloud[rng.integers(0, n, n_out)] += rng.normal(
        0, 1.5, (n_out, 3)).astype(np.float32)
    return cloud


def main():
    import jax

    if "--cpu" in sys.argv:
        # The axon plugin ignores the JAX_PLATFORMS env var; only the
        # config knob actually forces the host platform.
        jax.config.update("jax_platforms", "cpu")
        sys.argv.remove("--cpu")

    from ipcgen_tpu.ops.normals import estimate_normals
    from ipcgen_tpu.ops.outliers import remove_statistical_outliers

    print(f"backend: {jax.default_backend()}")
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    pts = make_room_cloud(n_pts)

    # Current product path, twice (second = warm).
    for tag in ("cold", "warm"):
        t0 = time.time()
        mask, _ = remove_statistical_outliers(pts, 20, 2.0)
        t1 = time.time()
        filtered = pts[mask]
        normals = estimate_normals(filtered, radius=0.1, max_nn=30)
        t2 = time.time()
        print(f"{tag}: outliers {t1 - t0:6.2f}s  normals {t2 - t1:6.2f}s  "
              f"total {t2 - t0:6.2f}s  kept {mask.mean():.4f}",
              flush=True)

    # Sub-step attribution of one warm pass.
    import jax.numpy as jnp

    from ipcgen_tpu.ops.grid_nn import _bucket_len, knn_grid

    n = len(pts)
    t0 = time.time()
    n_pad = _bucket_len(-(-n // 4096)) * 4096
    pts_pad = np.concatenate(
        [pts, np.full((n_pad - n, 3), 1e6, np.float32)])
    print(f"pad host: {time.time() - t0:.2f}s")
    t0 = time.time()
    idx_dev, d2_dev = knn_grid(pts_pad, pts, k=21, device_arrays=True)
    jax.block_until_ready(d2_dev)
    print(f"knn_grid k=21 (host grid build + upload + program): "
          f"{time.time() - t0:.2f}s")
    t0 = time.time()
    mean_dev = jax.jit(lambda d2: jnp.mean(jnp.sqrt(d2[:, 1:]), axis=1))(
        d2_dev)
    md = np.asarray(mean_dev)[:n]
    print(f"mean+D2H: {time.time() - t0:.2f}s")
    t0 = time.time()
    fin = md[np.isfinite(md)]
    thr = fin.mean() + 2.0 * fin.std()
    mask2 = md <= thr
    filtered = pts[mask2]
    print(f"host mask+filter: {time.time() - t0:.2f}s")
    m = len(filtered)
    t0 = time.time()
    m_pad = _bucket_len(-(-m // 4096)) * 4096
    f_pad = np.concatenate(
        [filtered, np.full((m_pad - m, 3), 1e6, np.float32)])
    idx2_dev, d22_dev = knn_grid(f_pad, filtered, k=30, device_arrays=True)
    jax.block_until_ready(d22_dev)
    print(f"knn_grid k=30 on filtered: {time.time() - t0:.2f}s")
    t0 = time.time()
    from ipcgen_tpu.ops.normals import _pca_normals

    neighbors = jnp.asarray(f_pad)[idx2_dev]
    valid = d22_dev <= 0.1 * 0.1
    nrm = np.array(_pca_normals(neighbors, valid)[:m])
    print(f"PCA gather+eig+D2H: {time.time() - t0:.2f}s  "
          f"({np.isfinite(nrm).all()})")

    # Variant: normals WITHOUT top-k — masked covariance over the full
    # 8-cell candidate set (radius-limited), skipping the k-NN selection
    # entirely.  Exactness vs max_nn=30 differs only in using ALL in-radius
    # candidates (clamped by cap) instead of the nearest 30.
    from ipcgen_tpu.ops.grid_nn import (
        _build_hash_grid,
        _choose_cell_size,
        _hash_cells_device,
    )

    for tag in ("cold", "warm"):
        t0 = time.time()
        cell = _choose_cell_size(filtered, 48)
        order, starts, lo_g, dims, inv_h = _build_hash_grid(filtered, cell)
        refs_sorted = np.concatenate(
            [filtered[order],
             np.full((_bucket_len(m) - m, 3), 1e7, np.float32)])
        t_host = time.time() - t0
        t0 = time.time()
        nrm2 = _cov_normals_probe(
            jnp.asarray(f_pad[:m_pad]), jnp.asarray(refs_sorted),
            jnp.asarray(starts), jnp.asarray(lo_g, jnp.float32),
            jnp.float32(inv_h), jnp.asarray(dims.astype(np.int32)),
            48, 4096, 0.1,
        )
        nrm2 = np.asarray(nrm2)[:m]
        print(f"cov-normals {tag}: host {t_host:.2f}s + device "
              f"{time.time() - t0:.2f}s", flush=True)
    dot = np.abs(np.sum(nrm2 * nrm, axis=1))
    print(f"cov vs topk normals: median |dot| {np.median(dot):.4f}, "
          f"p5 {np.percentile(dot, 5):.4f}")


def _cov_normals_probe(queries, refs_sorted, starts, lo, inv_h, dims,
                       cap, q_block, radius):
    import functools

    import jax
    import jax.numpy as jnp

    from ipcgen_tpu.ops.grid_nn import _hash_cells_device
    from ipcgen_tpu.ops.normals import _smallest_eigenvector_3x3

    @functools.partial(jax.jit, static_argnames=("cap", "q_block", "radius"))
    def run(queries, refs_sorted, starts, lo, inv_h, dims,
            cap=cap, q_block=q_block, radius=radius):
        table_mask = starts.shape[0] - 2
        mr = refs_sorted.shape[0]
        n_qt = queries.shape[0] // q_block
        q_tiles = queries.reshape(n_qt, q_block, 3)
        offs = jnp.array(
            [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
            jnp.int32,
        )
        r2 = radius * radius

        def per_tile(q):
            base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)
            cnt = jnp.zeros((q.shape[0],), jnp.float32)
            s1 = jnp.zeros((q.shape[0], 3), jnp.float32)
            s2 = jnp.zeros((q.shape[0], 3, 3), jnp.float32)
            for o in range(8):
                c = base + offs[o]
                in_grid = (
                    (c[:, 0] >= 0) & (c[:, 0] < dims[0])
                    & (c[:, 1] >= 0) & (c[:, 1] < dims[1])
                    & (c[:, 2] >= 0) & (c[:, 2] < dims[2])
                )
                cid = _hash_cells_device(c, table_mask)
                s = starts[cid]
                e = starts[cid + 1]
                idx = s[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
                valid = (idx < e[:, None]) & in_grid[:, None]
                cand = refs_sorted[jnp.clip(idx, 0, mr - 1)]
                rel = cand - q[:, None, :]
                d2 = jnp.sum(rel * rel, axis=-1)
                w = (valid & (d2 <= r2)).astype(jnp.float32)
                cnt = cnt + jnp.sum(w, axis=1)
                s1 = s1 + jnp.sum(rel * w[..., None], axis=1)
                s2 = s2 + jnp.einsum("qca,qcb->qab", rel * w[..., None], rel)
            mean = s1 / jnp.maximum(cnt, 1.0)[:, None]
            cov = s2 / jnp.maximum(cnt, 1.0)[:, None, None] - jnp.einsum(
                "qa,qb->qab", mean, mean)
            return _smallest_eigenvector_3x3(cov)

        return jax.lax.map(per_tile, q_tiles).reshape(-1, 3)

    return run(queries, refs_sorted, starts, lo, inv_h, dims)


if __name__ == "__main__":
    main()
