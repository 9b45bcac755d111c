"""Grid-hashed nearest-neighbor lookup for surface-to-surface label transfer.

The exact tiled 1-NN (ops.knn) is O(N*M) and its chunked scan costs tens of
seconds at label-transfer scale (2.5M simulated points vs ~1M TLS points).
SURVEY.md §7 calls for grid hashing at that scale: reference points are
bucketed into a uniform grid on the host (cell size adapted to the measured
per-cell occupancy — reference clouds are surfaces, so volumetric density
formulas misestimate badly); each query gathers candidates from the 2x2x2
cells nearest to it.  The true neighbor lies inside that neighborhood
whenever the query sits on or near the reference surface — exactly the
label-transfer setting, where scan hits land on TLS-sampled geometry.
Queries with empty neighborhoods fall back to the exact tiled 1-NN.

Grid dimensions are passed as traced values and all array shapes are
bucketed, so every room shares one compiled program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bucket_len(n: int, granularity: int = 4, minimum: int = 16) -> int:
    if n <= minimum:
        return minimum
    step = 1 << max((n - 1).bit_length() - granularity.bit_length() + 1, 0)
    return -(-n // step) * step


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def _grid_nn_core(
    queries: jnp.ndarray,  # (N, 3) padded to q_block multiple
    refs_sorted: jnp.ndarray,  # (M, 3) cell-sorted (padded)
    starts: jnp.ndarray,  # (C_pad,) int32 cell start offsets
    lo: jnp.ndarray,  # (3,)
    inv_h: jnp.ndarray,  # scalar
    dims: jnp.ndarray,  # (3,) int32 grid dims (traced)
    cap: int,
    q_block: int,
):
    gx, gy, gz = dims[0], dims[1], dims[2]
    n_cells = gx * gy * gz
    m = refs_sorted.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)

    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        # The 2x2x2 cells nearest to each query: floor(pos/h - 0.5) .. +1
        base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)  # (B, 3)

        def offset_body(k, carry):
            best_d, best_i = carry
            c = base + offs[k]
            in_grid = (
                (c[:, 0] >= 0) & (c[:, 0] < gx)
                & (c[:, 1] >= 0) & (c[:, 1] < gy)
                & (c[:, 2] >= 0) & (c[:, 2] < gz)
            )
            cid = jnp.clip(
                c[:, 0] * (gy * gz) + c[:, 1] * gz + c[:, 2], 0, n_cells - 1
            )
            s = starts[cid]
            e = starts[cid + 1]
            idx = s[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            valid = (idx < e[:, None]) & in_grid[:, None]
            idx_c = jnp.clip(idx, 0, m - 1)
            cand = refs_sorted[idx_c]  # (B, cap, 3)
            d2 = jnp.sum((q[:, None, :] - cand) ** 2, axis=-1)
            d2 = jnp.where(valid, d2, jnp.inf)
            cd = jnp.min(d2, axis=1)
            ci = jnp.take_along_axis(
                idx_c, jnp.argmin(d2, axis=1)[:, None], axis=1
            )[:, 0]
            take = cd < best_d
            return (
                jnp.where(take, cd, best_d),
                jnp.where(take, ci.astype(jnp.int32), best_i),
            )

        init = (
            jnp.full((q_block,), jnp.inf, jnp.float32),
            jnp.full((q_block,), -1, jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(0, 8, offset_body, init)
        return best_i, best_d

    idx, d2 = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1), d2.reshape(-1)


def _choose_cell_size(refs: np.ndarray, cap: int) -> float:
    """Cell size targeting ~cap/4 references per occupied cell (measured)."""
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    h = float(max(np.cbrt(extent.prod() / max(len(refs), 1)) * 4.0, 0.02))
    for _ in range(4):
        cells = np.floor((refs - lo) / h).astype(np.int64)
        lin = (
            cells[:, 0] * 73856093 ^ cells[:, 1] * 19349663 ^ cells[:, 2] * 83492791
        )
        _, counts = np.unique(lin, return_counts=True)
        mean_occ = counts.mean()
        target = cap / 4.0
        if mean_occ <= cap / 2.0:
            break
        # Surface clouds: occupancy scales ~h^2
        h *= float(np.sqrt(target / mean_occ))
        h = max(h, 0.01)
    return h


def nearest_neighbor_indices_grid(
    queries: np.ndarray,
    refs: np.ndarray,
    cell_size: Optional[float] = None,
    cap: int = 48,
    q_block: int = 8192,
) -> np.ndarray:
    """Grid-hashed 1-NN; exact fallback for queries with empty neighborhoods.

    Returns (N,) int32 indices into ``refs``.
    """
    queries = np.asarray(queries, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    n, m = len(queries), len(refs)
    if n == 0:
        return np.zeros((0,), np.int32)

    if cell_size is None:
        cell_size = _choose_cell_size(refs, cap)
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    inv_h = 1.0 / cell_size
    dims = np.maximum(np.ceil(extent * inv_h).astype(np.int64) + 1, 1)
    gx, gy, gz = (int(d) for d in dims)

    ref_cells = np.clip(
        np.floor((refs - lo) * inv_h).astype(np.int64), 0, dims - 1
    )
    cid = ref_cells[:, 0] * (gy * gz) + ref_cells[:, 1] * gz + ref_cells[:, 2]
    order = np.argsort(cid, kind="stable")
    refs_sorted = refs[order]
    starts = np.searchsorted(cid[order], np.arange(gx * gy * gz + 1))

    # Bucket every array shape so rooms share one compiled program.
    starts_pad = _bucket_len(len(starts))
    starts_b = np.concatenate(
        [starts, np.full(starts_pad - len(starts), m, dtype=starts.dtype)]
    )
    m_pad = _bucket_len(m)
    refs_b = np.concatenate(
        [refs_sorted, np.full((m_pad - m, 3), 1e7, np.float32)]
    )
    n_pad = _bucket_len(-(-n // q_block)) * q_block
    qp = np.concatenate(
        [queries, np.full((n_pad - n, 3), lo - 10 * cell_size, np.float32)]
    ) if n_pad != n else queries

    idx_sorted, d2 = _grid_nn_core(
        jnp.asarray(qp),
        jnp.asarray(refs_b),
        jnp.asarray(starts_b.astype(np.int32)),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(inv_h),
        jnp.asarray([gx, gy, gz], jnp.int32),
        int(cap),
        int(q_block),
    )
    # Fold the resolved-test into the index on device: downloading d2 just
    # for an isfinite check doubled the D2H bytes (the slow direction on the
    # remote link — ~3s per million-query call).
    idx_enc = jax.jit(
        lambda i, d: jnp.where(jnp.isfinite(d), i, -1)
    )(idx_sorted, d2)
    idx_enc = np.asarray(idx_enc[:n])
    resolved = idx_enc >= 0
    result = order[np.clip(idx_enc, 0, m - 1)].astype(np.int32)

    # Exact fallback for unresolved queries (empty 2x2x2 neighborhoods).
    if not resolved.all():
        from ipcgen_tpu.ops.knn import nearest_neighbor_indices

        unresolved = ~resolved
        result[unresolved] = nearest_neighbor_indices(queries[unresolved], refs)
    return result


@functools.partial(jax.jit, static_argnames=("cap", "k", "q_block"))
def _grid_knn_core(
    queries: jnp.ndarray,
    refs_sorted: jnp.ndarray,
    starts: jnp.ndarray,
    lo: jnp.ndarray,
    inv_h: jnp.ndarray,
    dims: jnp.ndarray,
    cap: int,
    k: int,
    q_block: int,
):
    """k-NN among the 2x2x2-cell candidates (up to 8*cap per query)."""
    gx, gy, gz = dims[0], dims[1], dims[2]
    n_cells = gx * gy * gz
    m = refs_sorted.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        base = jnp.floor((q - lo) * inv_h - 0.5).astype(jnp.int32)
        cand_d = []
        cand_i = []
        for o in range(8):
            c = base + offs[o]
            in_grid = (
                (c[:, 0] >= 0) & (c[:, 0] < gx)
                & (c[:, 1] >= 0) & (c[:, 1] < gy)
                & (c[:, 2] >= 0) & (c[:, 2] < gz)
            )
            cid = jnp.clip(
                c[:, 0] * (gy * gz) + c[:, 1] * gz + c[:, 2], 0, n_cells - 1
            )
            s = starts[cid]
            e = starts[cid + 1]
            idx = s[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            valid = (idx < e[:, None]) & in_grid[:, None]
            idx_c = jnp.clip(idx, 0, m - 1)
            cand = refs_sorted[idx_c]
            d2 = jnp.sum((q[:, None, :] - cand) ** 2, axis=-1)
            cand_d.append(jnp.where(valid, d2, jnp.inf))
            cand_i.append(idx_c)
        all_d = jnp.concatenate(cand_d, axis=1)  # (B, 8*cap)
        all_i = jnp.concatenate(cand_i, axis=1)
        neg_top, sel = jax.lax.top_k(-all_d, k)
        return jnp.take_along_axis(all_i, sel, axis=1).astype(jnp.int32), -neg_top

    idx, d2 = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1, k), d2.reshape(-1, k)


def knn_grid(
    queries: np.ndarray,
    refs: np.ndarray,
    k: int,
    cell_size: Optional[float] = None,
    cap: int = 48,
    q_block: int = 4096,
    device_arrays: bool = False,
):
    """Grid-hashed approximate k-NN for dense self-joins (outlier removal /
    normal estimation).  Candidates come from the 2x2x2 nearest cells
    (<= 8*cap); the cell size adapts so a neighborhood holds well over ``k``
    references.  Unresolved queries (fewer than k finite candidates) keep
    +inf distances — callers treat those like any sparse neighborhood.

    Returns (indices (N, k) int32, dists (N, k) float32 Euclidean).
    """
    queries = np.asarray(queries, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    n, m = len(queries), len(refs)
    if n == 0:
        return np.zeros((0, k), np.int32), np.zeros((0, k), np.float32)
    if cell_size is None:
        # Need ~4k candidates across the 8-cell neighborhood
        cell_size = _choose_cell_size(refs, max(cap, k))
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    inv_h = 1.0 / cell_size
    dims = np.maximum(np.ceil(extent * inv_h).astype(np.int64) + 1, 1)
    gx, gy, gz = (int(d) for d in dims)
    ref_cells = np.clip(np.floor((refs - lo) * inv_h).astype(np.int64), 0, dims - 1)
    cid = ref_cells[:, 0] * (gy * gz) + ref_cells[:, 1] * gz + ref_cells[:, 2]
    order = np.argsort(cid, kind="stable")
    refs_sorted = refs[order]
    starts = np.searchsorted(cid[order], np.arange(gx * gy * gz + 1))

    starts_pad = _bucket_len(len(starts))
    starts_b = np.concatenate(
        [starts, np.full(starts_pad - len(starts), m, dtype=starts.dtype)]
    )
    m_pad = _bucket_len(m)
    refs_b = np.concatenate([refs_sorted, np.full((m_pad - m, 3), 1e7, np.float32)])
    n_pad = _bucket_len(-(-n // q_block)) * q_block
    qp = (
        np.concatenate([queries, np.full((n_pad - n, 3), lo - 10 * cell_size,
                                         np.float32)])
        if n_pad != n
        else queries
    )
    idx_sorted, d2 = _grid_knn_core(
        jnp.asarray(qp),
        jnp.asarray(refs_b),
        jnp.asarray(starts_b.astype(np.int32)),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(inv_h),
        jnp.asarray([gx, gy, gz], jnp.int32),
        int(cap),
        int(min(k, 8 * cap)),
        int(q_block),
    )
    if device_arrays:
        # Map sorted-ref slots back to original ids ON DEVICE and hand the
        # caller jnp arrays — avoids a ~100MB host round trip per room when
        # the results feed further device compute (normals PCA etc).  The
        # order table is padded to the bucketed ref length so the gather
        # program is shared across rooms of similar size.
        order_b = np.zeros(m_pad, np.int32)
        order_b[:m] = order.astype(np.int32)
        order_dev = jnp.asarray(order_b)
        idx_dev = order_dev[jnp.clip(idx_sorted[:n], 0, m - 1)]
        return idx_dev, d2[:n]
    idx_sorted = np.asarray(idx_sorted[:n])
    d2 = np.asarray(d2[:n])
    idx = order[np.clip(idx_sorted, 0, m - 1)].astype(np.int32)
    return idx, np.sqrt(np.maximum(np.where(np.isfinite(d2), d2, np.inf), 0.0)).astype(
        np.float32
    )
