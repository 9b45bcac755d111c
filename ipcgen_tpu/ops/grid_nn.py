"""Grid-hashed nearest-neighbor lookup for surface-to-surface label transfer.

The exact tiled 1-NN (ops.knn) is O(N*M) and its chunked scan costs tens of
seconds at label-transfer scale (2.5M simulated points vs ~1M TLS points).
SURVEY.md §7 calls for grid hashing at that scale: reference points are
bucketed by a *hash* of their uniform-grid cell (cell size adapted to the
measured per-cell occupancy — reference clouds are surfaces, so volumetric
density formulas misestimate badly); each query gathers candidates from the
2x2x2 cells nearest to it.  The true neighbor lies inside that neighborhood
whenever the query sits on or near the reference surface — exactly the
label-transfer setting, where scan hits land on TLS-sampled geometry.

The bucket table is sized by POINT COUNT (power-of-two hash table, <= 4M
buckets), never by bbox volume / h^3 — so 60 m chunked scenes and pod-scale
label transfers cost the same memory as a single room, and no cell-id
arithmetic can overflow int32.  Hash collisions merely mix extra candidates
into a bucket; the distance argmin keeps the result correct.

A hashed answer is accepted only when it is PROVABLY exact: the found
distance must be <= h/2 (every point within h/2 of a query lies inside its
2x2x2 window by construction, so nothing closer can have been missed) and no
visited bucket may have overflowed the candidate cap.  All other queries —
empty neighborhoods, far-from-surface queries, truncated buckets — fall back
to the exact tiled 1-NN, so the returned index is always the true nearest
neighbor.

All array shapes are bucketed, so every room shares one compiled program.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes (Teschner et al. style); multiplied in wrapping uint32
# identically on host and device.
_P1, _P2, _P3 = 73856093, 19349663, 83492791
_MAX_TABLE = 1 << 22  # 4M buckets: starts table <= 16 MB int32 on device


def _bucket_len(n: int, granularity: int = 4, minimum: int = 16) -> int:
    if n <= minimum:
        return minimum
    step = 1 << max((n - 1).bit_length() - granularity.bit_length() + 1, 0)
    return -(-n // step) * step


@jax.jit
def _accept_exact(idx, d2, ovf, r2):
    """Keep a hashed answer only when provably nearest (see module doc)."""
    return jnp.where((d2 <= r2) & ~ovf, idx, -1)


def _hash_cells_device(c: jnp.ndarray, table_mask: int) -> jnp.ndarray:
    """uint32 wrapping spatial hash of (B, 3) int32 cell coords -> bucket id."""
    cu = c.astype(jnp.uint32)
    h = (
        (cu[:, 0] * jnp.uint32(_P1))
        ^ (cu[:, 1] * jnp.uint32(_P2))
        ^ (cu[:, 2] * jnp.uint32(_P3))
    )
    return (h & jnp.uint32(table_mask)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def _grid_nn_core(
    queries: jnp.ndarray,  # (N, 3) padded to q_block multiple
    refs_sorted: jnp.ndarray,  # (M, 3) bucket-sorted (padded)
    starts: jnp.ndarray,  # (T + 1,) int32 bucket start offsets, T = 2^k
    lo: jnp.ndarray,  # (3,)
    inv_h: jnp.ndarray,  # scalar
    dims: jnp.ndarray,  # (3,) int32 grid dims (traced; in-grid test only)
    cap: int,
    q_block: int,
):
    table_mask = starts.shape[0] - 2  # T - 1
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
            best_d, best_i, ovf = carry
            c = base + offs[k]
            in_grid = (
                (c[:, 0] >= 0) & (c[:, 0] < dims[0])
                & (c[:, 1] >= 0) & (c[:, 1] < dims[1])
                & (c[:, 2] >= 0) & (c[:, 2] < dims[2])
            )
            cid = _hash_cells_device(c, table_mask)
            s = starts[cid]
            e = starts[cid + 1]
            # Buckets holding more than `cap` candidates are truncated; flag
            # them so the caller can fall back to the exact 1-NN (a truncated
            # bucket could silently return a non-nearest neighbor).
            ovf = ovf | (in_grid & ((e - s) > cap))
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
                ovf,
            )

        init = (
            jnp.full((q_block,), jnp.inf, jnp.float32),
            jnp.full((q_block,), -1, jnp.int32),
            jnp.zeros((q_block,), jnp.bool_),
        )
        best_d, best_i, ovf = jax.lax.fori_loop(0, 8, offset_body, init)
        return best_i, best_d, ovf

    idx, d2, ovf = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1), d2.reshape(-1), ovf.reshape(-1)


def _occupancy_counts(refs: np.ndarray, lo: np.ndarray, h: float) -> np.ndarray:
    cells = np.floor((refs - lo) / h).astype(np.int64)
    lin = (
        cells[:, 0] * _P1 ^ cells[:, 1] * _P2 ^ cells[:, 2] * _P3
    )
    _, counts = np.unique(lin, return_counts=True)
    return counts


def _choose_cell_size(refs: np.ndarray, cap: int) -> float:
    """Cell size targeting ~cap/4 refs per occupied cell AND p99 <= cap.

    Bounding the 99th-percentile occupancy (not just the mean) keeps the
    cap-overflow fallback rare even on dense flat patches; the hashed bucket
    table makes shrinking h free (table size is point-count-bound).
    """
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    h = float(max(np.cbrt(extent.prod() / max(len(refs), 1)) * 4.0, 0.02))
    for _ in range(6):
        counts = _occupancy_counts(refs, lo, h)
        mean_occ = counts.mean()
        p99 = float(np.percentile(counts, 99))
        if mean_occ <= cap / 2.0 and p99 <= cap:
            break
        # Surface clouds: occupancy scales ~h^2
        shrink = 1.0
        if mean_occ > cap / 2.0:
            shrink = min(shrink, float(np.sqrt((cap / 4.0) / mean_occ)))
        if p99 > cap:
            shrink = min(shrink, float(np.sqrt(cap / p99)))
        h = max(h * shrink, 0.01)
        if h == 0.01:
            break
    return h


def _build_hash_grid(
    refs: np.ndarray, cell_size: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]:
    """Bucket refs by hashed grid cell.

    Returns (order, starts(T+1) int32, lo, dims(3) int64, inv_h).  Table size
    T is a power of two ~2x the point count (capped at ``_MAX_TABLE``) —
    memory never scales with scene extent.
    """
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    inv_h = 1.0 / cell_size
    dims = np.maximum(np.ceil(extent * inv_h).astype(np.int64) + 1, 1)
    cells = np.clip(np.floor((refs - lo) * inv_h).astype(np.int64), 0, dims - 1)

    t_size = 1 << max(int(2 * max(len(refs), 1) - 1).bit_length(), 10)
    t_size = min(t_size, _MAX_TABLE)
    cu = cells.astype(np.uint32)
    bucket = (
        (cu[:, 0] * np.uint32(_P1))
        ^ (cu[:, 1] * np.uint32(_P2))
        ^ (cu[:, 2] * np.uint32(_P3))
    ) & np.uint32(t_size - 1)
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket.astype(np.int64), minlength=t_size)
    starts = np.zeros(t_size + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    return order, starts.astype(np.int32), lo, dims, inv_h


def nearest_neighbor_indices_grid(
    queries: np.ndarray,
    refs: np.ndarray,
    cell_size: Optional[float] = None,
    cap: int = 48,
    q_block: int = 8192,
    _depth: int = 0,
) -> np.ndarray:
    """Grid-hashed 1-NN, exact by construction.

    Hashed answers are kept only when found within h/2 (provably nearest —
    see module docstring) with no bucket overflow; the rest RETRY through
    the same grid at doubled cell size (acceptance radius doubles, bucket
    population grows 8x so ``cap`` doubles too) up to twice before the
    exact tiled 1-NN takes the remainder.  Measured (r4, 2.5 M surface
    queries x 630 k refs): ~17% of queries sit outside the first h/2
    window (off-surface noise, box edges), and their exact-join fallback
    was ~4 s of the 10.5 s call — the doubled-cell retry resolves almost
    all of them for ~0.3 s.  Returns (N,) int32 indices into ``refs``.
    """
    # Device-resident queries stay on device (the sim hot path hands the
    # scan output straight in — re-uploading 2.5M points over the remote
    # tunnel costs ~2s/room); the grid itself is built from the HOST refs
    # either way.
    q_on_device = isinstance(queries, jax.Array) and not isinstance(
        queries, np.ndarray
    )
    if not q_on_device:
        queries = np.asarray(queries, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    n, m = len(queries), len(refs)
    if n == 0:
        return np.zeros((0,), np.int32)

    if cell_size is None:
        cell_size = _choose_cell_size(refs, cap)
    order, starts, lo, dims, inv_h = _build_hash_grid(refs, cell_size)
    refs_sorted = refs[order]

    # Bucket the ref/query shapes so rooms share one compiled program (the
    # starts table is already a power of two + 1 — few distinct sizes).
    m_pad = _bucket_len(m)
    refs_b = np.concatenate(
        [refs_sorted, np.full((m_pad - m, 3), 1e7, np.float32)]
    )
    n_pad = _bucket_len(-(-n // q_block)) * q_block
    if n_pad != n:
        pad_row = np.asarray(lo - 10 * cell_size, np.float32)
        if q_on_device:
            qp = jnp.concatenate(
                [queries,
                 jnp.broadcast_to(jnp.asarray(pad_row), (n_pad - n, 3))]
            )
        else:
            qp = np.concatenate(
                [queries, np.full((n_pad - n, 3), pad_row, np.float32)]
            )
    else:
        qp = queries

    idx_sorted, d2, ovf = _grid_nn_core(
        jnp.asarray(qp),
        jnp.asarray(refs_b),
        jnp.asarray(starts),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(inv_h),
        jnp.asarray(dims.astype(np.int32)),
        int(cap),
        int(q_block),
    )
    # Fold the acceptance test into the index on device: downloading d2 just
    # for the check doubled the D2H bytes (the slow direction on the remote
    # link — ~3s per million-query call).  Accept only provably-exact
    # answers: d <= h/2 (inside the guaranteed-complete window) and no
    # bucket overflow; hash collisions can otherwise make an empty true
    # neighborhood look non-empty and return a far-away aliased candidate.
    r2 = jnp.float32((0.5 * cell_size) ** 2)
    idx_enc = _accept_exact(idx_sorted, d2, ovf, r2)
    idx_enc = np.asarray(idx_enc[:n])
    resolved = idx_enc >= 0
    result = order[np.clip(idx_enc, 0, m - 1)].astype(np.int32)

    # Unresolved queries: empty 2x2x2 neighborhoods or truncated buckets.
    # Retry through a coarser grid (radius doubles) before paying the
    # exact join; below ~64k stragglers the exact tiled join is already
    # cheap and another grid level would only add compile shapes.
    if not resolved.all():
        unresolved = ~resolved
        n_un = int(unresolved.sum())
        if q_on_device:
            # The unresolved subset is small; gather it on device and pull
            # only those rows to host for the retry/fallback.  The index
            # count varies per room — pad it to a bucketed length (repeat
            # index 0) so the gather shape is shared across rooms (every
            # distinct eager-op shape costs a fresh ~0.5 s compile on the
            # remote link).
            un_idx = np.nonzero(unresolved)[0]
            pad_len = _bucket_len(len(un_idx), minimum=1024)
            un_pad = np.zeros(pad_len, np.int64)
            un_pad[: len(un_idx)] = un_idx
            q_un = np.asarray(queries[jnp.asarray(un_pad)])[: len(un_idx)]
        else:
            q_un = queries[unresolved]
        if _depth < 2 and n_un > 65536:
            result[unresolved] = nearest_neighbor_indices_grid(
                q_un, refs, cell_size=2.0 * cell_size,
                cap=min(2 * cap, 256), q_block=q_block, _depth=_depth + 1,
            )
        else:
            from ipcgen_tpu.ops.knn import nearest_neighbor_indices

            result[unresolved] = nearest_neighbor_indices(q_un, refs)
    return result


# ---------------------------------------------------------------------------
# Persistent slab-table 1-NN for the label transfer (the sim-stage hot path)
# ---------------------------------------------------------------------------
#
# The CSR core above gathers candidates row by row; at label-transfer scale
# (2.5 M queries x 630 k refs) its per-row gather traffic dominates.  The slab
# layout instead stores each hash bucket as a dense (cap, 3) block of a
# (T, cap, 3) table, so one bucket-id gather fetches a contiguous 288-byte
# slab — measured 0.83 s vs 2.98 s for the CSR core on the production shape
# (scripts/grid_core_variants.py, TPU v5e).  Exactness contract is identical:
# accept only d <= h/2 with no visited-bucket overflow, ladder the rest.


@functools.partial(jax.jit, static_argnames=("cap", "q_block"))
def _slab_nn_core(
    queries: jnp.ndarray,  # (N, 3), N multiple of q_block
    table: jnp.ndarray,  # (T, cap, 3) bucket slabs (pad rows at 1e7)
    counts: jnp.ndarray,  # (T,) int32 TRUE bucket populations (pre-cap)
    slot_ids: jnp.ndarray,  # (T*cap,) int32 original ref id per slab slot
    lo: jnp.ndarray,
    inv_h: jnp.ndarray,
    dims: jnp.ndarray,
    cap: int,
    q_block: int,
):
    """Provably-exact encoded 1-NN per query over the 2x2x2 nearest cells.

    Returns int32 ids into the ORIGINAL ref order, -1 where the hashed
    answer is not provably exact.  Acceptance uses the PER-QUERY margin to
    the searched window's boundary — min over axes of the distance from the
    query to the 2-cell box it is guaranteed to have searched, in
    [0.5h, 1h] — rather than the worst-case 0.5h: any point strictly closer
    than that margin lies inside the searched window, so a found hit within
    it cannot be beaten.  The wider radius resolves meaningfully more rows
    per level for zero extra gathers.
    """
    t_size = counts.shape[0]
    n_qt = queries.shape[0] // q_block
    q_tiles = queries.reshape(n_qt, q_block, 3)
    offs = jnp.array(
        [[ox, oy, oz] for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)],
        jnp.int32,
    )

    def per_tile(q):
        gpos = (q - lo) * inv_h  # grid-unit coordinates
        base = jnp.floor(gpos - 0.5).astype(jnp.int32)
        # Margin (grid units) from the query to the boundary of the
        # [base, base+2] window it searches; frac is in [0.5, 1.5).
        frac = gpos - base.astype(jnp.float32)
        margin = jnp.min(jnp.minimum(frac, 2.0 - frac), axis=-1)
        r_acc = (margin - 1e-3) / inv_h  # world units, float-safe shrink
        c = base[:, None, :] + offs[None, :, :]  # (B, 8, 3)
        in_grid = jnp.all((c >= 0) & (c < dims), axis=-1)  # (B, 8)
        cu = c.astype(jnp.uint32)
        hsh = (
            cu[..., 0] * jnp.uint32(_P1)
            ^ cu[..., 1] * jnp.uint32(_P2)
            ^ cu[..., 2] * jnp.uint32(_P3)
        )
        cid = (hsh & jnp.uint32(t_size - 1)).astype(jnp.int32)  # (B, 8)
        cnt = counts[cid]
        # Buckets beyond `cap` are truncated in the slab — flag so the
        # ladder retries (a truncated bucket could hide the true nearest).
        ovf = jnp.any(in_grid & (cnt > cap), axis=1)
        cand = table[cid]  # (B, 8, cap, 3) contiguous slab gather
        nvalid = jnp.minimum(cnt, cap)
        valid = (
            jnp.arange(cap, dtype=jnp.int32)[None, None, :]
            < nvalid[..., None]
        ) & in_grid[..., None]
        d2 = jnp.sum((q[:, None, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf).reshape(q_block, 8 * cap)
        slot = (
            cid[..., None] * cap + jnp.arange(cap, dtype=jnp.int32)
        ).reshape(q_block, 8 * cap)
        best = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
        bslot = jnp.take_along_axis(slot, best[:, None], axis=1)[:, 0]
        bi = slot_ids[bslot]
        exact = (bd <= r_acc * r_acc) & ~ovf
        return jnp.where(exact, bi, -1)

    idx = jax.lax.map(per_tile, q_tiles)
    return idx.reshape(-1)


def _build_slab_host(refs: np.ndarray, cell_size: float, cap: int,
                     t_bits: int):
    """Host-side slab construction: (table (T,cap,3), counts (T,), slot_ids
    (T*cap,), lo, inv_h, dims).  Rows beyond ``cap`` per bucket are dropped
    (their buckets keep the TRUE count so queries there overflow-flag)."""
    lo = refs.min(axis=0)
    extent = np.maximum(refs.max(axis=0) - lo, 1e-6)
    inv_h = 1.0 / cell_size
    dims = np.maximum(np.ceil(extent * inv_h).astype(np.int64) + 1, 1)
    cells = np.clip(np.floor((refs - lo) * inv_h).astype(np.int64), 0, dims - 1)
    t_size = 1 << t_bits
    cu = cells.astype(np.uint32)
    bucket = (
        (cu[:, 0] * np.uint32(_P1))
        ^ (cu[:, 1] * np.uint32(_P2))
        ^ (cu[:, 2] * np.uint32(_P3))
    ) & np.uint32(t_size - 1)
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket.astype(np.int64), minlength=t_size)
    starts = np.zeros(t_size + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_in_bucket = (
        np.arange(len(refs)) - starts[bucket.astype(np.int64)][order]
    )
    keep = slot_in_bucket < cap
    flat = (
        bucket.astype(np.int64)[order][keep] * cap + slot_in_bucket[keep]
    )
    table = np.full((t_size * cap, 3), 1e7, np.float32)
    table[flat] = refs[order][keep]
    slot_ids = np.zeros(t_size * cap, np.int32)
    slot_ids[flat] = order[keep].astype(np.int32)
    return (
        table.reshape(t_size, cap, 3),
        np.minimum(counts, 2**31 - 1).astype(np.int32),
        slot_ids,
        lo.astype(np.float32),
        float(inv_h),
        dims,
    )


class LabelGrid:
    """Persistent two-level slab grid for exact 1-NN label transfer.

    Built ONCE per room (ideally inside the label prefetch thread, hidden
    behind the scan) and queried per transfer — the r4 design rebuilt the
    hash grid, re-uploaded the refs, and bottomed out in a host exact join
    on every call, which the r4 probe measured at 7.0 s of an 11.9 s
    transfer (scripts/label_transfer_probe.py).  Levels:

    - L0: cell h (cap-occupancy-chosen), cap 24 — resolves ~85-95 % of
      surface queries at 0.83 s for 2.6 M (measured);
    - L1: cell 4h, wider cap — acceptance radius 2h catches off-surface
      noise and L0 bucket overflows;
    - residue: exact tiled 1-NN (ops.knn), expected ~0 rows in production.

    Replaces the sklearn BallTree of reference
    containers/s3dis_sim_scene.py:415-424.
    """

    Q_BLOCK = 32768  # measured-best slab tile (grid_core_variants.py)
    Q_BLOCK_L1 = 8192

    def __init__(self, refs: np.ndarray, cap0: int = 24, cap1: int = 384):
        refs = np.asarray(refs, dtype=np.float32)
        self.refs = refs
        self.n_refs = len(refs)
        if self.n_refs == 0:
            return
        self.h0 = _choose_cell_size(refs, cap0)
        self.cap0 = cap0
        self.cap1 = cap1
        t_bits0 = min(max(int(2 * self.n_refs - 1).bit_length(), 10), 18)
        tab0, cnt0, sid0, lo0, invh0, dims0 = _build_slab_host(
            refs, self.h0, cap0, t_bits0
        )
        # L1 occupied-cell count is ~1/16 of L0's — a small table suffices
        # and keeps the slab under ~75 MB.
        t_bits1 = min(max(t_bits0 - 4, 10), 14)
        tab1, cnt1, sid1, lo1, invh1, dims1 = _build_slab_host(
            refs, 4.0 * self.h0, cap1, t_bits1
        )
        self._lvl = []
        for tab, cnt, sid, lo, invh, dims, cap in (
            (tab0, cnt0, sid0, lo0, invh0, dims0, cap0),
            (tab1, cnt1, sid1, lo1, invh1, dims1, cap1),
        ):
            self._lvl.append(
                dict(
                    table=jnp.asarray(tab),
                    counts=jnp.asarray(cnt),
                    slot_ids=jnp.asarray(sid),
                    lo=jnp.asarray(lo, jnp.float32),
                    inv_h=jnp.float32(invh),
                    dims=jnp.asarray(dims.astype(np.int32)),
                    cap=int(cap),
                )
            )
        self._far = lo0 - np.float32(10.0 / max(invh0, 1e-6))
        self.profile: dict = {}

    def block_until_ready(self) -> None:
        if self.n_refs:
            self._lvl[-1]["table"].block_until_ready()

    def _run_level(self, q_dev, lvl: int, q_block: int):
        p = self._lvl[lvl]
        return _slab_nn_core(
            q_dev, p["table"], p["counts"], p["slot_ids"], p["lo"],
            p["inv_h"], p["dims"], p["cap"], q_block,
        )

    def query(self, queries) -> np.ndarray:
        """Exact 1-NN indices into ``refs`` for host OR device queries."""
        if self.n_refs == 0:
            return np.zeros((len(queries),), np.int32)
        q_on_device = isinstance(queries, jax.Array) and not isinstance(
            queries, np.ndarray
        )
        n = len(queries)
        if n == 0:
            return np.zeros((0,), np.int32)
        prof = self.profile = {}
        t0 = time.time()
        qb = self.Q_BLOCK
        n_pad = _bucket_len(-(-n // qb), minimum=1) * qb
        if n_pad != n:
            pad_row = np.asarray(self._far, np.float32)
            if q_on_device:
                qp = jnp.concatenate(
                    [queries,
                     jnp.broadcast_to(jnp.asarray(pad_row), (n_pad - n, 3))]
                )
            else:
                qp = np.concatenate(
                    [np.asarray(queries, np.float32),
                     np.full((n_pad - n, 3), pad_row, np.float32)]
                )
        else:
            qp = queries
        q_dev = jnp.asarray(qp)
        idx_enc = np.asarray(self._run_level(q_dev, 0, qb)[:n])
        prof["l0"] = time.time() - t0
        t0 = time.time()
        result = np.maximum(idx_enc, 0).astype(np.int32)
        unresolved = idx_enc < 0
        prof["host"] = time.time() - t0
        if not unresolved.any():
            return result

        # L1 (cell 4h): gather the unresolved rows ON DEVICE (no host round
        # trip of coordinates), bucket-padded so shapes are shared across
        # rooms.
        t0 = time.time()
        un_idx = np.flatnonzero(unresolved)
        prof["l1_rows"] = len(un_idx)
        qb1 = self.Q_BLOCK_L1
        pad1 = _bucket_len(-(-len(un_idx) // qb1), minimum=1) * qb1
        un_pad = np.zeros(pad1, np.int64)
        un_pad[: len(un_idx)] = un_idx
        q_un_dev = q_dev[jnp.asarray(un_pad)]
        idx1 = np.asarray(self._run_level(q_un_dev, 1, qb1))[: len(un_idx)]
        result[un_idx] = np.maximum(idx1, 0).astype(np.int32)
        prof["l1"] = time.time() - t0

        # Residue (far-off-surface / double-overflow rows): exact join.
        still = un_idx[idx1 < 0]
        prof["residue_rows"] = len(still)
        if len(still):
            t0 = time.time()
            from ipcgen_tpu.ops.knn import nearest_neighbor_indices

            q_still = np.asarray(q_dev[jnp.asarray(still)])
            result[still] = nearest_neighbor_indices(q_still, self.refs)
            prof["residue"] = time.time() - t0
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
        cand_d = []
        cand_i = []
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
    references (p99 bucket occupancy bounded by ``cap``).  Unresolved queries
    (fewer than k finite candidates) keep +inf distances — callers treat
    those like any sparse neighborhood.  Buckets beyond ``cap`` are truncated
    (approximate by design; use ops.knn for the exact join).

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
    order, starts, lo, dims, inv_h = _build_hash_grid(refs, cell_size)
    refs_sorted = refs[order]

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
        jnp.asarray(starts),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(inv_h),
        jnp.asarray(dims.astype(np.int32)),
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
