"""MXU raycast: ray-triangle intersection as matrix multiplication.

The VPU kernel (raycast_pallas.py) is issue-bound: its per-triangle loop
costs ~150 cycles/triangle (9 SMEM scalar broadcasts + ~40 vector ops) and
its per-block ``lax.cond``/``any()`` machinery ~1000 cycles per block test.
Measured on a v5e chip that caps the 2.56 M-ray cluttered-room scan at
~3.7 M rays/s.

This backend restructures the traversal so the hot math runs on the MXU:

1.  **Prepass (XLA, dense, no control flow)** — an exact per-ray slab test
    of every ray against every leaf-block AABB (chunked so nothing huge
    materializes), OR-reduced per tile of 1024 rays and compacted by one
    sort into a per-tile candidate block list.  Candidates replace the VPU
    kernel's per-block ``cond``s entirely; the list is exactly the set of
    blocks the old kernel would have descended into.

2.  **Pairs kernel (Pallas)** — per (tile, candidate block), intersection
    of 1024 rays x TB triangles is ONE fused-bf16x3 K=48 matmul on the MXU
    (see build_trif for the split layout):

        G = F @ TriF,   F:(1024, 48) ray features, TriF:(48, 5*TB)

    using the Pluecker formulation: for ray (o, d) with moment m = o x d
    and triangle edge (a -> b) with direction L = b - a and moment
    M = a x b, the signed side is  s = d.M + m.L  — linear in the ray
    features [d, m].  A ray passes inside iff s0, s1, s2 share a sign
    (consistent winding makes this watertight across shared edges: the
    neighbour evaluates the exact same products negated, so a ray crossing
    an edge lands in at least one triangle).  The hit distance needs only
    the plane:  t = (v0.n - o.n) / (d.n),  n = e1 x e2 — linear in
    [o, 1] and [d].  Five outputs per triangle (s0, s1, s2, t_num, t_den),
    all inner products against the 16-wide ray feature vector
    [d, m, o, 1, 0...].

    Triangle feature panels stream HBM -> VMEM per candidate (Mosaic
    overlaps the copy with the previous iteration's epilogue; an explicit
    prefetch ring measured slower).  The epilogue packs (t, lane) into one
    int32 key — positive IEEE floats order like their bit patterns, so
    stealing the 7 low mantissa bits for the lane id turns min+argmin into
    a single lane reduction (t keeps 16 mantissa bits: relative error
    <= 2^-16, well under the sensor's 2 cm range noise).

Replaces the same Embree hot path (reference raycast_engine_cpu.py:46-53);
result semantics (t, packed slot) match ops/raycast.py and feed the shared
``finalize_result``.  Not bit-identical to the Moeller-Trumbore oracle —
the Pluecker products round differently and t carries the 2^-16 packing
quantization — but watertight; the asserted hardware contract
(tests/test_tpu_hardware.py) is identical hit masks, world hit points
within 5 mm worst case (p99 2.4 mm; sensor range noise is 20 mm), and
>= 99% identical winning triangles (the rest are crease-edge ties).

Tiles with more candidates than vmax (e.g. fully incoherent rays) degrade
gracefully: the fori-loop kernel walks ALL blocks for that tile (identity
candidate list), so results stay exact at brute-force speed.  vmax is sized
so only genuinely incoherent tiles ever take that path — and the "auto"
ray sort regroups those workloads before they reach it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipcgen_tpu.ops.raycast import RaycastResult, finalize_result
from ipcgen_tpu.ops.scene_asset import SceneAsset

TILE = 1024  # rays per kernel instance
N_SUB = 4  # subtiles per tile: flat-kernel pairs skip unmasked 256-ray rows
# (Negative result, measured on hardware: N_SUB = 8 — 128-ray subtiles —
# regressed 1.90 -> 2.01 us/pair on the bench room despite culling more
# rows; the fixed cost of eight pl.when branches per pair exceeds the
# saved VPU work once most pairs touch a single subtile anyway.)
VMAX = 256  # fori-fallback SMEM candidate-table width per tile
MEGA = 256  # tiles per pallas_call (bounds the SMEM candidate/pair tables:
#             the flat kernel's scalar-prefetched pair arrays cost
#             3 * MEGA * PAIR_BUDGET * 4 B of SMEM — keep ~400 KB)
_BIG = 3.0e38
_RING = 4  # panel DMA ring depth (three copies in flight ahead of compute)
_EPS_T_BITS = int(np.float32(1e-6).view(np.int32))  # t > 1e-6, int domain
_EPS_DEN_BITS = int(np.float32(1e-9).view(np.int32))  # |den| > 1e-9
_EPS_T = 1e-6  # t > eps in the cross-multiplied domain: |num| > eps * |den|


def _bf16_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round f32 values onto the bf16 grid, keeping f32 dtype.

    The split x = hi + lo (hi exactly bf16-representable) MUST survive
    compilation: a plain ``x.astype(bfloat16).astype(float32)`` round-trip
    is elided by XLA under the default ``--xla_allow_excess_precision``
    when the whole pipeline is traced in one jit, silently turning the
    bf16x3 decomposition into [x | x | 0] — the MXU passthrough then
    re-rounds ``hi`` inconsistently with the residual and near-edge side
    signs flip (measured: hit fraction 99.98% eager vs 99.58% jit on the
    bench room).  ``lax.reduce_precision`` is a semantically mandatory
    rounding op the simplifier cannot remove.
    """
    return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


# ---------------------------------------------------------------------------
# Triangle feature panels
# ---------------------------------------------------------------------------
@jax.jit
def build_trif(tri_data: jnp.ndarray,
               center: jnp.ndarray = None) -> jnp.ndarray:
    """(NB, 16, TB) v0/e1/e2 panels -> (NB, 48, 5*TB) Pluecker features.

    Column groups (each TB wide): [s0 | s1 | s2 | t_num | t_den] against the
    ray feature rows [dx dy dz  mx my mz  ox oy oz  1  0...].

    NOTE a tempting dead end (measured, round 3): the Pluecker identity
    s0 + s1 + s2 = d . (a x b + b x c + c x a) = d . n holds EXACTLY, so the
    t_den column looks redundant (-20% matmul/DMA).  Numerically it is not:
    each s_i carries o x d moment terms ~60x larger than their sum, so the
    summed denominator inherits absolute bf16x3 rounding error ~1e-5 against
    a true d.n of ~2.5e-3 for subdivided-room triangles — 1% relative error
    in t (p99 hit-point error 0.59 m on the bench room, vs 2.4 mm with the
    dedicated column).  Interpret-mode tests cannot catch this (no MXU
    rounding emulation); it showed up only on hardware.
    Padded triangles (v0 = const, e1 = e2 = 0) produce n = 0 -> t_den = 0
    and t_num = 0, so t = 0/0 = NaN and every comparison fails: padding can
    never win.

    ``center`` translates the geometry before the moments are formed (the
    matching ray features must subtract the same center).  The Pluecker
    side values are translation-invariant, but their INTERMEDIATE products
    are not: an edge's moment about a nearby origin is |a-p||b-a| (~0.5 for
    indoor rooms) instead of |a||b| (~12), which is what makes the bf16
    split passes accurate enough for near-edge sign decisions.
    """
    if center is None:
        center = jnp.zeros(3, jnp.float32)
    v0 = tri_data[:, 0:3] - center[None, :, None]  # (NB, 3, TB)
    e1 = tri_data[:, 3:6]
    e2 = tri_data[:, 6:9]
    a = v0
    b = v0 + e1
    c = v0 + e2

    def cross(u, v):
        return jnp.stack(
            [
                u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0],
            ],
            axis=1,
        )

    nb, _, tb = v0.shape
    z6 = jnp.zeros((nb, 6, tb), jnp.float32)
    z7 = jnp.zeros((nb, 7, tb), jnp.float32)
    z10 = jnp.zeros((nb, 10, tb), jnp.float32)

    def edge_cols(p, q):
        # side = d . (p x q) + m . (q - p): rows 0-2 moment, rows 3-5 dir.
        return jnp.concatenate([cross(p, q), q - p, z10], axis=1)

    n = cross(e1, e2)
    cplane = jnp.sum(v0 * n, axis=1, keepdims=True)  # (NB, 1, TB)
    # t_num = v0.n - o.n  -> rows 6-8 = -n, row 9 = v0.n
    tnum = jnp.concatenate([z6, -n, cplane, z6], axis=1)
    # t_den = d.n -> rows 0-2 = n
    tden = jnp.concatenate([n, z6, z7], axis=1)
    t = jnp.concatenate(
        [edge_cols(a, b), edge_cols(b, c), edge_cols(c, a), tnum, tden], axis=2
    )
    # bf16x3 as ONE K=48 matmul.  The MXU's native f32 path rounds inputs
    # to bf16, flipping near-edge side signs (abs err ~|s|*2^-8); Mosaic's
    # HIGHEST is ~10x slower than needed.  Instead both operands are split
    # (x = hi + lo with hi = bf16(x)) and the three product terms
    # f_hi@T_hi + f_hi@T_lo + f_lo@T_hi are laid out along K:
    # [f_hi | f_hi | f_lo] (1024, 48) @ [T_hi; T_lo; T_hi] (48, N).  Every
    # entry is bf16-representable, K pads to 128 on the MXU either way, so
    # the fused form costs the same as a single K=16 pass while carrying
    # ~2^-16 relative error.  Every split negates exactly for the
    # neighbouring triangle's reversed edge, so the watertight
    # sign-consistency argument survives the splits.
    #
    # The panels are STORED as bf16: t_hi is exactly bf16-representable and
    # the residual t - t_hi gets rounded to bf16 by the MXU passthrough
    # anyway, so the cast changes nothing the matmul sees while halving the
    # panel DMA per pair and the VMEM ring footprint.  (Exact negation of
    # the shared-edge splits survives: bf16 rounding is sign-symmetric.)
    t_hi = _bf16_round(t)
    return jnp.concatenate(
        [t_hi, t - t_hi, t_hi], axis=1
    ).astype(jnp.bfloat16)  # (NB, 48, 5*TB)


def ray_features(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """(R, 3) o, d -> (R, 16) [d, o x d, o, 1, 0 x 6]."""
    m = jnp.cross(origins, dirs)
    one = jnp.ones((origins.shape[0], 1), jnp.float32)
    zero = jnp.zeros((origins.shape[0], 6), jnp.float32)
    return jnp.concatenate([dirs, m, origins, one, zero], axis=1)


# ---------------------------------------------------------------------------
# Candidate prepass
# ---------------------------------------------------------------------------
def _tile_slab_or(o_t, d_t, box_lo, box_hi, t_max, chunk, subtiles: int = 1):
    """Per-tile OR-reduced slab masks.

    o_t/d_t: (T, TILE, 3); box_lo/box_hi either (C, 3) shared boxes or
    (T, C, 3) per-tile boxes.  Returns (T, C) bool: does any ray of tile t
    enter box c within [0, t_max)?  With ``subtiles`` = S > 1 the OR is
    instead taken per contiguous TILE/S-ray subtile, returning (T, S, C) —
    the flat kernel skips (subtile, block) pairs whose finer-grained slab
    test fails, cutting the 1024-ray tile-union overhead.  Chunked over
    tiles so the (chunk, TILE, C) intermediates stay VMEM-sized.  NaN
    boxes never pass.
    """
    n_tiles = o_t.shape[0]
    per_tile_boxes = box_lo.ndim == 3
    n_chunks = -(-n_tiles // chunk)
    pad_t = n_chunks * chunk - n_tiles
    if pad_t:
        o_t = jnp.concatenate(
            [o_t, jnp.broadcast_to(o_t[-1:], (pad_t,) + o_t.shape[1:])]
        )
        d_t = jnp.concatenate(
            [d_t, jnp.broadcast_to(d_t[-1:], (pad_t,) + d_t.shape[1:])]
        )
        if per_tile_boxes:
            box_lo = jnp.concatenate(
                [box_lo,
                 jnp.broadcast_to(box_lo[-1:], (pad_t,) + box_lo.shape[1:])]
            )
            box_hi = jnp.concatenate(
                [box_hi,
                 jnp.broadcast_to(box_hi[-1:], (pad_t,) + box_hi.shape[1:])]
            )

    def chunk_mask(args):
        if per_tile_boxes:
            o, d, lo, hi = args  # (chunk, TILE, 3), (chunk, C, 3)
            lo = lo[:, None]  # (chunk, 1, C, 3)
            hi = hi[:, None]
        else:
            o, d = args
            lo = box_lo[None, None]  # (1, 1, C, 3)
            hi = box_hi[None, None]
        d_safe = jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d < 0, -1e-12, 1e-12), d)
        inv = (1.0 / d_safe)[:, :, None, :]  # (chunk, TILE, 1, 3)
        oc = o[:, :, None, :]
        entry = jnp.full(o.shape[:2] + (lo.shape[2],), -_BIG, jnp.float32)
        exit_ = jnp.full_like(entry, _BIG)
        for ax in range(3):
            t1 = (lo[..., ax] - oc[..., ax]) * inv[..., ax]
            t2 = (hi[..., ax] - oc[..., ax]) * inv[..., ax]
            entry = jnp.maximum(entry, jnp.minimum(t1, t2))
            exit_ = jnp.minimum(exit_, jnp.maximum(t1, t2))
        hit = (exit_ >= jnp.maximum(entry, 0.0)) & (entry < t_max)
        if subtiles > 1:
            c = hit.shape[-1]
            hit = hit.reshape(hit.shape[0], subtiles, -1, c)
            return jnp.any(hit, axis=2)  # (chunk, S, C)
        return jnp.any(hit, axis=1)  # (chunk, C)

    o_c = o_t.reshape((n_chunks, chunk) + o_t.shape[1:])
    d_c = d_t.reshape((n_chunks, chunk) + d_t.shape[1:])
    if per_tile_boxes:
        args = (o_c, d_c,
                box_lo.reshape((n_chunks, chunk) + box_lo.shape[1:]),
                box_hi.reshape((n_chunks, chunk) + box_hi.shape[1:]))
    else:
        args = (o_c, d_c)
    mask = jax.lax.map(chunk_mask, args)
    if subtiles > 1:
        return mask.reshape((-1,) + mask.shape[2:])[:n_tiles]
    return mask.reshape(-1, mask.shape[-1])[:n_tiles]


def _compact_ids(mask, vals):
    """Stable-compact True positions of (T, C) mask to the front, carrying
    ``vals`` (same shape); returns (vals_sorted, counts)."""
    key = jnp.where(mask, 0, 1).astype(jnp.int32)
    _, vals_sorted = jax.lax.sort_key_val(key, vals, dimension=1)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    return vals_sorted, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_max", "vmax", "group", "gmax", "chunk1", "chunk2", "tile", "n_sub"
    ),
)
def candidate_blocks(origins, dirs, block_lo, block_hi, *, t_max: float,
                     vmax: int = VMAX, group: int = 8, gmax: int = 48,
                     chunk1: int = 8, chunk2: int = 4,
                     tile: int = TILE, n_sub: int = N_SUB):
    """Per-tile candidate block lists via HIERARCHICAL exact slab tests.

    Round 2 slab-tested every ray against every leaf block: O(R x NB) with
    tens-of-MB intermediates that spill VMEM — 51 ms of the 171 ms kernel
    on the bench room, linear in the block count.  Because Morton order
    makes consecutive blocks spatially local, the same EXACT lists come
    much cheaper in two stages:

    1. blocks are grouped ``group`` at a time (AABB = NaN-aware min/max of
       member blocks) and every ray slab-tests every GROUP — NB/group
       columns instead of NB;
    2. each tile gathers the blocks of its <= ``gmax`` candidate groups and
       slab-tests its rays against only those ``gmax * group`` blocks.

    A ray inside a block is inside its group, so stage 2 sees every block
    stage 0 would have found: the result lists are IDENTICAL to the flat
    exact prepass (asserted in tests/test_raycast_mxu.py) at ~5x less
    arithmetic, and stage 1's cost scales with NB/group.  Tiles crossing
    more than ``gmax`` groups fall back to overflow (kernel walks all
    blocks) — pick ``gmax`` so real scan tiles never trip it
    (raycast_mxu_components scales it with the scene's block count).

    Returns (ids (vmax, T) int32, counts (T,) int32, overflow (T,) bool,
    masks (vmax, T) int32) — ``masks`` holds per-candidate ``n_sub``-bit
    subtile masks (bit s set iff subtile s of the tile crosses the block).
    ``origins``/``dirs`` must already be padded to a ``tile`` multiple.
    """
    n = origins.shape[0]
    n_tiles = n // tile
    nb = block_lo.shape[0]
    o_t = origins.reshape(n_tiles, tile, 3)
    d_t = dirs.reshape(n_tiles, tile, 3)

    # Group AABBs (pad the block axis with NaN rows; all-NaN groups and the
    # sentinel group can never pass a slab test).
    ng = -(-nb // group)
    gmax = min(gmax, ng)
    pad_b = ng * group - nb
    nanrow = jnp.full((1, 3), jnp.nan, jnp.float32)
    blo_p = jnp.concatenate(
        [block_lo, jnp.broadcast_to(nanrow, (pad_b + group, 3))]
    )  # (+1 sentinel group of NaN blocks)
    bhi_p = jnp.concatenate(
        [block_hi, jnp.broadcast_to(nanrow, (pad_b + group, 3))]
    )
    glo = jnp.nanmin(blo_p[: ng * group].reshape(ng, group, 3), axis=1)
    ghi = jnp.nanmax(bhi_p[: ng * group].reshape(ng, group, 3), axis=1)

    # Stage 1: per-ray group slab, OR-reduced per tile.
    mask_g = _tile_slab_or(o_t, d_t, glo, ghi, t_max, chunk=chunk1)  # (T, NG)
    gids = jnp.broadcast_to(jnp.arange(ng, dtype=jnp.int32), mask_g.shape)
    gids_sorted, counts_g = _compact_ids(mask_g, gids)
    overflow = counts_g > gmax

    # Stage 2: per-ray slab against the candidate groups' blocks only.
    #
    # (Negative result, measured on hardware: replacing this dense
    # sentinel-padded formulation — T x gmax x group box columns regardless
    # of how many groups tiles cross, ~6x padding waste on the bench room —
    # with a compacted (tile, group) pair list walked by a
    # dynamic-trip-count while_loop in static chunks cut the slab
    # arithmetic 6x but bought almost nothing: 33.9 -> 32.0 ms prepass on
    # the bench room (the dense slabs fuse and stream at full bandwidth;
    # the loop serializes chunks and re-gathers (chunk, TILE, 3) rays per
    # step) and REGRESSED the sorted-incoherent path 2.24 -> 2.07 M rays/s
    # (~150 groups/tile -> ~730 serialized steps).  The dense version is
    # simpler and within noise of optimal here.)
    sent = ng  # sentinel group -> NaN blocks
    gsel = jnp.where(
        jnp.arange(gmax)[None, :] < counts_g[:, None],
        gids_sorted[:, :gmax], sent,
    )  # (T, gmax)
    block_ids = (
        gsel[:, :, None] * group + jnp.arange(group, dtype=jnp.int32)
    ).reshape(n_tiles, gmax * group)
    blo_g = blo_p[block_ids]  # (T, gmax*group, 3)
    bhi_g = bhi_p[block_ids]
    mask_s = _tile_slab_or(
        o_t, d_t, blo_g, bhi_g, t_max, chunk=chunk2, subtiles=n_sub
    )  # (T, n_sub, gmax*group), or (T, gmax*group) when n_sub == 1
    if n_sub == 1:
        bits = mask_s.astype(jnp.int32)
    else:
        bits = jnp.zeros(mask_s.shape[::2], jnp.int32)
        for s in range(n_sub):
            bits = bits | (mask_s[:, s, :].astype(jnp.int32) << s)
    mask_b = bits > 0
    # Carry (block id, subtile bits) through one sort by packing; ids fit
    # comfortably (nb < 2^(31-n_sub) at the int32 limit, caller-checked).
    packed_sorted, counts = _compact_ids(
        mask_b, (block_ids << n_sub) | bits
    )
    overflow = overflow | (counts > vmax)
    ids_sorted = packed_sorted >> n_sub
    masks_sorted = packed_sorted & ((1 << n_sub) - 1)
    return (
        ids_sorted[:, :vmax].T,
        counts,
        overflow,
        masks_sorted[:, :vmax].T,
    )


@functools.partial(jax.jit, static_argnames=("t_max", "vmax"))
def candidate_blocks_exact(origins, dirs, block_lo, block_hi, *,
                           t_max: float, vmax: int = VMAX):
    """Per-tile candidate block lists via exact per-ray slab tests.

    The round-2 flat prepass, kept as the correctness reference for the
    hierarchical prepass's exactness test.  O(rays x NB) work and
    (8*TILE, NB) float32 intermediates per map step — prepass cost grows
    linearly with the block count, so at chunked-scene scale (tens of
    thousands of blocks) this dominates the kernel; the production path
    uses the hierarchical ``candidate_blocks`` instead, whose stage-1 cost
    scales with NB/group.

    Returns (ids (vmax, T) int32, counts (T,) int32, overflow (T,) bool).
    ``origins``/``dirs`` must already be padded to a TILE multiple (pad rays
    with far-away origins so they miss every block).  NaN-padded block AABBs
    never pass (NaN comparisons are False).
    """
    n = origins.shape[0]
    n_tiles = n // TILE
    nb = block_lo.shape[0]

    chunk = 8  # tiles per map step bounds the (rays, NB) intermediates
    n_chunks = -(-n_tiles // chunk)
    pad_t = n_chunks * chunk - n_tiles
    if pad_t:
        origins = jnp.concatenate(
            [origins, jnp.full((pad_t * TILE, 3), 1e8, jnp.float32)]
        )
        dirs = jnp.concatenate(
            [dirs,
             jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32),
                      (pad_t * TILE, 1))]
        )

    def chunk_mask(od):
        o, d = od  # (chunk*TILE, 3)
        # |d| floor avoids 0*inf = NaN false-negatives in the slab products.
        d_safe = jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d < 0, -1e-12, 1e-12), d)
        inv = 1.0 / d_safe
        entry = jnp.full((o.shape[0], nb), -_BIG, jnp.float32)
        exit_ = jnp.full((o.shape[0], nb), _BIG, jnp.float32)
        for ax in range(3):
            t1 = (block_lo[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
            t2 = (block_hi[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
            entry = jnp.maximum(entry, jnp.minimum(t1, t2))
            exit_ = jnp.minimum(exit_, jnp.maximum(t1, t2))
        hit = (exit_ >= jnp.maximum(entry, 0.0)) & (entry < t_max)
        return jnp.any(hit.reshape(-1, TILE, nb), axis=1)

    o_c = origins.reshape(n_chunks, chunk * TILE, 3)
    d_c = dirs.reshape(n_chunks, chunk * TILE, 3)
    mask = jax.lax.map(chunk_mask, (o_c, d_c)).reshape(-1, nb)[:n_tiles]
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    overflow = counts > vmax
    # Compaction: stable sort puts candidate ids first.
    key = jnp.where(mask, 0, 1).astype(jnp.int32)
    ids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), mask.shape)
    _, ids_sorted = jax.lax.sort_key_val(key, ids, dimension=1)
    return ids_sorted[:, :vmax].T, counts, overflow


# ---------------------------------------------------------------------------
# Pairs kernel
# ---------------------------------------------------------------------------
def _pairs_kernel(
    f_ref, ids_ref, counts_ref, ovf_ref, trif_hbm,
    t_out, i_out,
    trif_vmem, sems,
    *, tb: int, nb: int, vmax: int, t_init: float, tile: int = TILE,
):
    """Per-(tile, candidate-block) intersection with a LANE-LOCAL epilogue.

    Round 2's epilogue reduced (t, lane) across all 128 lanes once per
    candidate block (~7 shuffle+min steps over 128 f32 vregs per block) and
    packed the lane id into the low mantissa bits of t.  Both are gone:

    - The running minimum is kept PER LANE (``best_key``/``best_blk``,
      (TILE, tb) carries): each block contributes one elementwise
      compare+select triplet instead of a cross-lane tree reduction, and the
      single cross-lane reduction happens once per TILE after the block loop.
    - With the lane implicit in its position, t keeps ALL 23 mantissa bits
      (round 2 stole 7 for the lane id); the winning block rides a separate
      int32 carry.
    - The inside test compares SIGN BITS in the integer domain
      (two xors + or + >=0) instead of three products and three float
      compares.  Watertightness survives: the shared edge's side value is
      exactly negated for the neighbouring triangle, so for s = +/-0.0 one
      of the two triangles still matches the other two signs.

    Measured on v5e (160 k-tri room, 2.56 M patch-ordered rays): 2.75 us ->
    ~1.2 us per (tile, block) pair; kernel 10.4 -> ~24 M rays/s.
    """
    pid = pl.program_id(0)
    f = f_ref[0]
    ovf = ovf_ref[pid] != 0
    trip = jnp.where(ovf, nb, counts_ref[pid])

    def block_id(v):
        return jnp.where(ovf, v, ids_ref[jnp.minimum(v, vmax - 1), pid])

    init_key = _key_const(t_init)
    init = (
        jnp.full((tile, tb), init_key, jnp.int32),
        jnp.full((tile, tb), 0, jnp.int32),
    )
    f_hi = f.astype(jnp.bfloat16)
    f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f_cat = jnp.concatenate([f_hi, f_hi, f_lo], axis=1)  # (TILE, 48) bf16

    def panel_dma(v, slot):
        return pltpu.make_async_copy(
            trif_hbm.at[block_id(v)], trif_vmem.at[slot], sems.at[slot]
        )

    # 4-deep ring-buffered panel stream: the measured v5e floor for the
    # round-2 serial copy-then-compute loop was ~1.3 us/pair of pure DMA
    # wait + loop overhead (kernel_probe 'dmaonly') — as large as the
    # matmul itself.  A double buffer (issue v+1, wait v) still left
    # ~1.27 us/pair of floor; a 4-slot ring with three copies in flight
    # measures 0.79-0.89 us/pair (kernel_probe 'dmaonly4'), hiding the
    # per-copy issue latency behind three iterations of compute.
    for warm in range(_RING - 1):
        @pl.when(warm < trip)
        def _(warm=warm):
            panel_dma(warm, warm).start()

    def body(v, carry):
        best_key, best_blk = carry
        slot = jax.lax.rem(v, _RING)
        b = block_id(v)

        @pl.when(v + _RING - 1 < trip)
        def _():
            panel_dma(v + _RING - 1, jax.lax.rem(v + _RING - 1, _RING)).start()

        panel_dma(v, slot).wait()
        # Fused bf16x3 (see build_trif): one K=48 matmul on the MXU's
        # native bf16 path; with scene centering this lands within ~1e-4
        # absolute of the f64 product at the cost of a single pass (the
        # dropped f_lo@T_lo term is ~3e-5 once the moments are centered).
        g = jnp.dot(f_cat, trif_vmem[slot], preferred_element_type=jnp.float32)
        s0 = g[:, 0 * tb : 1 * tb]
        s1 = g[:, 1 * tb : 2 * tb]
        s2 = g[:, 2 * tb : 3 * tb]
        tnum = g[:, 3 * tb : 4 * tb]
        tden = g[:, 4 * tb : 5 * tb]
        i0 = jax.lax.bitcast_convert_type(s0, jnp.int32)
        i1 = jax.lax.bitcast_convert_type(s1, jnp.int32)
        i2 = jax.lax.bitcast_convert_type(s2, jnp.int32)
        ok = ((i0 ^ i1) | (i0 ^ i2)) >= 0  # all three sign bits equal
        t = tnum / tden
        # Guards run in the integer domain on the raw bit patterns
        # (cheaper on the VPU than float abs/compare, same semantics):
        # - positive floats order like their bits, so t > 1e-6 is one int
        #   compare against the 1e-6 bit pattern; negative t (sign bit =>
        #   negative int) and NaN-from-0/0 padding (0x7fc.. > any t bits we
        #   keep, but caught by the den guard) both fail;
        # - the |t_den| > 1e-9 guard mirrors the oracle's MT_EPS
        #   determinant guard (det = -t_den): near-plane-parallel rays
        #   otherwise pass the side tests with an ill-conditioned 0/0
        #   distance.  |x| in bits is a single mask of the sign bit.
        tb_i = jax.lax.bitcast_convert_type(t, jnp.int32)
        den_i = jax.lax.bitcast_convert_type(tden, jnp.int32) & 0x7FFFFFFF
        ok = ok & (tb_i > _EPS_T_BITS) & (den_i > _EPS_DEN_BITS)
        # Positive IEEE floats compare like their bit patterns, so the
        # per-lane running min works on the raw t bits (full precision).
        key = jnp.where(ok, tb_i, init_key)
        take = key < best_key
        return (
            jnp.where(take, key, best_key),
            jnp.where(take, b, best_blk),
        )

    best_key, best_blk = jax.lax.fori_loop(0, trip, body, init)
    # One cross-lane reduction per tile: nearest t, then the smallest packed
    # slot among exact ties (matches the oracle's first-minimum argmin).
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, tb), 1)
    kmin = jnp.min(best_key, axis=1, keepdims=True)  # (TILE, 1)
    packed = best_blk * tb + lane
    slot = jnp.min(
        jnp.where(best_key == kmin, packed, jnp.int32(np.iinfo(np.int32).max)),
        axis=1,
        keepdims=True,
    )
    miss = kmin >= init_key
    t_out[0] = jax.lax.bitcast_convert_type(kmin, jnp.float32)
    i_out[0] = jnp.where(miss, -1, slot)


def _key_const(t: float) -> int:
    """Host-side int32 ordering key for a positive float threshold."""
    return int(np.float32(t).view(np.int32))


# ---------------------------------------------------------------------------
# Flat pair-grid kernel
# ---------------------------------------------------------------------------
# Aggregate pair capacity per tile for one flat dispatch.  The flat grid is
# DYNAMIC (outer = ceil(n_steps/_INNER)), so unused capacity costs only the
# pair-list scatter arrays (cap int32 entries) — while an exhausted budget
# demotes whole tiles to the fori fallback, which walks their lists at the
# serial-DMA per-pair cost.  At 640 k tris the mean list length is ~4x the
# 160 k room's ~24, so a budget of 64 spilled roughly half the tiles.
# The ceiling is SMEM: the pair arrays are scalar-prefetched, so
# 3 * MEGA * PAIR_BUDGET int32s must stay well under the ~1 MB scalar
# memory — the budget raise is paid for by halving MEGA, keeping the same
# ~400 KB footprint the round-2 kernel already compiled with.
PAIR_BUDGET = 128


_INNER = 2048  # static inner grid extent of the flat pair dispatch


def _flat_kernel(tiles_ref, blocks_ref, masks_ref, ns_ref, f_ref, trif_ref,
                 t_out, i_out, bn, bd, bb, fc48, *, tb: int, t_init: float,
                 tile: int = TILE, n_sub: int = N_SUB):
    """One grid step = one real (tile, candidate-block) pair.

    (Negative result, measured on hardware: consuming TWO pair entries per
    grid step through two independent panel BlockSpec streams — to amortize
    the ~0.57 us fixed step cost — REGRESSED 1.88 -> 2.66 us/pair.  Two
    block-indexed input streams defeat the Mosaic pipeliner's
    revisiting-block copy elision and double the per-step DMA wait, which
    costs more than the fixed overhead it saves.)

    The fori-loop kernel's measured per-pair cost decomposes additively:
    ~0.9 us of scalar-core DMA machinery (descriptor setup, semaphore
    start/wait — serialized with vector issue) + ~1.6 us of compute.  Here
    the panel fetch rides Mosaic's hardware pipeline instead (the BlockSpec
    below indexes ``trif`` by a scalar-prefetched pair->block array), and
    the running per-lane min/argmin lives in VMEM scratch across the steps
    of a tile — reset at tile transitions, written back at each tile's
    last pair.

    The grid is 2-D (dynamic outer, static _INNER): a fully dynamic 1-D
    grid is supported by Mosaic but measured ~0.4 us/pair slower (it
    defeats the pipeliner's lookahead), while a fully static cap-sized
    grid pays ~0.57 us per dead pad step — the hybrid keeps the inner
    loop static for the pipeliner and bounds dead steps at _INNER-1
    (pads repeat the last real pair, so their copies are skipped, and
    ``i >= ns`` guards all compute).  Real steps are tile-sorted;
    consecutive equal tiles reuse the cached ``f`` block and its
    in-kernel bf16x3 split (``fc48`` scratch, rebuilt at transitions —
    materializing the 48-wide split in HBM instead measured ~15 ms per
    2.5 M rays).

    Each pair also carries an N_SUB-bit subtile mask: the prepass slab
    tests at 256-ray granularity, and rows of subtiles that never cross
    the pair's block skip the matmul + epilogue entirely — the
    finer-granularity cull that the 1024-ray tile union loses (~45% of
    (subtile, block) pairs on the bench room; measured 1.60 -> 1.29
    us/pair).

    The division is DEFERRED: the per-lane running best is kept as a
    positive (|t_num|, |t_den|) pair and the comparison
    num1/den1 < num2/den2 runs as the cross-product num1*den2 < num2*den1
    (valid for non-negative operands; an f32 divide costs ~an order of
    magnitude more VPU issue slots than the two multiplies).  Invariants:
    a stored den is always > 0 (a take with den = 0 would need
    num*best_den < best_num*0 = 0, impossible for non-negatives), and the
    init pair (t_init, 1) makes the t < t_max cap fall out of the same
    compare.  The single divide runs once per TILE at the tile's last
    pair, where the int32-ordered key reduction of the round-2 design
    takes over.  The t >= 0 gate is a sign compare of num and den; the
    t > eps gate is num > eps*den, which also rejects the 0/0 padding
    lanes (0 > 0 fails) and plane-parallel near-zero denominators.
    """
    init_key = _key_const(t_init)
    i = pl.program_id(0) * _INNER + pl.program_id(1)
    ns = ns_ref[0]
    valid = i < ns
    cur = tiles_ref[i]  # this step's tile id (``tile`` is the static width)
    prev = jnp.where(i == 0, -1, tiles_ref[jnp.maximum(i - 1, 0)])

    @pl.when(valid & (cur != prev))
    def _():
        bn[:] = jnp.full_like(bn, t_init)
        bd[:] = jnp.ones_like(bd)
        bb[:] = jnp.zeros_like(bb)
        f = f_ref[0]
        h = f.astype(jnp.bfloat16)
        fc48[:, 0:16] = h
        fc48[:, 16:32] = h
        fc48[:, 32:48] = (f - h.astype(jnp.float32)).astype(jnp.bfloat16)

    msk = masks_ref[i]
    sub = tile // n_sub
    for s in range(n_sub):
        @pl.when(valid & (((msk >> s) & 1) != 0))
        def _(s=s):
            rows = slice(s * sub, (s + 1) * sub)
            g = jnp.dot(fc48[rows], trif_ref[0],
                        preferred_element_type=jnp.float32)
            i0 = jax.lax.bitcast_convert_type(g[:, 0 * tb: 1 * tb], jnp.int32)
            i1 = jax.lax.bitcast_convert_type(g[:, 1 * tb: 2 * tb], jnp.int32)
            i2 = jax.lax.bitcast_convert_type(g[:, 2 * tb: 3 * tb], jnp.int32)
            inum = jax.lax.bitcast_convert_type(
                g[:, 3 * tb: 4 * tb], jnp.int32)
            iden = jax.lax.bitcast_convert_type(
                g[:, 4 * tb: 5 * tb], jnp.int32)
            # One fused sign test: barycentric signs agree AND num/den
            # share a sign (t >= 0) — a single or-tree and one compare.
            ok = ((i0 ^ i1) | (i0 ^ i2) | (inum ^ iden)) >= 0
            an = jax.lax.bitcast_convert_type(
                inum & 0x7FFFFFFF, jnp.float32)
            ad = jax.lax.bitcast_convert_type(
                iden & 0x7FFFFFFF, jnp.float32)
            ok = ok & (an > _EPS_T * ad)  # t > eps; rejects 0/0 padding
            take = ok & (an * bd[rows] < bn[rows] * ad)
            bn[rows] = jnp.where(take, an, bn[rows])
            bd[rows] = jnp.where(take, ad, bd[rows])
            bb[rows] = jnp.where(take, blocks_ref[i], bb[rows])

    @pl.when(valid & ((i + 1 == ns) | (tiles_ref[i + 1] != cur)))
    def _():
        t_best = bn[:] / bd[:]  # the tile's ONLY divide
        best_key = jax.lax.bitcast_convert_type(t_best, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, tb), 1)
        kmin = jnp.min(best_key, axis=1, keepdims=True)
        packed = bb[:] * tb + lane
        slot = jnp.min(
            jnp.where(best_key == kmin, packed,
                      jnp.int32(np.iinfo(np.int32).max)),
            axis=1, keepdims=True)
        miss = kmin >= init_key
        t_out[0] = jax.lax.bitcast_convert_type(kmin, jnp.float32)
        i_out[0] = jnp.where(miss, -1, slot)


def _flat_call(pair_tiles, pair_blocks, pair_masks, n_steps, f_tiles, trif,
               *, tb: int, t_init: float, interpret: bool = False,
               tile: int = TILE, n_sub: int = N_SUB):
    """Dispatch the flat kernel over a (dynamic, _INNER) pair grid.

    ``f_tiles`` is the raw (n_tiles, tile, 16) ray-feature array; the
    bf16x3 split happens in-kernel at tile transitions.
    """
    n_tiles = f_tiles.shape[0]
    kern = functools.partial(
        _flat_kernel, tb=tb, t_init=t_init, tile=tile, n_sub=n_sub
    )
    ns = jnp.asarray(n_steps, jnp.int32).reshape(1)
    if interpret:
        # interpret mode can't take a traced grid extent; walk the full
        # static capacity instead (dead steps are guarded, speed moot).
        outer = pair_blocks.shape[0] // _INNER
    else:
        outer = (ns[0] + _INNER - 1) // _INNER
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(outer, _INNER),
        in_specs=[
            pl.BlockSpec(
                (1, tile, 16),
                lambda io, ii, tiles, blks, msks, ns:
                    (tiles[io * _INNER + ii], 0, 0),
            ),
            pl.BlockSpec(
                (1, 48, 5 * tb),
                lambda io, ii, tiles, blks, msks, ns:
                    (blks[io * _INNER + ii], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile, 1),
                lambda io, ii, tiles, blks, msks, ns:
                    (tiles[io * _INNER + ii], 0, 0),
            ),
            pl.BlockSpec(
                (1, tile, 1),
                lambda io, ii, tiles, blks, msks, ns:
                    (tiles[io * _INNER + ii], 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, tb), jnp.float32),  # bn: best |t_num|
            pltpu.VMEM((tile, tb), jnp.float32),  # bd: best |t_den| (> 0)
            pltpu.VMEM((tile, tb), jnp.int32),  # bb: best block id
            pltpu.VMEM((tile, 48), jnp.bfloat16),  # fc48: split ray feats
        ],
    )
    t, slot = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pair_tiles, pair_blocks, pair_masks, ns, f_tiles, trif)
    return t.reshape(-1), slot.reshape(-1)


def _build_pair_list(ids, counts, ovf, masks, cap: int):
    """Tile-sorted flat (tile, block, mask) pair list from candidates.

    ids/masks (vmax, T) / counts (T,) / ovf (T,) are the prepass outputs
    for ONE chunk of tiles.  Returns (tiles (cap+1,), blocks (cap,),
    masks (cap,), n_steps, handled (T,)): ``handled`` marks tiles whose
    exact lists fit the aggregate ``cap`` — unhandled tiles (overflow, or
    spill past cap on adversarial ray sets) take the fori-loop kernel
    instead.  Positions >= n_steps repeat the LAST real pair's (tile,
    block) — the kernel's ``i < ns`` guard skips their compute, and their
    unchanged block indices let the Mosaic pipeliner skip their copies, so
    a padded step costs ~0.1 us instead of a full pair.  When n_steps is
    0 every entry keeps the scatter defaults (tile T-1, block 0), still
    in-range for the index_maps; the outputs are garbage but every tile is
    unhandled so the caller takes the fallback values.
    """
    vmax, T = ids.shape
    handled = (~ovf) & (counts > 0)
    eff = jnp.where(handled, counts, 0)
    start = jnp.cumsum(eff) - eff
    handled = handled & (start + eff <= cap)
    eff = jnp.where(handled, counts, 0)
    start = jnp.cumsum(eff) - eff  # recompute: conservative but contiguous
    n_steps = jnp.sum(eff)
    j = jnp.arange(vmax, dtype=jnp.int32)[None, :]
    valid = j < eff[:, None]  # (T, vmax)
    pos = jnp.where(valid, start[:, None] + j, cap)  # cap = dump slot
    tiles = jnp.full((cap + 2,), T - 1, jnp.int32)
    blocks = jnp.full((cap + 1,), 0, jnp.int32)
    mask_out = jnp.full((cap + 1,), 0, jnp.int32)
    tile_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], pos.shape
    )
    tiles = tiles.at[pos.reshape(-1)].set(tile_ids.reshape(-1), mode="drop")
    blocks = blocks.at[pos.reshape(-1)].set(ids.T.reshape(-1), mode="drop")
    mask_out = mask_out.at[pos.reshape(-1)].set(
        masks.T.reshape(-1), mode="drop"
    )
    # Pad positions >= n_steps with the last real pair (see docstring).
    last = jnp.maximum(n_steps - 1, 0)
    idx_t = jnp.arange(cap + 1, dtype=jnp.int32)
    tiles = jnp.where(idx_t >= n_steps, tiles[last], tiles[: cap + 1])
    blocks = jnp.where(idx_t[:cap] >= n_steps, blocks[last], blocks[:cap])
    mask_out = jnp.where(idx_t[:cap] >= n_steps, 0, mask_out[:cap])
    return tiles, blocks, mask_out, n_steps, handled


@functools.partial(
    jax.jit, static_argnames=("tb", "nb", "vmax", "t_init", "interpret", "tile")
)
def _pairs_call(f_tiles, ids, counts, ovf, trif, *, tb, nb, vmax, t_init,
                interpret=False, tile=TILE):
    n_tiles = f_tiles.shape[0]
    kern = functools.partial(
        _pairs_kernel, tb=tb, nb=nb, vmax=vmax, t_init=t_init, tile=tile
    )
    t, slot = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ids (vmax, T)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # overflow (T,) int32
            pl.BlockSpec(memory_space=pl.ANY),  # trif (NB, 48, 5*TB)
        ],
        out_specs=[
            pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_RING, 48, 5 * tb), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_RING,)),
        ],
        interpret=interpret,
    )(f_tiles, ids, counts, ovf, trif)
    return t.reshape(-1), slot.reshape(-1)


def _ray_sort_order(origins, dirs, lo, hi):
    """Coherence-restoring sort key: origin cell (Morton-interleaved 4-bit
    axes) then quantized direction (octant + 4-bit azimuth/elevation).

    Unstructured ray sets (e.g. random sampling) give the kernel's 1024-ray
    tiles no angular coherence, so every tile's candidate list degenerates
    toward all blocks.  Sorting groups near-parallel, near-colocated rays
    into the same tile; the caller inverts the permutation afterwards.
    """
    span = jnp.maximum(hi - lo, 1e-6)
    oc = jnp.clip(((origins - lo) / span * 16).astype(jnp.int32), 0, 15)
    ocell = (oc[:, 0] * 16 + oc[:, 1]) * 16 + oc[:, 2]  # 12 bits, row-major
    az = jnp.arctan2(dirs[:, 1], dirs[:, 0])
    el = jnp.arcsin(jnp.clip(dirs[:, 2], -1.0, 1.0))
    azb = jnp.clip(((az / jnp.pi + 1.0) * 16).astype(jnp.int32), 0, 31)
    elb = jnp.clip(((el / (jnp.pi / 2) + 1.0) * 8).astype(jnp.int32), 0, 15)
    dbin = azb * 16 + elb  # 9 bits
    key = ocell * 512 + dbin
    return jnp.argsort(key)


def raycast_mxu_components(
    origins,
    dirs,
    tri_data,
    block_lo,
    block_hi,
    *,
    t_max: float = np.inf,
    interpret: bool = False,
    sort_rays="auto",
    tile: int = None,
    n_sub: int = None,
):
    """MXU raycast over raw asset components; returns (t, packed_slot).

    ``t`` is +inf on miss (matching the other backends' pre-finalize
    contract); slots are packed block*TB + lane indices into tri_data.
    ``sort_rays`` groups incoherent ray sets into coherent tiles (see
    _ray_sort_order); results come back in the caller's order.  The default
    ``"auto"`` measures the prepass overflow fraction (tiles whose rays
    cross more candidate groups/blocks than the compacted lists hold — the
    signature of incoherent tiles degenerating toward all-blocks walks) and
    re-runs sorted when it exceeds 2%; this needs a host read, so inside a
    jit trace ``"auto"`` quietly means False (callers under jit — the scan
    paths — impose coherence via their own patch permutation; jitted
    callers with incoherent rays pass ``sort_rays=True``, a static flag).

    ``tile``/``n_sub`` override the kernel's rays-per-tile and subtile-mask
    granularity (None = per-path defaults; smaller tiles shorten a bundle's
    candidate-list union at more fixed per-step cost — see
    docs/BENCHMARKS.md for the measured sweep).
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    auto_sort = sort_rays == "auto"
    if auto_sort:
        sort_rays = False
    if tile is None:
        # Measured (r4 sweeps, 160k-tri room, v5e): the fixed ~0.5 us
        # per-grid-step cost dominates the tile tradeoff, so WIDER tiles
        # win as long as the subtile masks keep the cull granularity at
        # 256 rays — coherent scans measured 9.7/13.4/17.1/19.6 M rays/s
        # at tile 256/512/1024/2048 (4096 fails to compile: 16 unrolled
        # subtile branches exceed what Mosaic accepts).  The sorted-
        # incoherent path measured best at 1024 (2.20 vs 2.08/1.83 at
        # 512/256; its candidate unions grow superlinearly past 1024).
        tile = 1024 if sort_rays else 2048
    if n_sub is None:
        # One subtile bit per 256 rays: the measured-best cull granularity
        # (128-row subtiles regressed: too many pl.when branches per pair).
        n_sub = max(tile // 256, 1)
    n = origins.shape[0]
    nb = tri_data.shape[0]
    tb = tri_data.shape[2]
    if tb > 512:
        # Lane ids are positional since the r3 lane-local epilogue (the
        # round-2 7-mantissa-bit packing is gone); the remaining bounds are
        # the int32 packed slot (nb * tb < 2^31, guaranteed transitively by
        # the block-id check below) and VMEM scratch (3 carries of
        # (tile, tb) f32 ≈ 6 MB at tb=512 of the ~16 MB budget).
        raise ValueError(
            f"mxu backend carries (tile, block_size) f32 running-min state "
            f"in VMEM; block_size must be <= 512, got {tb}"
        )
    t_init = float(t_max) if np.isfinite(t_max) else 1.0e30

    order = None
    if sort_rays:
        lo = jnp.nanmin(block_lo, axis=0)
        hi = jnp.nanmax(block_hi, axis=0)
        order = _ray_sort_order(origins, dirs, lo, hi)
        origins = origins[order]
        dirs = dirs[order]

    pad = (-n) % tile
    if pad:
        # Pad by repeating the last real ray: keeps the final tile's ray
        # bundle spatially tight for the prepass (far-away pad origins
        # would add spurious candidate groups to that tile).  Padded
        # results are sliced off below.
        origins = jnp.concatenate(
            [origins, jnp.broadcast_to(origins[-1:], (pad, 3))]
        )
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))])
    n_tiles = origins.shape[0] // tile

    # Scene centering conditions the Pluecker intermediates (see build_trif).
    center = (jnp.nanmin(block_lo, axis=0) + jnp.nanmax(block_hi, axis=0)) * 0.5
    trif = build_trif(tri_data, center)
    # Hierarchical-prepass sizing, bucketed so block-count buckets share
    # compiled programs.  ``group`` grows with the scene so stage 1's
    # (chunk, TILE, NB/group) intermediates stay VMEM-sized at any block
    # count (advisor r2: the flat prepass scaled linearly with NB);
    # ``gmax`` grows too because larger scenes cross more groups per tile.
    group = 8 if nb <= 8192 else (16 if nb <= 32768 else 32)
    # gmax/vmax generous enough that real scan tiles essentially never
    # overflow (an overflowing tile walks EVERY block in the fori
    # fallback: at 640 k tris the bench room's 63 straggler tiles —
    # partial patches with mixed directions, candidate lists up to ~600
    # blocks — cost ~500 ms under VMAX=256; stage 2's extra slab width
    # and a longer compacted list are far cheaper).  The fori fallback
    # keeps its own VMAX-entry SMEM table; unhandled tiles whose lists
    # exceed it are demoted to walk-all there (rare by construction).
    gmax = 96 if nb <= 2048 else (128 if nb <= 8192 else 192)
    # vmax is generous at EVERY scene size: a tile whose list exceeds vmax
    # walks ALL blocks in the fori fallback, and on the 160 k-tri bench
    # room the ~13 straggler tiles (partial patches, mixed directions,
    # lists of ~300-600 blocks) cost ~60 ms there versus ~10 ms as plain
    # flat-path pairs.  The only vmax cost is the prepass compaction slice
    # width — the sort already runs over the full gmax*group candidates.
    vmax = min(768, nb)
    if sort_rays:
        # Sorted-incoherent tiles cross most block GROUPS no matter how
        # tight the sort gets (a bundle of near-parallel rays still sweeps
        # a frustum through the whole room), so the stage-1 group cap that
        # protects scan tiles marks EVERY incoherent tile overflowed and
        # demotes it to the walk-all fallback — the sort then buys nothing
        # (measured: ovf 256/256 on the bench room both sorted and
        # unsorted, 0.5 M rays/s either way).  Sorted mode therefore opens
        # the stage-1 cap to every group and widens the compacted list:
        # sorted bench-room tiles carry ~470-650 exact candidates, an
        # order of magnitude over scan tiles but 2.3x under walk-all.
        gmax = min(-(-nb // group), 4 * gmax)
        vmax = min(1024, nb)
    if nb >= (1 << (31 - n_sub)):
        raise ValueError(
            f"mxu backend packs block ids with {n_sub}-bit subtile masks; "
            f"block count must be < 2^{31 - n_sub}, got {nb}"
        )
    ids, counts, ovf, submasks = candidate_blocks(
        origins, dirs, block_lo, block_hi, t_max=t_init, vmax=vmax,
        group=group, gmax=gmax, tile=tile, n_sub=n_sub,
    )
    if auto_sort and not isinstance(ovf, jax.core.Tracer):
        ovf_frac = float(jnp.mean(ovf.astype(jnp.float32)))
        if ovf_frac > 0.02:
            return raycast_mxu_components(
                origins[:n], dirs[:n], tri_data, block_lo, block_hi,
                t_max=t_max, interpret=interpret, sort_rays=True,
            )
    f = ray_features(origins - center, dirs).reshape(n_tiles, tile, 16)

    # Chunk tiles so the SMEM candidate/pair tables stay bounded.  Each
    # chunk runs the flat pair-grid kernel over every tile whose exact
    # candidate list fits the aggregate pair budget, plus the fori-loop
    # kernel as the exact fallback for overflow/spill tiles — skipped via
    # lax.cond in the common case where nothing actually needs it (the
    # usual reason a tile is unhandled is counts == 0, whose correct
    # result is a plain miss).
    ts, slots = [], []
    # Interpret mode walks the FULL static pair capacity (it cannot take a
    # traced grid extent), so the generous production budget would 4x the
    # CPU tests' dead-step walk; the small budget just routes spill tiles
    # to the fori fallback, which is equally exact.
    # The SMEM pair-table footprint is 3 * mega * pair_budget * 4 B; scale
    # tiles-per-dispatch inversely with the tile width so the aggregate
    # pair pool (and the rays per dispatch) stay constant across tile
    # configurations.  The fori fallback's own SMEM table is (VMAX, mega)
    # int32 — cap mega at 512 so it stays under half the ~1 MB scalar
    # memory (measured: mega=1024 at tile=256 exceeded smem by 9 KB).
    scale = max(TILE // tile, 1)
    mega = min(MEGA * scale, 512)
    pair_budget = max(PAIR_BUDGET // scale, 16)
    if sort_rays:
        # Sorted-incoherent tiles carry candidate lists an order of
        # magnitude longer than scan tiles (~470-650 on the bench room vs
        # ~25 at 1024 rays; proportionally shorter for smaller tiles).
        # Spilling them to the fori fallback forfeits the whole point of
        # the sort, so trade chunk width for per-tile budget at the same
        # 3 * mega * budget * 4 B SMEM footprint.
        mega = max(mega // 8, 1)
        pair_budget = pair_budget * 8
    if interpret:
        pair_budget = 64
    for s in range(0, n_tiles, mega):
        e = min(s + mega, n_tiles)
        # Round the pair capacity to the flat kernel's _INNER grid extent:
        # its index_maps read pair entries up to ceil(ns/_INNER)*_INNER-1.
        cap = -(-(e - s) * pair_budget // _INNER) * _INNER
        tiles_c, blocks_c, masks_c, n_steps, handled = _build_pair_list(
            ids[:, s:e], counts[s:e], ovf[s:e], submasks[:, s:e], cap
        )
        t_flat, s_flat = _flat_call(
            tiles_c, blocks_c, masks_c, n_steps, f[s:e], trif,
            tb=tb, t_init=t_init, interpret=interpret,
            tile=tile, n_sub=n_sub,
        )
        # Fallback bookkeeping: the fori kernel's SMEM candidate table is
        # capped at VMAX entries regardless of the flat path's wider
        # ``vmax`` — unhandled tiles whose lists don't fit are demoted to
        # walk-all (exact, just slower; rare by construction).
        ovf_fb = ovf[s:e] | ((~handled) & (counts[s:e] > VMAX))
        counts_fb = jnp.where(
            handled, 0, jnp.minimum(counts[s:e], VMAX)
        )
        needs_fori = jnp.any(counts_fb > 0) | jnp.any(ovf_fb)

        def run_fori(f_c, ids_c, counts_c, ovf_c):
            return _pairs_call(
                f_c, ids_c, counts_c, ovf_c, trif, tb=tb, nb=nb,
                vmax=VMAX, t_init=t_init, interpret=interpret, tile=tile,
            )

        def skip_fori(f_c, ids_c, counts_c, ovf_c):
            nray = f_c.shape[0] * tile
            return (
                jnp.full((nray,), t_init, jnp.float32),
                jnp.full((nray,), -1, jnp.int32),
            )

        t_fori, s_fori = jax.lax.cond(
            needs_fori, run_fori, skip_fori,
            f[s:e], ids[:VMAX, s:e], counts_fb, ovf_fb.astype(jnp.int32),
        )
        hray = jnp.repeat(handled, tile)
        ts.append(jnp.where(hray, t_flat, t_fori))
        slots.append(jnp.where(hray, s_flat, s_fori))
    t = jnp.concatenate(ts) if len(ts) > 1 else ts[0]
    slot = jnp.concatenate(slots) if len(slots) > 1 else slots[0]
    t = t[:n]
    slot = slot[:n]
    if order is not None:
        # restore the caller's ray order: sorted slot i came from order[i]
        t = jnp.zeros_like(t).at[order].set(t)
        slot = jnp.zeros_like(slot).at[order].set(slot)
    miss = slot < 0
    return jnp.where(miss, jnp.inf, t), slot


def raycast_asset_mxu(
    origins, dirs, asset: SceneAsset, t_max: float = np.inf,
    interpret: bool = False, sort_rays="auto",
    tile: int = None, n_sub: int = None,
) -> RaycastResult:
    """Intersect rays with the resident scene via the MXU pairs kernel.

    ``sort_rays="auto"`` (default) re-sorts incoherent ray sets when the
    prepass overflows (see raycast_mxu_components)."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    t, slot = raycast_mxu_components(
        origins, dirs, asset.tri_data, asset.block_lo, asset.block_hi,
        t_max=t_max, interpret=interpret, sort_rays=sort_rays,
        tile=tile, n_sub=n_sub,
    )
    return finalize_result(origins, dirs, t, slot, asset)
