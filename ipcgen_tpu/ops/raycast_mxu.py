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

Tiles with more candidates than VMAX (e.g. fully incoherent rays) degrade
gracefully: the kernel walks ALL blocks for that tile (identity candidate
list), so results stay exact at brute-force speed.
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
VMAX = 256  # compacted candidate blocks per tile (overflow -> walk all)
MEGA = 512  # tiles per pallas_call (bounds the SMEM candidate table)
_BIG = 3.0e38


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
    t_hi = t.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([t_hi, t - t_hi, t_hi], axis=1)  # (NB, 48, 5*TB)


def ray_features(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """(R, 3) o, d -> (R, 16) [d, o x d, o, 1, 0 x 6]."""
    m = jnp.cross(origins, dirs)
    one = jnp.ones((origins.shape[0], 1), jnp.float32)
    zero = jnp.zeros((origins.shape[0], 6), jnp.float32)
    return jnp.concatenate([dirs, m, origins, one, zero], axis=1)


# ---------------------------------------------------------------------------
# Candidate prepass (exact per-ray slab tests, tile-union, compaction)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("t_max", "vmax"))
def candidate_blocks(origins, dirs, block_lo, block_hi, *, t_max: float,
                     vmax: int = VMAX):
    """Per-tile candidate block lists via exact per-ray slab tests.

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
    *, tb: int, nb: int, vmax: int, t_init: float,
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
        jnp.full((TILE, tb), init_key, jnp.int32),
        jnp.full((TILE, tb), 0, jnp.int32),
    )
    f_hi = f.astype(jnp.bfloat16).astype(jnp.float32)
    f_cat = jnp.concatenate([f_hi, f_hi, f - f_hi], axis=1)  # (TILE, 48)

    def panel_dma(v, slot):
        return pltpu.make_async_copy(
            trif_hbm.at[block_id(v)], trif_vmem.at[slot], sems.at[slot]
        )

    # Double-buffered panel stream: the measured v5e floor for the round-2
    # serial copy-then-compute loop was ~1.3 us/pair of pure DMA wait + loop
    # overhead (kernel_probe 'dmaonly') — as large as the matmul itself.
    # Issuing block v+1's copy into the other buffer before computing block v
    # hides the transfer behind the matmul+epilogue.
    @pl.when(trip > 0)
    def _():
        panel_dma(0, 0).start()

    def body(v, carry):
        best_key, best_blk = carry
        slot = jax.lax.rem(v, 2)
        b = block_id(v)

        @pl.when(v + 1 < trip)
        def _():
            panel_dma(v + 1, 1 - slot).start()

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
        # |t_den| guard mirrors the oracle's MT_EPS determinant guard
        # (det = -t_den): near-plane-parallel rays otherwise pass the side
        # tests with an ill-conditioned 0/0 distance.  Padding (0/0 = NaN)
        # fails the guard too.
        ok = ok & (t > 1e-6) & (jnp.abs(tden) > 1e-9)
        # Positive IEEE floats compare like their bit patterns, so the
        # per-lane running min works on the raw t bits (full precision).
        key = jnp.where(
            ok, jax.lax.bitcast_convert_type(t, jnp.int32), init_key
        )
        take = key < best_key
        return (
            jnp.where(take, key, best_key),
            jnp.where(take, b, best_blk),
        )

    best_key, best_blk = jax.lax.fori_loop(0, trip, body, init)
    # One cross-lane reduction per TILE: nearest t, then the smallest packed
    # slot among exact ties (matches the oracle's first-minimum argmin).
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, tb), 1)
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


@functools.partial(
    jax.jit, static_argnames=("tb", "nb", "vmax", "t_init", "interpret")
)
def _pairs_call(f_tiles, ids, counts, ovf, trif, *, tb, nb, vmax, t_init,
                interpret=False):
    n_tiles = f_tiles.shape[0]
    kern = functools.partial(
        _pairs_kernel, tb=tb, nb=nb, vmax=vmax, t_init=t_init
    )
    t, slot = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ids (vmax, T)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # overflow (T,) int32
            pl.BlockSpec(memory_space=pl.ANY),  # trif (NB, 48, 5*TB)
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
            pltpu.VMEM((2, 48, 5 * tb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    sort_rays: bool = False,
):
    """MXU raycast over raw asset components; returns (t, packed_slot).

    ``t`` is +inf on miss (matching the other backends' pre-finalize
    contract); slots are packed block*TB + lane indices into tri_data.
    ``sort_rays`` groups incoherent ray sets into coherent tiles (see
    _ray_sort_order); results come back in the caller's order.
    """
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    n = origins.shape[0]
    nb = tri_data.shape[0]
    tb = tri_data.shape[2]
    if tb > 128:
        raise ValueError(
            f"mxu backend packs the winning lane into 7 key bits; "
            f"block_size must be <= 128, got {tb}"
        )
    t_init = float(t_max) if np.isfinite(t_max) else 1.0e30

    order = None
    if sort_rays:
        lo = jnp.nanmin(block_lo, axis=0)
        hi = jnp.nanmax(block_hi, axis=0)
        order = _ray_sort_order(origins, dirs, lo, hi)
        origins = origins[order]
        dirs = dirs[order]

    pad = (-n) % TILE
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e8, jnp.float32)]
        )
        dirs = jnp.concatenate(
            [dirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))]
        )
    n_tiles = origins.shape[0] // TILE

    # Scene centering conditions the Pluecker intermediates (see build_trif).
    center = (jnp.nanmin(block_lo, axis=0) + jnp.nanmax(block_hi, axis=0)) * 0.5
    trif = build_trif(tri_data, center)
    ids, counts, ovf = candidate_blocks(
        origins, dirs, block_lo, block_hi, t_max=t_init, vmax=VMAX
    )
    f = ray_features(origins - center, dirs).reshape(n_tiles, TILE, 16)

    # Chunk tiles so the SMEM candidate table stays bounded.
    ts, slots = [], []
    for s in range(0, n_tiles, MEGA):
        e = min(s + MEGA, n_tiles)
        t, slot = _pairs_call(
            f[s:e], ids[:, s:e], counts[s:e], ovf[s:e].astype(jnp.int32),
            trif, tb=tb, nb=nb, vmax=VMAX, t_init=t_init,
            interpret=interpret,
        )
        ts.append(t)
        slots.append(slot)
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
    interpret: bool = False, sort_rays: bool = False,
) -> RaycastResult:
    """Intersect rays with the resident scene via the MXU pairs kernel."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    t, slot = raycast_mxu_components(
        origins, dirs, asset.tri_data, asset.block_lo, asset.block_hi,
        t_max=t_max, interpret=interpret, sort_rays=sort_rays,
    )
    return finalize_result(origins, dirs, t, slot, asset)
