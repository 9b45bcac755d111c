"""MXU pairs-kernel raycast: parity vs the XLA oracle (interpret mode).

The Pluecker/matmul formulation is not bit-identical to Moeller-Trumbore
(different rounding + the 7-bit lane packing in t), so parity is asserted
with tolerances: identical hit masks away from edge ties, t to 1e-4
relative, identical winning triangles.
"""

import numpy as np
import pytest

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.ops import raycast_mxu
from ipcgen_tpu.ops.raycast import raycast_asset_xla
from ipcgen_tpu.ops.raycast_mxu import (
    candidate_blocks,
    raycast_asset_mxu,
)
from ipcgen_tpu.ops.scene_asset import build_scene_asset


def _cluttered_room(rng, n_boxes=5):
    room = TriMesh.box(center=(2, 1.5, 1.25), size=(4, 3, 2.5), inward=True)
    vs, ts = [room.vertices], [room.triangles]
    off = len(room.vertices)
    for _ in range(n_boxes):
        c = rng.uniform([0.6, 0.6, 0.2], [3.4, 2.4, 1.0])
        b = TriMesh.box(center=tuple(c), size=tuple(rng.uniform(0.2, 0.8, 3)))
        vs.append(b.vertices)
        ts.append(b.triangles + off)
        off += len(b.vertices)
    return np.concatenate(vs).astype(np.float32), np.concatenate(ts).astype(
        np.int32
    )


def test_single_triangle_closed_form():
    verts = np.array([[0, 0, 2], [4, 0, 2], [0, 4, 2]], dtype=np.float32)
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    asset = build_scene_asset(verts, tris, block_size=8, super_factor=2)
    origins = np.array(
        [[1, 1, 0], [1, 1, 5], [10, 10, 0], [1, 1, 0]], dtype=np.float32
    )
    dirs = np.array(
        [[0, 0, 1], [0, 0, -1], [0, 0, 1], [0, 0, -1]], dtype=np.float32
    )
    res = raycast_asset_mxu(origins, dirs, asset, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(res.hit), [True, True, False, False]
    )
    np.testing.assert_allclose(np.asarray(res.t)[:2], [2.0, 3.0], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.points)[0], [1, 1, 2], atol=1e-3
    )


def test_parity_vs_oracle_cluttered(rng):
    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    n = 2048
    origins = np.tile(np.array([2, 1.5, 1.0], np.float32), (n, 1))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins[3 * n // 4 :] = rng.uniform(-12, -6, (n // 4, 3)).astype(
        np.float32
    )
    res_o = raycast_asset_xla(origins, dirs, asset)
    res_m = raycast_asset_mxu(origins, dirs, asset, t_max=20.0, interpret=True)
    hit_o = np.asarray(res_o.hit) & (np.asarray(res_o.t) < 20.0)
    hit_m = np.asarray(res_m.hit)
    agree = hit_m == hit_o
    assert agree.mean() >= 0.999, agree.mean()
    both = hit_m & hit_o
    assert both.sum() > n // 2
    np.testing.assert_allclose(
        np.asarray(res_m.t)[both], np.asarray(res_o.t)[both], rtol=1e-3
    )
    same_tri = (
        np.asarray(res_m.tri_id)[both] == np.asarray(res_o.tri_id)[both]
    )
    assert same_tri.mean() > 0.999


def test_overflow_tiles_walk_all_blocks(rng, monkeypatch):
    """Tiles with more candidates than VMAX fall back to the full block walk
    and still return correct results."""
    monkeypatch.setattr(raycast_mxu, "VMAX", 2)
    verts, tris = _cluttered_room(rng, n_boxes=3)
    asset = build_scene_asset(verts, tris, block_size=8, super_factor=2)
    assert asset.num_blocks > 2
    n = 1024
    origins = np.tile(np.array([2, 1.5, 1.0], np.float32), (n, 1))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    res_o = raycast_asset_xla(origins, dirs, asset)
    res_m = raycast_asset_mxu(origins, dirs, asset, interpret=True)
    hit_o = np.asarray(res_o.hit)
    assert (np.asarray(res_m.hit) == hit_o).mean() > 0.999
    both = np.asarray(res_m.hit) & hit_o
    np.testing.assert_allclose(
        np.asarray(res_m.t)[both], np.asarray(res_o.t)[both], rtol=1e-3
    )


def test_candidate_blocks_exactness(rng):
    """Candidate lists contain every block any tile ray can hit (no false
    negatives; the kernel depends on this for correctness)."""
    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    blo = np.asarray(asset.block_lo)
    bhi = np.asarray(asset.block_hi)
    n = raycast_mxu.TILE
    origins = np.tile(np.array([2, 1.5, 1.0], np.float32), (n, 1))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ids, counts, ovf, masks = candidate_blocks(
        origins, dirs, asset.block_lo, asset.block_hi, t_max=20.0, vmax=1024
    )
    got = set(np.asarray(ids)[: int(counts[0]), 0].tolist())
    # reference slab test
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
    t1 = (blo[None] - origins[:, None]) * inv[:, None]
    t2 = (bhi[None] - origins[:, None]) * inv[:, None]
    entry = np.nanmax(np.minimum(t1, t2), axis=2)
    exit_ = np.nanmin(np.maximum(t1, t2), axis=2)
    hit = (exit_ >= np.maximum(entry, 0)) & (entry < 20.0)  # (rays, NB)
    want = set(np.nonzero(hit.any(axis=0))[0].tolist())
    assert want <= got, want - got
    # Subtile masks: bit s must be set whenever any ray of 256-ray row s
    # crosses the block (the kernel skips unmasked rows entirely).
    sub = raycast_mxu.TILE // raycast_mxu.N_SUB
    want_bits = np.zeros(hit.shape[1], np.int32)
    for s in range(raycast_mxu.N_SUB):
        want_bits |= hit[s * sub : (s + 1) * sub].any(axis=0) << s
    got_masks = {
        int(b): int(m)
        for b, m in zip(
            np.asarray(ids)[: int(counts[0]), 0],
            np.asarray(masks)[: int(counts[0]), 0],
        )
    }
    for b in want:
        assert want_bits[b] & ~got_masks[b] == 0, (
            f"block {b}: kernel would skip a crossing subtile "
            f"(want {want_bits[b]:04b}, got {got_masks[b]:04b})"
        )


def test_hierarchical_prepass_matches_flat_exact(rng):
    """The two-stage (group -> block) prepass must produce the SAME
    candidate sets as the flat per-ray slab prepass (a block is inside its
    group, so the group stage can hide nothing; the pairs kernel silently
    returns wrong hits for any missing block)."""
    from ipcgen_tpu.ops.raycast_mxu import TILE, candidate_blocks_exact

    verts, tris = _cluttered_room(rng, n_boxes=8)
    asset = build_scene_asset(verts, tris, block_size=16, super_factor=4)
    n_tiles = 6
    n = n_tiles * TILE
    # Mix of coherent scan wedges (per-waypoint fans) and random-ish tiles.
    phis = np.linspace(0, 2 * np.pi, TILE, endpoint=False)
    thetas = np.deg2rad(rng.uniform(-30, 20, size=TILE))
    fan = np.stack(
        [np.cos(thetas) * np.cos(phis), np.cos(thetas) * np.sin(phis),
         np.sin(thetas)], axis=1,
    ).astype(np.float32)
    dirs, origins = [], []
    for i in range(n_tiles):
        if i % 2 == 0:
            dirs.append(fan)
            origins.append(
                np.tile(rng.uniform([1, 1, 0.5], [3, 2, 1.5]), (TILE, 1))
            )
        else:
            d = rng.normal(size=(TILE, 3))
            dirs.append(d / np.linalg.norm(d, axis=1, keepdims=True))
            origins.append(rng.uniform([1, 1, 0.5], [3, 2, 1.5], (TILE, 3)))
    origins = np.concatenate(origins).astype(np.float32)
    dirs = np.concatenate(dirs).astype(np.float32)

    vmax = asset.num_blocks  # no truncation: compare full lists
    ids_c, counts_c, ovf_c, _masks_c = candidate_blocks(
        origins, dirs, asset.block_lo, asset.block_hi, t_max=20.0,
        vmax=vmax, group=8, gmax=asset.num_blocks,
    )
    ids_e, counts_e, ovf_e = candidate_blocks_exact(
        origins, dirs, asset.block_lo, asset.block_hi, t_max=20.0, vmax=vmax
    )
    ids_c, ids_e = np.asarray(ids_c), np.asarray(ids_e)
    counts_c, counts_e = np.asarray(counts_c), np.asarray(counts_e)
    np.testing.assert_array_equal(counts_c, counts_e)
    for t in range(n_tiles):
        exact = set(ids_e[: counts_e[t], t].tolist())
        hier = set(ids_c[: counts_c[t], t].tolist())
        assert exact == hier, f"tile {t}: {exact ^ hier}"


def test_patch_permutation_is_permutation():
    from ipcgen_tpu.sim.scan import patch_permutation

    for h, w in [(32, 4000), (8, 2000), (4, 64), (5, 130)]:
        perm = patch_permutation(h, w)
        assert sorted(perm.tolist()) == list(range(h * w))
        inv = np.argsort(perm)
        x = np.arange(h * w)
        np.testing.assert_array_equal(x[perm][inv], x)


def test_trif_padding_never_wins(rng):
    """Blocks padded with degenerate triangles produce NaN t and never win."""
    verts = np.array([[0, 0, 2], [4, 0, 2], [0, 4, 2]], dtype=np.float32)
    tris = np.array([[0, 1, 2]], dtype=np.int32)  # 1 tri -> 7 padded slots
    asset = build_scene_asset(verts, tris, block_size=8, super_factor=2)
    trif = np.asarray(raycast_mxu.build_trif(asset.tri_data))
    f = np.asarray(
        raycast_mxu.ray_features(
            np.array([[1, 1, 0]], np.float32), np.array([[0, 0, 1]], np.float32)
        )
    )
    g = f @ (trif[0, :16] + trif[0, 16:32])  # hi + lo split recombined
    tb = asset.block_size
    tden = g[0, 4 * tb :]
    # padded lanes have zero normal -> zero denominator
    assert np.all(tden[1:] == 0.0)


def test_sort_rays_static_under_jit(rng):
    """The coherence-sort escape hatch for jitted callers (VERDICT r3 #5):
    ``raycast_asset(..., sort_rays=True)`` is a static flag, so a caller's
    jit compiles the sort + kernel + inverse permutation into one program
    and the results match the eager unsorted path exactly."""
    import functools

    import jax

    from ipcgen_tpu.ops.raycast import raycast_asset

    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    n = 1024
    origins = rng.uniform([0.5, 0.5, 0.3], [3.4, 2.4, 2.0], (n, 3)).astype(
        np.float32
    )
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    # The mxu kernel runs in interpret mode on CPU; jit over the interpret
    # components entry the same way a TPU caller jits raycast_asset.
    @functools.partial(jax.jit, static_argnames=("sort_rays",))
    def jitted(o, d, a, sort_rays):
        return raycast_asset_mxu(o, d, a, t_max=20.0, interpret=True,
                                 sort_rays=sort_rays)

    res_j = jitted(origins, dirs, asset, sort_rays=True)
    res_u = raycast_asset_mxu(origins, dirs, asset, t_max=20.0,
                              interpret=True, sort_rays=False)
    np.testing.assert_array_equal(np.asarray(res_j.hit), np.asarray(res_u.hit))
    np.testing.assert_allclose(
        np.asarray(res_j.t)[np.asarray(res_u.hit)],
        np.asarray(res_u.t)[np.asarray(res_u.hit)], rtol=1e-5,
    )


def test_sort_rays_matches_unsorted(rng):
    """sort_rays groups incoherent rays into coherent tiles; results come
    back in the caller's order and match the unsorted path."""
    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    n = 2048
    origins = rng.uniform([0.5, 0.5, 0.3], [3.4, 2.4, 2.0], (n, 3)).astype(
        np.float32
    )
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    res_u = raycast_asset_mxu(origins, dirs, asset, t_max=20.0, interpret=True)
    res_s = raycast_asset_mxu(origins, dirs, asset, t_max=20.0, interpret=True,
                              sort_rays=True)
    np.testing.assert_array_equal(np.asarray(res_u.hit), np.asarray(res_s.hit))
    np.testing.assert_allclose(
        np.asarray(res_u.t)[np.asarray(res_u.hit)],
        np.asarray(res_s.t)[np.asarray(res_u.hit)], rtol=1e-5,
    )


def test_tile_width_variants_match(rng):
    """The kernel's tile/n_sub granularity is a pure performance knob:
    every configuration returns identical results (r4: smaller tiles are
    the sorted-incoherent path's default; see raycast_mxu_components)."""
    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    n = 1024
    origins = rng.uniform([0.5, 0.5, 0.3], [3.4, 2.4, 2.0], (n, 3)).astype(
        np.float32
    )
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = raycast_asset_mxu(origins, dirs, asset, t_max=20.0, interpret=True,
                            sort_rays=False)
    h_ref = np.asarray(ref.hit)
    for tile, n_sub, srt in ((512, 2, False), (256, 2, True)):
        res = raycast_asset_mxu(
            origins, dirs, asset, t_max=20.0, interpret=True,
            sort_rays=srt, tile=tile, n_sub=n_sub,
        )
        np.testing.assert_array_equal(h_ref, np.asarray(res.hit)), (tile, srt)
        np.testing.assert_allclose(
            np.asarray(ref.t)[h_ref], np.asarray(res.t)[h_ref], rtol=1e-5
        )


def test_scan_waypoints_mxu_matches_xla(rng, monkeypatch):
    """The fused scan with the MXU backend (patch permutation + kernel +
    inverse permutation) matches the XLA path ray-for-ray."""
    import jax

    from ipcgen_tpu.models import (
        DualAxisLidarIntrinsics,
        Indoor8LineLidarIntrinsics,
    )
    from ipcgen_tpu.sim import scan as scan_mod
    from ipcgen_tpu.sim.scan import scan_waypoints
    from ipcgen_tpu.trajectory import Waypoint
    from ipcgen_tpu.trajectory.waypoint import waypoints_to_pose_batch

    verts, tris = _cluttered_room(rng)
    asset = build_scene_asset(verts, tris)
    poses = waypoints_to_pose_batch(
        [Waypoint(1.2, 1.0, 1.0, 0.3), Waypoint(2.8, 2.0, 1.0, 2.1)]
    )
    # Force the mxu backend to run in interpret mode on CPU.
    orig = scan_mod.raycast_asset

    def patched(o, d, a, backend="auto", t_max=np.inf):
        if backend == "mxu":
            return raycast_asset_mxu(o, d, a, t_max=t_max, interpret=True)
        return orig(o, d, a, backend=backend, t_max=t_max)

    monkeypatch.setattr(scan_mod, "raycast_asset", patched)

    for intr in (
        Indoor8LineLidarIntrinsics(
            vertical_res=8, horizontal_res=256,
            vertical_degrees=[15, 10, 5, 0, -5, -10, -15, -20],
            max_range=20.0,
        ),
        DualAxisLidarIntrinsics.create_blk2go_dual_axis(),
    ):
        key = jax.random.PRNGKey(3)
        b_x = scan_waypoints(asset, intr, poses, key=key, backend="xla")
        b_m = scan_waypoints(asset, intr, poses, key=key, backend="mxu")
        assert b_m.points.shape == b_x.points.shape
        mx, mm = np.asarray(b_x.mask), np.asarray(b_m.mask)
        # identical masks up to rare crease ties
        assert (mx == mm).mean() > 0.999
        both = mx & mm
        np.testing.assert_allclose(
            np.asarray(b_m.t)[both], np.asarray(b_x.t)[both], rtol=1e-3
        )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_degenerate_geometry_vs_oracle(seed):
    """Fuzz: sliver/degenerate/duplicate triangles + grazing rays must never
    crash and must match the oracle's hit decisions within the contract."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (60, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (60, 3)).astype(np.float32)
    # inject degenerates: zero-area, slivers, duplicates
    e1[0] = 0  # zero edge
    e2[1] = e1[1]  # collinear -> zero normal
    e1[2] *= 1e-6  # sliver
    base[3], e1[3], e2[3] = base[4], e1[4], e2[4]  # duplicate of tri 4
    verts = np.concatenate([base, base + e1, base + e2]).astype(np.float32)
    tris = (
        np.arange(180, dtype=np.int32).reshape(3, 60).T
    )
    asset = build_scene_asset(verts, tris, block_size=8, super_factor=2)
    n = 512
    origins = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # some rays exactly along triangle planes (grazing)
    nrm = np.cross(e1[5], e2[5])
    graze = np.cross(nrm, rng.normal(size=3)).astype(np.float32)
    dirs[:8] = graze / np.linalg.norm(graze)
    origins[:8] = base[5] + e1[5] * 0.3

    res_o = raycast_asset_xla(origins, dirs, asset)
    res_m = raycast_asset_mxu(origins, dirs, asset, t_max=50.0, interpret=True)
    ho = np.asarray(res_o.hit) & (np.asarray(res_o.t) < 50.0)
    hm = np.asarray(res_m.hit)
    # Grazing/degenerate cases may tie either way; bound the disagreement.
    assert (ho == hm).mean() > 0.98, (ho != hm).sum()
    both = ho & hm & (np.asarray(res_m.tri_id) == np.asarray(res_o.tri_id))
    if both.any():
        # atol 5e-4: the hardware contract is 5 mm worst-case hit-point
        # error; panels are STORED bf16 (the same rounding the MXU applies
        # on hardware), so grazing slivers at tiny t carry ~1e-4 absolute
        # wobble in interpret mode too.
        np.testing.assert_allclose(
            np.asarray(res_m.t)[both], np.asarray(res_o.t)[both],
            rtol=1e-3, atol=5e-4,
        )
    assert np.all(np.isfinite(np.asarray(res_m.points)[hm]))
