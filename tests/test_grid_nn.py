"""Grid-hashed 1-NN: accuracy vs exact on surface clouds + fallback path."""

import numpy as np

from ipcgen_tpu.ops.grid_nn import nearest_neighbor_indices_grid
from ipcgen_tpu.ops.knn import nearest_neighbor_indices


def _shell(rng, n, scale=(4.0, 3.0, 2.5)):
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32) * scale
    side = rng.integers(0, 6, n)
    for ax in range(3):
        pts[side == 2 * ax, ax] = 0.0
        pts[side == 2 * ax + 1, ax] = scale[ax]
    return pts


def test_grid_nn_near_exact_on_surfaces(rng):
    refs = _shell(rng, 20000)
    queries = _shell(rng, 3000) + rng.normal(0, 0.004, (3000, 3)).astype(np.float32)
    g = nearest_neighbor_indices_grid(queries, refs)
    e = nearest_neighbor_indices(queries, refs)
    d_g = np.linalg.norm(queries - refs[g], axis=1)
    d_e = np.linalg.norm(queries - refs[e], axis=1)
    # Distances essentially identical (labels therefore identical)
    assert np.mean(d_g / np.maximum(d_e, 1e-9)) < 1.01
    assert np.percentile(d_g - d_e, 99) < 5e-3


def test_grid_nn_fallback_for_far_queries(rng):
    refs = _shell(rng, 5000)
    # Queries far outside every grid cell force the exact fallback
    far = rng.uniform(50, 60, (20, 3)).astype(np.float32)
    g = nearest_neighbor_indices_grid(far, refs)
    e = nearest_neighbor_indices(far, refs)
    d_g = np.linalg.norm(far - refs[g], axis=1)
    d_e = np.linalg.norm(far - refs[e], axis=1)
    np.testing.assert_allclose(d_g, d_e, rtol=1e-5)


def test_grid_nn_empty_queries(rng):
    refs = _shell(rng, 100)
    assert nearest_neighbor_indices_grid(np.zeros((0, 3), np.float32), refs).shape == (0,)


def test_knn_grid_matches_exact_on_surfaces(rng):
    from ipcgen_tpu.ops.grid_nn import knn_grid
    from ipcgen_tpu.ops.knn import knn

    refs = _shell(rng, 20000)
    queries = _shell(rng, 2000) + rng.normal(0, 0.004, (2000, 3)).astype(np.float32)
    gi, gd = knn_grid(queries, refs, k=10)
    ei, ed = knn(queries, refs, k=10)
    finite = np.isfinite(gd).all(axis=1)
    assert finite.mean() > 0.95  # dense surface: nearly all resolve in-grid
    # Mean 10-NN distance per point matches the exact join closely
    ratio = gd[finite].mean(axis=1) / np.maximum(ed[finite].mean(axis=1), 1e-9)
    assert np.mean(ratio) < 1.02
    assert np.percentile(ratio, 99) < 1.2


def test_knn_grid_self_join_has_zero_first_column(rng):
    from ipcgen_tpu.ops.grid_nn import knn_grid

    pts = _shell(rng, 8000)
    idx, d = knn_grid(pts, pts, k=5)
    finite = np.isfinite(d[:, 0])
    np.testing.assert_allclose(d[finite, 0], 0.0, atol=1e-5)
    assert (idx[finite, 0] == np.arange(len(pts))[finite]).mean() > 0.99


def test_knn_grid_device_arrays_mode(rng):
    import jax.numpy as jnp

    from ipcgen_tpu.ops.grid_nn import knn_grid

    pts = _shell(rng, 6000)
    idx_d, d2_d = knn_grid(pts, pts, k=4, device_arrays=True)
    assert isinstance(idx_d, jnp.ndarray) and isinstance(d2_d, jnp.ndarray)
    idx_h, d_h = knn_grid(pts, pts, k=4)
    np.testing.assert_array_equal(np.asarray(idx_d), idx_h)
    d_from_dev = np.sqrt(np.maximum(np.asarray(d2_d), 0.0))
    mask = np.isfinite(d_h)
    np.testing.assert_allclose(d_from_dev[mask], d_h[mask], atol=1e-4)


def test_grid_nn_degenerate_geometries(rng):
    """Identical, coplanar, and collinear reference sets stay exact."""
    from ipcgen_tpu.ops.grid_nn import nearest_neighbor_indices_grid

    refs = np.tile(np.float32([[1, 2, 3]]), (300, 1))
    q = rng.uniform(0, 4, (50, 3)).astype(np.float32)
    idx = nearest_neighbor_indices_grid(q, refs)
    assert idx.shape == (50,) and set(np.unique(idx)) <= set(range(300))

    refs2 = rng.uniform(0, 5, (5000, 3)).astype(np.float32)
    refs2[:, 2] = 0.0  # coplanar
    q2 = rng.uniform(0, 5, (200, 3)).astype(np.float32)
    idx2 = nearest_neighbor_indices_grid(q2, refs2)
    e2 = nearest_neighbor_indices(q2, refs2)
    d_g = np.linalg.norm(q2 - refs2[idx2], axis=1)
    d_e = np.linalg.norm(q2 - refs2[e2], axis=1)
    np.testing.assert_allclose(d_g, d_e, atol=1e-5)

    refs3 = np.zeros((1000, 3), np.float32)
    refs3[:, 0] = np.linspace(0, 9, 1000)  # collinear
    q3 = rng.uniform(-1, 10, (100, 3)).astype(np.float32)
    idx3 = nearest_neighbor_indices_grid(q3, refs3)
    e3 = nearest_neighbor_indices(q3, refs3)
    np.testing.assert_allclose(
        np.linalg.norm(q3 - refs3[idx3], axis=1),
        np.linalg.norm(q3 - refs3[e3], axis=1),
        atol=1e-5,
    )


def test_grid_nn_exact_by_construction(rng):
    """Hashed answers are accepted only when provably nearest, so the result
    always equals the exact 1-NN (in distance)."""
    refs = _shell(rng, 8000)
    queries = np.concatenate(
        [
            _shell(rng, 500),
            rng.uniform(-2, 6, (200, 3)).astype(np.float32),  # off-surface
        ]
    )
    g = nearest_neighbor_indices_grid(queries, refs)
    e = nearest_neighbor_indices(queries, refs)
    np.testing.assert_allclose(
        np.linalg.norm(queries - refs[g], axis=1),
        np.linalg.norm(queries - refs[e], axis=1),
        atol=1e-5,
    )


def test_grid_nn_large_extent_scene_bounded_memory(rng):
    """A 60 m-extent scene (chunked-recon scale) must not allocate a dense
    volume/h^3 cell table: the hashed bucket table is point-count-bound."""
    from ipcgen_tpu.ops.grid_nn import _build_hash_grid, _MAX_TABLE

    refs = _shell(rng, 5000, scale=(60.0, 60.0, 6.0))
    order, starts, lo, dims, inv_h = _build_hash_grid(refs, 0.01)
    # Dense table would need 6000*6000*600 cells; hashed is <= _MAX_TABLE.
    assert len(starts) <= _MAX_TABLE + 1
    q = _shell(rng, 400, scale=(60.0, 60.0, 6.0))
    g = nearest_neighbor_indices_grid(q, refs, cell_size=0.05)
    e = nearest_neighbor_indices(q, refs)
    np.testing.assert_allclose(
        np.linalg.norm(q - refs[g], axis=1),
        np.linalg.norm(q - refs[e], axis=1),
        atol=1e-5,
    )


def test_grid_nn_cap_overflow_falls_back(rng):
    """Buckets holding more than `cap` candidates trigger the exact fallback
    rather than silently returning a truncated (possibly wrong) neighbor."""
    # 2000 points crammed into one tiny cluster -> every bucket overflows a
    # cap of 4; plus sparse far points so cells stay small.
    cluster = (rng.normal(0, 0.002, (2000, 3)) + 1.0).astype(np.float32)
    sparse = rng.uniform(0, 2, (200, 3)).astype(np.float32)
    refs = np.concatenate([cluster, sparse])
    q = (rng.normal(0, 0.002, (100, 3)) + 1.0).astype(np.float32)
    g = nearest_neighbor_indices_grid(q, refs, cell_size=0.05, cap=4)
    e = nearest_neighbor_indices(q, refs)
    np.testing.assert_allclose(
        np.linalg.norm(q - refs[g], axis=1),
        np.linalg.norm(q - refs[e], axis=1),
        atol=1e-6,
    )


def test_exact_coord_join_matches_and_falls_back(rng):
    """The annotation->raw color match resolves duplicated coordinates by
    exact join (S3DIS annotation files are row subsets of the room cloud);
    non-member rows report unmatched so the caller's NN handles them."""
    from ipcgen_tpu.containers.sim_scene import _exact_coord_join

    refs = rng.uniform(0, 8, (5000, 3)).round(4)
    # queries: a shuffled subset of refs plus some off-cloud points
    sub = rng.permutation(5000)[:3000]
    off = rng.uniform(0, 8, (500, 3)).round(4) + 0.00007  # off-grid coords
    queries = np.concatenate([refs[sub], off])
    idx, matched = _exact_coord_join(queries, refs)
    assert matched[:3000].all()
    np.testing.assert_array_equal(refs[idx[:3000]], refs[sub])
    # the off-cloud block may collide with a real row only if coordinates
    # round to an identical 0.1 mm triple - verify reported matches really
    # are exact, and that clear misses are flagged unmatched
    hit = matched[3000:]
    if hit.any():
        np.testing.assert_array_equal(
            np.round(off[hit] * 1e4), np.round(refs[idx[3000:][hit]] * 1e4)
        )
    assert (~hit).sum() > 400  # overwhelmingly unmatched


def test_exact_coord_join_empty():
    from ipcgen_tpu.containers.sim_scene import _exact_coord_join

    idx, matched = _exact_coord_join(np.zeros((3, 3)), np.zeros((0, 3)))
    assert len(idx) == 3 and not matched.any()
    idx, matched = _exact_coord_join(np.zeros((0, 3)), np.zeros((4, 3)))
    assert len(idx) == 0


# ---------------------------------------------------------------------------
# LabelGrid: the persistent two-level slab grid behind the sim label transfer
# ---------------------------------------------------------------------------

def test_label_grid_exact_vs_brute(rng):
    """LabelGrid answers equal the exact 1-NN in distance on a mix of
    on-surface, noisy, and far off-surface queries (every ladder level)."""
    from ipcgen_tpu.ops.grid_nn import LabelGrid

    refs = _shell(rng, 30000)
    queries = np.concatenate(
        [
            _shell(rng, 2000)
            + rng.normal(0, 0.004, (2000, 3)).astype(np.float32),
            _shell(rng, 300)
            + rng.normal(0, 0.25, (300, 3)).astype(np.float32),  # L1 rows
            rng.uniform(30, 40, (20, 3)).astype(np.float32),  # exact residue
        ]
    )
    grid = LabelGrid(refs)
    g = grid.query(queries)
    e = nearest_neighbor_indices(queries, refs)
    dg = np.linalg.norm(queries - refs[g], axis=1)
    de = np.linalg.norm(queries - refs[e], axis=1)
    # One-sided: the grid must never be farther than the tiled exact join;
    # it IS occasionally closer, because the exact join's matmul-form
    # distances carry f32 cancellation error the grid's direct (q-r)^2
    # does not.
    assert (dg <= de + 1e-5).all()


def test_label_grid_device_queries(rng):
    import jax.numpy as jnp

    from ipcgen_tpu.ops.grid_nn import LabelGrid

    refs = _shell(rng, 12000)
    q = _shell(rng, 1500) + rng.normal(0, 0.01, (1500, 3)).astype(np.float32)
    grid = LabelGrid(refs)
    gd = grid.query(jnp.asarray(q))
    gh = grid.query(q)
    np.testing.assert_array_equal(gd, gh)
    e = nearest_neighbor_indices(q, refs)
    np.testing.assert_allclose(
        np.linalg.norm(q - refs[gd], axis=1),
        np.linalg.norm(q - refs[e], axis=1),
        atol=1e-5,
    )


def test_label_grid_reuse_and_edges(rng):
    from ipcgen_tpu.ops.grid_nn import LabelGrid

    refs = _shell(rng, 5000)
    grid = LabelGrid(refs)
    q1 = _shell(rng, 700)
    q2 = _shell(rng, 41)  # non-multiple of every block size
    for q in (q1, q2):
        g = grid.query(q)
        e = nearest_neighbor_indices(q, refs)
        np.testing.assert_allclose(
            np.linalg.norm(q - refs[g], axis=1),
            np.linalg.norm(q - refs[e], axis=1),
            atol=1e-5,
        )
    assert grid.query(np.zeros((0, 3), np.float32)).shape == (0,)


def test_label_grid_dense_cluster_overflow(rng):
    """Cap-overflowing buckets ladder down without losing exactness."""
    from ipcgen_tpu.ops.grid_nn import LabelGrid

    cluster = (rng.normal(0, 0.002, (4000, 3)) + 1.0).astype(np.float32)
    sparse = rng.uniform(0, 2, (300, 3)).astype(np.float32)
    refs = np.concatenate([cluster, sparse])
    q = np.concatenate(
        [
            (rng.normal(0, 0.002, (200, 3)) + 1.0).astype(np.float32),
            rng.uniform(0, 2, (100, 3)).astype(np.float32),
        ]
    )
    grid = LabelGrid(refs)
    g = grid.query(q)
    e = nearest_neighbor_indices(q, refs)
    np.testing.assert_allclose(
        np.linalg.norm(q - refs[g], axis=1),
        np.linalg.norm(q - refs[e], axis=1),
        atol=1e-6,
    )
