"""Label prefetch + async 1-NN transfer: identical outputs to the sync path.

The sim stage's hot host item is the annotation load + label transfer
(reference s3dis_sim_scene.py:347-427 pays both inline).  The framework
overlaps them — LabelPrefetch starts the disk parse at scene load and
start_label_transfer_async dispatches the device NN before the host-side
frame/statistics work — so these tests pin the only thing that matters:
byte-identical outputs and the profiling keys that account the overlap.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ipcgen_tpu.containers.sim_scene import (
    LabelPrefetch,
    S3DISSimScene,
    load_room_label_data,
)

FIXTURE = str(Path(__file__).parent / "fixtures" / "golden_room")
AREA, ROOM = "Area_1", "office_1"


def _scene(prefetch=None):
    return S3DISSimScene(
        ROOM,
        s3dis_data_root=FIXTURE,
        area=AREA,
        room=ROOM,
        label_prefetch=prefetch,
    )


def _queries(n=500, seed=0):
    pts, _, _, _ = load_room_label_data(FIXTURE, AREA, ROOM)
    assert pts is not None and len(pts) > 0
    rng = np.random.default_rng(seed)
    q = pts[rng.integers(0, len(pts), n)].astype(np.float32)
    return q + rng.normal(0, 0.003, q.shape).astype(np.float32)


def test_label_prefetch_matches_sync():
    q = _queries()
    c0, s0, i0 = _scene()._get_colors_and_labels_from_s3dis(q)
    pre = _scene(prefetch=LabelPrefetch(FIXTURE, AREA, ROOM))
    c1, s1, i1 = pre._get_colors_and_labels_from_s3dis(q)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # The disk parse ran in the background; only the join wait is visible.
    assert "label_load_bg" in pre.profile
    assert pre.profile["label_load"] <= pre.profile["label_load_bg"] + 0.5


def test_async_transfer_matches_sync():
    q = _queries(seed=1)
    c0, s0, i0 = _scene()._get_colors_and_labels_from_s3dis(q)

    scene = _scene(prefetch=LabelPrefetch(FIXTURE, AREA, ROOM))
    pad = np.zeros((12, 3), np.float32)  # masked-out padding rows
    dev_q = jnp.asarray(np.vstack([q, pad]))
    mask = np.array([True] * len(q) + [False] * len(pad))
    scene.set_device_label_queries(dev_q, mask)
    scene.start_label_transfer_async()
    c1, s1, i1 = scene._get_colors_and_labels_from_s3dis(q)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # The NN ran on the worker thread (label_nn_bg) and the critical-path
    # load span was pinned to ~0 by the worker's cache fill.
    assert "label_nn_bg" in scene.profile
    assert scene.profile.get("label_load", 0.0) <= 0.5


def test_async_transfer_falls_back_on_count_mismatch():
    """Frames filtered between collect and export change the point count;
    the stale async index must be discarded for the sync path."""
    q = _queries(seed=2)
    c0, s0, i0 = _scene()._get_colors_and_labels_from_s3dis(q)

    scene = _scene()
    scene.set_device_label_queries(jnp.asarray(q), np.ones(len(q), bool))
    scene.start_label_transfer_async()
    q_sub = q[:-7]  # simulate post-collect frame filtering
    c1, s1, i1 = scene._get_colors_and_labels_from_s3dis(q_sub)
    np.testing.assert_array_equal(np.asarray(c0)[:-7], np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s0)[:-7], np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(i0)[:-7], np.asarray(i1))


def test_prewarm_registry_round_trip():
    """Batch drivers prewarm a room's labels before the sim stage; the
    simulator claims (pops) the prefetch, and the data matches a direct
    load."""
    from ipcgen_tpu.containers.sim_scene import (
        claim_prewarmed_labels,
        prewarm_labels,
    )

    assert prewarm_labels(None, AREA, ROOM) is None
    pf = prewarm_labels(FIXTURE, AREA, ROOM)
    assert pf is not None
    # Second prewarm of the same key reuses the in-flight prefetch.
    assert prewarm_labels(FIXTURE, AREA, ROOM) is pf
    claimed = claim_prewarmed_labels(FIXTURE, AREA, ROOM)
    assert claimed is pf
    # Claimed = popped: a second claim finds nothing.
    assert claim_prewarmed_labels(FIXTURE, AREA, ROOM) is None
    pts, colors, sem, ins = claimed.join()
    ref = load_room_label_data(FIXTURE, AREA, ROOM)
    np.testing.assert_array_equal(np.asarray(pts), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(sem), np.asarray(ref[2]))
    assert claimed.grid is not None
    # Prefetch sub-spans are recorded for attribution.
    assert "ann_parse" in claimed.spans and "grid_build" in claimed.spans
