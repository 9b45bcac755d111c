"""Deterministic generator for the checked-in golden S3DIS-format room.

Produces tests/fixtures/golden_room/Area_1/office_1/ with the exact on-disk
layout the reference consumes (room txt ``x y z r g b`` —
s3dis_data_loader.py:25-66 — plus per-instance ``Annotations/{class}_{k}.txt``
— s3dis_annotation_loader.py:72-110).  Run once; the txt outputs are
committed so the golden pipeline test never depends on this script at test
time.

    python tests/fixtures/make_golden_room.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

ROOM = np.array([4.0, 3.0, 2.4])  # extents (m)
SEED = 20260816
# Surface sampling density (points / m^2): dense enough for voxel-0.08
# reconstruction while keeping the committed files small.
DENSITY = 260.0

# Per-class display colors (uint8); arbitrary but stable.
COLORS = {
    "ceiling": (200, 200, 200),
    "floor": (120, 100, 80),
    "wall": (180, 170, 150),
    "window": (90, 140, 200),
    "table": (150, 90, 40),
    "chair": (60, 60, 160),
    "sofa": (160, 40, 40),
    "bookcase": (90, 60, 20),
    "board": (30, 120, 60),
}


def _rect(rng, n, origin, u, v):
    """n points on the rectangle origin + a*u + b*v, a,b in [0,1]."""
    ab = rng.uniform(0.0, 1.0, (n, 2))
    return origin + ab[:, :1] * u + ab[:, 1:] * v


def _n_for(u, v):
    area = np.linalg.norm(np.cross(u, v))
    return max(int(area * DENSITY), 24)


def _box_surface(rng, lo, hi, faces="all"):
    """Points on the outer faces of an AABB (faces: 'all' or exclude floor)."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    size = hi - lo
    pts = []
    for axis in range(3):
        for side, base_val in ((0, lo[axis]), (1, hi[axis])):
            if faces == "no_bottom" and axis == 2 and side == 0:
                continue
            u = np.zeros(3)
            v = np.zeros(3)
            a1, a2 = [a for a in range(3) if a != axis]
            u[a1] = size[a1]
            v[a2] = size[a2]
            origin = lo.copy()
            origin[axis] = base_val
            pts.append(_rect(rng, _n_for(u, v), origin, u, v))
    return np.vstack(pts)


def main(out_root: Path | None = None) -> Path:
    rng = np.random.default_rng(SEED)
    root = out_root or Path(__file__).parent / "golden_room"
    room_dir = root / "Area_1" / "office_1"
    ann_dir = room_dir / "Annotations"
    ann_dir.mkdir(parents=True, exist_ok=True)

    W, D, H = ROOM
    instances = {}

    # Structural shell ------------------------------------------------
    instances["floor_1"] = _rect(
        rng, _n_for([W, 0, 0], [0, D, 0]), np.zeros(3), [W, 0, 0], [0, D, 0]
    )
    instances["ceiling_1"] = _rect(
        rng, _n_for([W, 0, 0], [0, D, 0]), [0, 0, H], [W, 0, 0], [0, D, 0]
    )
    walls = [
        (np.zeros(3), [W, 0, 0], [0, 0, H]),  # y = 0
        ([0, D, 0], [W, 0, 0], [0, 0, H]),  # y = D
        (np.zeros(3), [0, D, 0], [0, 0, H]),  # x = 0
        ([W, 0, 0], [0, D, 0], [0, 0, H]),  # x = W
    ]
    for k, (o, u, v) in enumerate(walls, start=1):
        instances[f"wall_{k}"] = _rect(
            rng, _n_for(np.asarray(u, float), np.asarray(v, float)),
            np.asarray(o, float), np.asarray(u, float), np.asarray(v, float),
        )

    # Furniture (box surfaces; dimensions pass the bbox quality gates:
    # >=10 points, volume >= 1e-3 m^3, aspect <= 10) -------------------
    instances["table_1"] = _box_surface(
        rng, [1.5, 1.1, 0.0], [2.7, 1.8, 0.74], faces="no_bottom"
    )
    instances["chair_1"] = _box_surface(
        rng, [1.7, 0.45, 0.0], [2.15, 0.9, 0.85], faces="no_bottom"
    )
    instances["chair_2"] = _box_surface(
        rng, [2.3, 2.0, 0.0], [2.75, 2.45, 0.85], faces="no_bottom"
    )
    instances["sofa_1"] = _box_surface(
        rng, [0.2, 0.3, 0.0], [1.0, 2.0, 0.75], faces="no_bottom"
    )
    instances["bookcase_1"] = _box_surface(
        rng, [3.55, 0.3, 0.0], [3.95, 1.7, 1.9], faces="no_bottom"
    )
    # Thin wall-mounted panels.
    instances["board_1"] = _rect(
        rng, _n_for([1.4, 0, 0], [0, 0, 0.9]),
        [1.2, 2.97, 0.9], [1.4, 0, 0], [0, 0, 0.9],
    )
    instances["window_1"] = _rect(
        rng, _n_for([0, 1.0, 0], [0, 0, 1.0]),
        [0.03, 1.0, 0.9], [0, 1.0, 0], [0, 0, 1.0],
    )

    # Write annotation files + the combined room txt ------------------
    _write_room(rng, instances, room_dir, ann_dir, "office_1")
    return root


def _write_room(rng, instances, room_dir, ann_dir, room_name):
    all_rows = []
    for name, pts in instances.items():
        cls = name.rsplit("_", 1)[0]
        base = np.array(COLORS[cls], float)
        jitter = rng.integers(-12, 13, (len(pts), 3))
        rgb = np.clip(base + jitter, 0, 255).astype(int)
        rows = np.hstack([np.round(pts, 3), rgb])
        all_rows.append(rows)
        np.savetxt(ann_dir / f"{name}.txt", rows, fmt="%.3f %.3f %.3f %d %d %d")

    room = np.vstack(all_rows)
    # Shuffle so the room txt ordering is not annotation-grouped (as in the
    # real dataset exports).
    room = room[rng.permutation(len(room))]
    np.savetxt(room_dir / f"{room_name}.txt", room,
               fmt="%.3f %.3f %.3f %d %d %d")
    print(f"golden room: {len(room)} points -> {room_dir}")


def _rot_z(pts, yaw_deg, center):
    """Rotate points about the z axis through ``center``."""
    c, s = np.cos(np.deg2rad(yaw_deg)), np.sin(np.deg2rad(yaw_deg))
    r = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    center = np.asarray(center, float)
    return (pts - center) @ r.T + center


def main_l(out_root: Path | None = None) -> Path:
    """Concave L-shaped room with ROTATED furniture (VERDICT r2 item 5).

    Real S3DIS rooms (hallways, auditoria — s3dis_data_loader.py:25-66
    parses arbitrary rooms) are concave with obliquely placed furniture;
    the axis-aligned golden office never stresses the slab-test /
    candidate-list machinery or the trajectory planner's concave-corner
    handling.  Footprint: the union of lobes (0..6, 0..3) and
    (0..2.5, 3..5); every furniture box is yawed off-axis.
    """
    rng = np.random.default_rng(SEED + 1)
    root = out_root or Path(__file__).parent / "golden_room_l"
    room_dir = root / "Area_2" / "lounge_1"
    ann_dir = room_dir / "Annotations"
    ann_dir.mkdir(parents=True, exist_ok=True)

    H = 2.4
    instances = {}

    # L-shaped floor/ceiling: two rectangular lobes.
    lobes = [
        (np.zeros(3), [6.0, 0, 0], [0, 3.0, 0]),
        ([0, 3.0, 0], [2.5, 0, 0], [0, 2.0, 0]),
    ]
    fl, ce = [], []
    for o, u, v in lobes:
        o = np.asarray(o, float)
        u = np.asarray(u, float)
        v = np.asarray(v, float)
        fl.append(_rect(rng, _n_for(u, v), o, u, v))
        ce.append(_rect(rng, _n_for(u, v), o + [0, 0, H], u, v))
    instances["floor_1"] = np.vstack(fl)
    instances["ceiling_1"] = np.vstack(ce)

    # Six walls along the concave boundary (counter-clockwise):
    # (0,0)->(6,0)->(6,3)->(2.5,3)->(2.5,5)->(0,5)->(0,0)
    corners = [(0, 0), (6, 0), (6, 3), (2.5, 3), (2.5, 5), (0, 5)]
    for k in range(6):
        x0, y0 = corners[k]
        x1, y1 = corners[(k + 1) % 6]
        o = np.array([x0, y0, 0.0])
        u = np.array([x1 - x0, y1 - y0, 0.0])
        v = np.array([0.0, 0.0, H])
        instances[f"wall_{k + 1}"] = _rect(rng, _n_for(u, v), o, u, v)

    # Rotated furniture: sample axis-aligned box surfaces, then yaw them
    # about their own center so every face is oblique.
    def rotated_box(lo, hi, yaw):
        pts = _box_surface(rng, lo, hi, faces="no_bottom")
        center = (np.asarray(lo, float) + hi) / 2.0
        return _rot_z(pts, yaw, center)

    instances["table_1"] = rotated_box([1.4, 0.9, 0.0], [2.6, 1.6, 0.74], 27.0)
    instances["chair_1"] = rotated_box([1.55, 0.25, 0.0], [2.0, 0.7, 0.85], 27.0)
    instances["sofa_1"] = rotated_box([4.4, 1.6, 0.0], [5.8, 2.4, 0.75], -38.0)
    instances["bookcase_1"] = rotated_box(
        [0.5, 3.6, 0.0], [0.9, 4.8, 1.9], 12.0
    )
    instances["chair_2"] = rotated_box([3.6, 0.5, 0.0], [4.05, 0.95, 0.85], 63.0)
    # Wall-mounted board on the inner (concave) wall x = 2.5.
    instances["board_1"] = _rect(
        rng, _n_for([0, 1.2, 0], [0, 0, 0.9]),
        [2.47, 3.3, 0.9], [0, 1.2, 0], [0, 0, 0.9],
    )

    _write_room(rng, instances, room_dir, ann_dir, "lounge_1")
    return root


if __name__ == "__main__":
    main()
    main_l()
