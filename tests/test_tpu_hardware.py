"""Hardware parity: the Pallas kernel on a REAL TPU chip vs the XLA oracle.

The suite runs on the CPU platform (conftest), so this test probes the chip
from a subprocess that initializes jax normally; it is skipped when no TPU
is attached.  This promotes the bench claim (compiled-kernel output equals
the oracle on hardware, not just in the Pallas interpreter) into an
asserted test — VERDICT r1 item 9.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_SCRIPT = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NOTPU")
    raise SystemExit(0)

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.ops.raycast import raycast_asset
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.utils.host import to_host

rng = np.random.default_rng(0)
room = TriMesh.box(center=(2, 1.5, 1.25), size=(4, 3, 2.5), inward=True)
vs, ts = [room.vertices], [room.triangles]
off = len(room.vertices)
for _ in range(6):  # furniture clutter: occlusion + partial blocks
    c = rng.uniform([0.6, 0.6, 0.2], [3.4, 2.4, 1.0])
    b = TriMesh.box(center=tuple(c), size=tuple(rng.uniform(0.2, 0.8, 3)))
    vs.append(b.vertices)
    ts.append(b.triangles + off)
    off += len(b.vertices)
verts = np.concatenate(vs).astype(np.float32)
tris = np.concatenate(ts).astype(np.int32)
asset = build_scene_asset(verts, tris)

n = 8192
origins = np.tile(np.array([2, 1.5, 1.0], np.float32), (n, 1))
dirs = rng.normal(size=(n, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
# Last quarter: origins outside the room -> misses exercise the no-hit path.
origins[3 * n // 4 :] = rng.uniform(-12, -6, (n // 4, 3)).astype(np.float32)

res_p = raycast_asset(origins, dirs, asset, backend="pallas", t_max=20.0)
res_o = raycast_asset(origins, dirs, asset, backend="xla_brute", t_max=20.0)

hp, ho = to_host(res_p.hit), to_host(res_o.hit)
failures = []
if not np.array_equal(hp, ho):
    failures.append(f"hit mask: {int((hp != ho).sum())} mismatches")
else:
    if not np.array_equal(np.asarray(res_p.t)[hp], np.asarray(res_o.t)[hp]):
        failures.append("t not bit-exact")
    if not np.array_equal(np.asarray(res_p.tri_id)[hp],
                          np.asarray(res_o.tri_id)[hp]):
        failures.append("tri_id mismatch")
    if not np.array_equal(np.asarray(res_p.normals)[hp],
                          np.asarray(res_o.normals)[hp]):
        failures.append("normals not bit-exact")
    if not np.array_equal(np.asarray(res_p.points)[hp],
                          np.asarray(res_o.points)[hp]):
        failures.append("points not bit-exact")
if not hp.any() or hp.all():
    failures.append(f"degenerate workload: hit_fraction={hp.mean()}")

res_x = raycast_asset(origins, dirs, asset, backend="mxu", t_max=20.0)
hx = to_host(res_x.hit)
agree = (hx == ho).mean()
if agree < 0.999:  # Pluecker edge ties only
    failures.append(f"mxu hit agreement {agree}")
else:
    both = hx & ho
    same = both & (np.asarray(res_x.tri_id) == np.asarray(res_o.tri_id))
    # Physical contract: rays through crease edges may land on the adjacent
    # surface (both answers valid within the beam footprint) — bound how
    # often, and require world hit POINTS within a fraction of the sensor's
    # 2 cm range-noise sigma everywhere.
    if same.sum() / max(both.sum(), 1) < 0.99:
        failures.append(
            f"mxu same-triangle fraction {same.sum() / both.sum()}"
        )
    pe = np.linalg.norm(
        np.asarray(res_x.points)[both] - np.asarray(res_o.points)[both],
        axis=1,
    )
    if np.percentile(pe, 99.9) > 0.01 or pe.max() > 0.05:
        failures.append(
            f"mxu point err p999={np.percentile(pe, 99.9)} max={pe.max()}"
        )

if failures:
    print("PARITY_FAIL: " + "; ".join(failures))
    raise SystemExit(1)
print(f"PARITY_OK hits={int(hp.sum())}/{n}")
"""


_PROBED = None


def _chip_available() -> bool:
    """One bounded probe per session: with the remote tunnel down, a chip
    subprocess hangs in jax.devices() until its 900 s timeout — 2 tests x
    900 s of dead suite time.  probe_device bounds that to 90 s total."""
    global _PROBED
    if _PROBED is None:
        from ipcgen_tpu.utils.device_probe import probe_device

        # The suite harness exports JAX_PLATFORMS=cpu (tests/conftest.py);
        # the probe must see the hardware's platform, same env scrub as
        # _run_on_chip below.
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        # 300 s: a fresh jax init over the tunnel tracks the remote
        # service's health — measured 40 s on a good day and 340 s during
        # degradation (r4), so a short probe skips these tests exactly
        # when the service is slow-but-alive.  A genuinely dead tunnel
        # costs 5 min once per session, which is what the probe is for
        # (without it each test hangs to its 1200 s timeout).
        _PROBED = probe_device(timeout_s=300.0, env=env) == "tpu"
    return _PROBED


_CHIP_RESULT = None


def _run_on_chip_combined():
    """Both hardware checks share ONE subprocess: each chip process pays
    ~40-60 s of tunnel init + jax bring-up before any kernel runs, so two
    separate launches cost a spare minute of suite wall time for zero extra
    coverage (the two scripts build different scenes and assert different
    contracts either way).  The combined script runs the parity section
    first, then the fuzz section; each test asserts its own marker."""
    global _CHIP_RESULT
    if not _chip_available():
        pytest.skip("no TPU attached (or device runtime unreachable)")
    if _CHIP_RESULT is None:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        _CHIP_RESULT = subprocess.run(
            [sys.executable, "-c", _SCRIPT + _FUZZ_SCRIPT],
            capture_output=True,
            text=True,
            timeout=1200,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    if "NOTPU" in _CHIP_RESULT.stdout:
        pytest.skip("no TPU attached")
    return _CHIP_RESULT


def test_pallas_hardware_parity_vs_oracle():
    proc = _run_on_chip_combined()
    assert "PARITY_OK" in proc.stdout, (proc.stdout, proc.stderr[-2000:])


# ---------------------------------------------------------------------------
# Degenerate + oblique geometry fuzz ON THE REAL MXU (VERDICT r2 item 6):
# the bf16x3 near-edge sign robustness is the kernel's riskiest numeric
# claim, and the CPU fuzz (tests/test_raycast_mxu.py) only exercises the
# interpreter.  Same contract as the CPU fuzz plus the 5 mm / 99 % world-
# point bound of the parity test, on non-axis-aligned geometry.
# ---------------------------------------------------------------------------
_FUZZ_SCRIPT = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NOTPU")
    raise SystemExit(0)

from ipcgen_tpu.containers import TriMesh
from ipcgen_tpu.ops.raycast import raycast_asset
from ipcgen_tpu.ops.scene_asset import build_scene_asset
from ipcgen_tpu.utils.host import to_host

failures = []
for seed in (1, 2, 3):
    rng = np.random.default_rng(seed)

    # Obliquely ROTATED cluttered room: nothing axis-aligned survives.
    room = TriMesh.box(center=(2, 1.5, 1.25), size=(4, 3, 2.5), inward=True)
    vs, ts = [room.vertices], [room.triangles]
    off = len(room.vertices)
    for _ in range(5):
        c = rng.uniform([0.6, 0.6, 0.2], [3.4, 2.4, 1.0])
        b = TriMesh.box(center=tuple(c), size=tuple(rng.uniform(0.2, 0.8, 3)))
        vs.append(b.vertices)
        ts.append(b.triangles + off)
        off += len(b.vertices)
    verts = np.concatenate(vs).astype(np.float32)
    tris = np.concatenate(ts).astype(np.int32)
    # Arbitrary rotation (QR of a random matrix) about the scene center.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q.astype(np.float32) * np.float32(np.sign(np.linalg.det(q)))
    center = verts.mean(axis=0)
    verts = (verts - center) @ q.T + center

    # Degenerate injections: slivers, duplicates, zero-area.
    nv = len(verts)
    base = rng.uniform(0.5, 3.0, (24, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (24, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (24, 3)).astype(np.float32)
    e1[0] = 0
    e2[1] = e1[1]
    e1[2] *= 1e-6
    base[3], e1[3], e2[3] = base[4], e1[4], e2[4]
    dverts = np.concatenate([base, base + e1, base + e2]).astype(np.float32)
    dtris = np.arange(72, dtype=np.int32).reshape(3, 24).T + nv
    verts = np.concatenate([verts, dverts])
    tris = np.concatenate([tris, dtris])
    asset = build_scene_asset(verts, tris)

    n = 4096
    origins = np.tile(center.astype(np.float32), (n, 1))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # Grazing rays along a rotated wall plane.
    wall_n = q @ np.array([0, 0, 1], np.float32)
    graze = np.cross(wall_n, rng.normal(size=3)).astype(np.float32)
    dirs[:16] = graze / np.linalg.norm(graze)

    res_m = raycast_asset(origins, dirs, asset, backend="mxu", t_max=20.0)
    res_o = raycast_asset(origins, dirs, asset, backend="xla_brute",
                          t_max=20.0)
    hm, ho = to_host(res_m.hit), to_host(res_o.hit)
    agree = (hm == ho).mean()
    if agree < 0.99:
        failures.append(f"seed {seed}: hit agreement {agree}")
        continue
    both = hm & ho
    same = both & (np.asarray(res_m.tri_id) == np.asarray(res_o.tri_id))
    if same.sum() / max(both.sum(), 1) < 0.99:
        failures.append(
            f"seed {seed}: same-tri {same.sum() / both.sum():.4f}"
        )
    pe = np.linalg.norm(
        np.asarray(res_m.points)[both] - np.asarray(res_o.points)[both],
        axis=1,
    )
    if np.percentile(pe, 99) > 0.005 or pe.max() > 0.05:
        failures.append(
            f"seed {seed}: point err p99={np.percentile(pe, 99):.4f} "
            f"max={pe.max():.4f}"
        )
    if not np.all(np.isfinite(np.asarray(res_m.points)[hm])):
        failures.append(f"seed {seed}: non-finite hit points")

if failures:
    print("FUZZ_FAIL: " + "; ".join(failures))
    raise SystemExit(1)
print("FUZZ_OK")
"""


def test_mxu_hardware_fuzz_degenerate_oblique():
    proc = _run_on_chip_combined()
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])
    assert "FUZZ_OK" in proc.stdout, (proc.stdout, proc.stderr[-2000:])
