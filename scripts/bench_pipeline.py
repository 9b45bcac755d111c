#!/usr/bin/env python3
"""End-to-end pipeline benchmark: S3DIS-scale rooms/hour on real hardware.

Synthesizes TLS-style dense rooms (shell + furniture clouds with per-instance
annotations, ~0.5-1M points), then runs the full five-stage pipeline per room
and reports per-stage timings and rooms/hour.  The first room pays the XLA
compiles; steady-state rooms reuse them (report excludes+includes variants).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_room(root: Path, area: str, room: str, rng, n_shell=600_000,
               n_furniture=8):
    d = root / area / room
    ann = d / "Annotations"
    ann.mkdir(parents=True, exist_ok=True)
    w = rng.uniform(4.5, 8.0)
    h = rng.uniform(3.5, 6.0)
    z = 2.7

    def surf(n, axis, value, lo, hi):
        pts = rng.uniform(0, 1, (n, 3)) * (np.array(hi) - lo) + lo
        pts[:, axis] = value
        return pts

    lo = [0.0, 0.0, 0.0]
    hi = [w, h, z]
    floor = surf(int(n_shell * 0.25), 2, 0.0, lo, hi)
    ceil_ = surf(int(n_shell * 0.2), 2, z, lo, hi)
    walls = np.vstack([
        surf(int(n_shell * 0.14), 0, 0.0, lo, hi),
        surf(int(n_shell * 0.14), 0, w, lo, hi),
        surf(int(n_shell * 0.14), 1, 0.0, lo, hi),
        surf(int(n_shell * 0.13), 1, h, lo, hi),
    ])
    parts = {"floor_1": floor, "ceiling_1": ceil_, "wall_1": walls}
    classes = ["chair", "table", "sofa", "bookcase", "board"]
    counters = {c: 0 for c in classes}
    for _ in range(n_furniture):
        c = classes[int(rng.integers(0, len(classes)))]
        counters[c] += 1
        size = {
            "chair": [0.5, 0.5, 0.9], "table": [1.4, 0.8, 0.75],
            "sofa": [1.8, 0.9, 0.8], "bookcase": [0.9, 0.35, 1.9],
            "board": [1.6, 0.35, 1.1],
        }[c]
        pos = [rng.uniform(0.5, w - 0.5 - size[0]), rng.uniform(0.5, h - 0.5 - size[1]), 0]
        n_pts = int(4000 * np.prod(size) ** 0.5) + 500
        # surface-ish sampling: points on the box faces
        u = rng.uniform(0, 1, (n_pts, 3)) * size + pos
        face = rng.integers(0, 6, n_pts)
        for ax in range(3):
            mlo = face == 2 * ax
            mhi = face == 2 * ax + 1
            u[mlo, ax] = pos[ax] if ax < 2 else 0
            u[mhi, ax] = pos[ax] + size[ax] if ax < 2 else size[ax]
        parts[f"{c}_{counters[c]}"] = u
    cloud, colors = [], []
    for name, pts in parts.items():
        cloud.append(pts)
        colors.append(np.tile(rng.integers(40, 220, 3), (len(pts), 1)))
        np.savetxt(ann / f"{name}.txt",
                   np.hstack([pts, np.tile(rng.integers(40, 220, 3), (len(pts), 1))]),
                   fmt="%.4f %.4f %.4f %d %d %d")
    data = np.hstack([np.vstack(cloud), np.vstack(colors)])
    np.savetxt(d / f"{room}.txt", data, fmt="%.4f %.4f %.4f %d %d %d")
    return len(data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rooms", type=int, default=3)
    ap.add_argument("--shell-points", type=int, default=600_000)
    ap.add_argument("--workdir", default="/tmp/bench_pipeline")
    ap.add_argument("--waypoints", type=int, default=20)
    ap.add_argument(
        "--passes", type=int, default=1,
        help="run the same rooms N times in-process (fresh output dirs); "
        "the last pass is the bucket-warm steady state.  Rooms of "
        "different sizes land in different compile-shape buckets (SDF "
        "dims, block counts), so with few rooms the single-pass 'steady' "
        "mean still pays one-off bucket compiles that a production "
        "272-room batch amortizes to ~zero; pass 2 has every bucket warm.")
    ap.add_argument(
        "--json-out", default=None,
        help="also write the result JSON to this path (e.g. the committed "
        "PIPELINE_BENCH.json artifact — pipeline numbers must exist as "
        "data, not only as stdout/markdown)")
    args = ap.parse_args()

    from ipcgen_tpu.utils.device_probe import wait_for_device

    # A cold tunnel's first jax init can take 2-3 min; retry within a
    # bounded window instead of failing on one 120 s probe.
    platform = wait_for_device(max_wait_s=900.0, poll_s=15.0,
                               probe_timeout_s=300.0)
    if platform is None:
        print(json.dumps({"error": "device runtime unreachable (tunnel "
                          "down); aborting instead of hanging"}))
        raise SystemExit(2)
    print(f"device probe ok: {platform}", flush=True)

    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    data_root = work / "data"
    rng = np.random.default_rng(0)

    from ipcgen_tpu.config import PipelineConfig
    from ipcgen_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = PipelineConfig()
    cfg.data.data_root = str(data_root)
    cfg.data.output_root = str(work / "outputs")
    cfg.data.area_name = "Area_1"
    cfg.nksr.voxel_size = 0.04
    cfg.nksr.chunked = False
    cfg.simulation.num_waypoints = args.waypoints
    cfg.simulation.use_blk2go = True
    cfg.simulation.output_base_dir = str(work / "simulation_results")
    cfg.simulation.save_visualizations = False

    rooms = [f"office_{i+1}" for i in range(args.rooms)]
    print("synthesizing rooms...", flush=True)
    for room in rooms:
        n = synth_room(data_root, "Area_1", room, rng, n_shell=args.shell_points)
        print(f"  {room}: {n:,} points", flush=True)

    from ipcgen_tpu.preprocess.loader import preprocess_room
    from ipcgen_tpu.recon.cli import reconstruct_room
    from ipcgen_tpu.sim.simulator import run_single_scene_simulation

    stage_times = {"preprocess": [], "sim": [], "bbox": []}
    sim_profiles = []
    recon_spans_all = []
    pre_spans_all = []
    room_times = []

    def run_room(room, pass_tag):
        t_room = time.time()
        t0 = time.time()
        rd = preprocess_room(
            str(data_root), "Area_1", room, cfg.to_dict(),
            output_dir=str(work / "outputs" / f"preprocessed{pass_tag}"),
            seed=0,
        )
        stage_times["preprocess"].append(time.time() - t0)
        pre_spans = " ".join(
            f"{k}={v:.1f}" for k, v in rd.get("spans", {}).items()
        )
        pre_spans_all.append(dict(rd.get("spans", {})))
        print(f"  preprocess sub-spans: {pre_spans}", flush=True)
        # Room identity is known now: start the annotation/label prefetch
        # so its parse + grid build hides behind the recon stage's device
        # work instead of the sim stage's much shorter scan window.
        from ipcgen_tpu.containers.sim_scene import prewarm_labels

        prewarm_labels(str(data_root), "Area_1", room)
        t0 = time.time()
        recon_dir = work / "outputs" / f"reconstruction_results{pass_tag}"
        rspans = {}
        reconstruct_room(rd["output_path"], cfg.to_dict(), str(recon_dir),
                         span_sink=rspans)
        recon_spans_all.append(rspans)
        stage_times.setdefault("recon", []).append(time.time() - t0)
        t0 = time.time()
        scene_name = f"Area_1_{room}"
        out_base = f"{cfg.simulation.output_base_dir}{pass_tag}"
        sim_scene = run_single_scene_simulation(
            scene_path=str(recon_dir / scene_name / "mesh_dense.ply"),
            scene_name=scene_name,
            num_waypoints=args.waypoints,
            output_base_dir=out_base,
            use_blk2go=True,
            s3dis_data_root=str(data_root),
            area="Area_1",
            room=room,
            save_visualizations=False,
        )
        stage_times["sim"].append(time.time() - t0)
        sim_profiles.append(dict(sim_scene.profile))
        prof = " ".join(
            f"{k}={v:.1f}" for k, v in sorted(sim_scene.profile.items())
        )
        print(f"  sim sub-spans: {prof}", flush=True)
        t0 = time.time()
        from ipcgen_tpu.bbox.detection import S3DISBBoxVisualizer

        vis = S3DISBBoxVisualizer(results_root=out_base)
        vis.visualize_room_bboxes(data_root / "Area_1" / room)
        stage_times["bbox"].append(time.time() - t0)
        room_times.append(time.time() - t_room)
        print(f"{room}{pass_tag}: {room_times[-1]:.1f}s "
              f"(pre {stage_times['preprocess'][-1]:.1f} / "
              f"recon {stage_times['recon'][-1]:.1f} / "
              f"sim {stage_times['sim'][-1]:.1f} / "
              f"bbox {stage_times['bbox'][-1]:.1f})", flush=True)

    for p in range(args.passes):
        for room in rooms:
            run_room(room, "" if p == 0 else f"_p{p}")

    # Steady = the last pass when multi-pass (every compile bucket warm),
    # else rooms 2+ of the single pass.
    if args.passes > 1:
        steady = room_times[-args.rooms:]
        sim_profiles = sim_profiles[-args.rooms:]
        for k in stage_times:
            stage_times[k] = stage_times[k][-args.rooms:]
    else:
        steady = room_times[1:] if len(room_times) > 1 else room_times
    if args.passes > 1:
        steady_stage = dict(stage_times)
        steady_profiles = sim_profiles
    else:
        steady_stage = {
            k: (v[1:] if len(v) > 1 else v) for k, v in stage_times.items()
        }
        steady_profiles = sim_profiles[1:] or sim_profiles
    out = {
        "protocol": (
            f"{args.rooms} synthetic ~{args.shell_points // 1000}k-pt rooms, "
            f"BLK2GO {args.waypoints}-waypoint auto trajectory, "
            f"{args.passes}-pass in-process (last pass = bucket-warm steady)"
        ),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "rooms": len(rooms),
        "passes": args.passes,
        "first_room_seconds": round(room_times[0], 1),
        "steady_room_seconds": round(float(np.mean(steady)), 1),
        "rooms_per_hour_steady": round(3600.0 / float(np.mean(steady)), 1),
        # Remote-compile/tunnel service latency varies up to 2x across
        # identical warm rooms (docs/BENCHMARKS.md variance note); the
        # best room bounds the machine's capability, the mean is what this
        # particular window achieved.
        "best_room_seconds": round(float(np.min(steady)), 1),
        "rooms_per_hour_best": round(3600.0 / float(np.min(steady)), 1),
        "stage_seconds_steady": {
            k: round(float(np.mean(v)), 1) for k, v in steady_stage.items()
        },
        "stage_seconds_best": {
            k: round(float(np.min(v)), 1) for k, v in steady_stage.items()
        },
        # Sim-stage sub-spans (steady mean): scan_exec is the device scan,
        # dispatch the beam gen + (cold-bucket) scan compile, d2h the
        # tunnel transfer, label_* the annotation load + on-device 1-NN
        # transfer, export_* the PLY/stats writes.
        "sim_subspans_steady": {
            k: round(
                float(np.mean([p.get(k, 0.0) for p in steady_profiles])), 2,
            )
            for k in sorted({k for p in sim_profiles for k in p})
        },
        # Recon/preprocess stage attribution (steady mean): load_pickle/
        # init/recon/save_mesh/report are the stage wall; op_* are the
        # reconstructor's device-op spans (fuse/march/weld/imls/orient/
        # colors) inside `recon`.
        "recon_subspans_steady": {
            k: round(float(np.mean(
                [p.get(k, 0.0)
                 for p in recon_spans_all[-len(steady_profiles):]])), 2)
            for k in sorted({k for p in recon_spans_all for k in p})
        },
        "preprocess_subspans_steady": {
            k: round(float(np.mean(
                [p.get(k, 0.0)
                 for p in pre_spans_all[-len(steady_profiles):]])), 2)
            for k in sorted({k for p in pre_spans_all for k in p})
        },
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
