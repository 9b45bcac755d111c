#!/usr/bin/env python3
"""Docs-vs-artifact drift check: headline numbers in README/BENCHMARKS must
match the committed benchmark artifacts, so stale docs fail loudly instead
of silently contradicting the data (VERDICT r4 item 4: README said 9.3 M
where the committed JSON said 10.1 M for a full round).

Each claim is (doc, regex-with-one-float-capture, artifact, dotted key,
rel_tol).  The regex must match EXACTLY once — zero matches means the doc
dropped the anchored phrasing (update the registry), two+ means the claim
is ambiguous.  Exit 1 on any mismatch; run in CI / before committing a
docs or bench change:

    python scripts/check_docs_numbers.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

# (doc path, pattern, artifact file, dotted key path, rel tolerance)
CLAIMS = [
    # --- pipeline product numbers (PIPELINE_BENCH.json) ---
    ("README.md",
     r"\*\*([\d.]+) s/room = [\d.]+ rooms/hour on one chip\*\*",
     "PIPELINE_BENCH.json", "steady_room_seconds", 0.001),
    ("README.md",
     r"\*\*[\d.]+ s/room = ([\d.]+) rooms/hour on one chip\*\*",
     "PIPELINE_BENCH.json", "rooms_per_hour_steady", 0.005),
    ("README.md",
     r"best room ([\d.]+) s = [\d.]+/hour",
     "PIPELINE_BENCH.json", "best_room_seconds", 0.001),
    ("README.md",
     r"best room [\d.]+ s = ([\d.]+)/hour",
     "PIPELINE_BENCH.json", "rooms_per_hour_best", 0.005),
    ("docs/BENCHMARKS.md",
     r"\*\*([\d.]+) s/room = [\d.]+ rooms/hour/chip\*\* \| \*\*[\d.]+ s",
     "PIPELINE_BENCH.json", "steady_room_seconds", 0.001),
    ("docs/BENCHMARKS.md",
     r"\*\*[\d.]+ s/room = ([\d.]+) rooms/hour/chip\*\* \| \*\*[\d.]+ s",
     "PIPELINE_BENCH.json", "rooms_per_hour_steady", 0.005),
    ("docs/BENCHMARKS.md",
     r"label_transfer ([\d.]+) \(was",
     "PIPELINE_BENCH.json", "sim_subspans_steady.label_transfer", 0.01),
    ("docs/BENCHMARKS.md",
     # two numeric columns = the round-5 steady|best table (the r4
     # history table has one column and must not match)
     r"simulation \(scan \+ labels \+ exports\) \| ([\d.]+) \| [\d.]+ \|",
     "PIPELINE_BENCH.json", "stage_seconds_steady.sim", 0.005),
    # --- kernel/scan headline (BENCH_LATEST.json, written by bench.py) ---
    ("README.md",
     r"profile runs at \*\*([\d.]+) M rays/s/chip\*\*",
     "BENCH_LATEST.json", "value", 0.02, 1e6),
    ("README.md",
     r"does \*\*([\d.]+) M rays/s\*\* through the\nproduct path",
     "BENCH_LATEST.json", "details.box_mesh_rays_per_sec", 0.02, 1e6),
    ("README.md",
     r"full noise sustains \*\*([\d.]+) M\nrays/s\*\*",
     "BENCH_LATEST.json",
     "details.production_workloads.blk2go_dual_axis_80wp.rays_per_sec",
     0.02, 1e6),
]


def get(d, dotted):
    for k in dotted.split("."):
        d = d[k]
    return d


def main() -> int:
    artifacts = {}
    failures = 0
    for claim in CLAIMS:
        doc, pattern, artifact, keypath, rel = claim[:5]
        unit = claim[5] if len(claim) > 5 else 1.0
        apath = ROOT / artifact
        if artifact not in artifacts:
            if not apath.exists():
                print(f"SKIP  {doc}: artifact {artifact} not present")
                artifacts[artifact] = None
            else:
                artifacts[artifact] = json.loads(apath.read_text())
        data = artifacts[artifact]
        if data is None:
            continue
        text = (ROOT / doc).read_text()
        matches = re.findall(pattern, text)
        if len(matches) != 1:
            print(f"FAIL  {doc}: pattern {pattern!r} matched "
                  f"{len(matches)} times (want exactly 1)")
            failures += 1
            continue
        doc_val = float(matches[0]) * unit
        try:
            art_val = float(get(data, keypath))
        except (KeyError, TypeError):
            print(f"FAIL  {artifact}: key {keypath!r} missing")
            failures += 1
            continue
        tol = rel * max(abs(art_val), 1e-12)
        if abs(doc_val - art_val) > tol:
            print(f"FAIL  {doc}: says {doc_val:g}, {artifact}[{keypath}] "
                  f"is {art_val:g} (rel {abs(doc_val - art_val) / max(abs(art_val), 1e-12):.1%})")
            failures += 1
        else:
            print(f"ok    {doc}: {doc_val:g} == {artifact}[{keypath}]")
    if failures:
        print(f"\n{failures} doc/number drift failure(s) — update the doc "
              "or re-run the bench that writes the artifact.")
        return 1
    print("\nall doc numbers match the committed artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
