"""Two-parallelism scaling benchmark (north_rule N vs 4N evidence).

Generates ONE change log, replays it at local[8] and local[32] in
separate processes (fresh JVMs, fresh table roots), and reports
throughput at both plus scaling efficiency =
(thr_32 / thr_8) / (32 / 8). Appends results to BENCH/scaling.json
and rewrites the results section of BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_events] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "replay_once.py"), *args],
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4_000_000
    root = tempfile.mkdtemp(prefix="datax_spark_scaling_")
    events_root = os.path.join(root, "events")
    try:
        gen = run(["gen", events_root, str(n_events)])
        print(f"generated {n_events} events in {gen['sec']}s", flush=True)
        r8 = run(["replay", events_root, root, "8"])
        print(f"local[8]:  {r8['events_per_sec']} ev/s ({r8['sec']}s)", flush=True)
        r32 = run(["replay", events_root, root, "32"])
        print(f"local[32]: {r32['events_per_sec']} ev/s ({r32['sec']}s)", flush=True)
    finally:
        if "--keep" not in sys.argv:
            shutil.rmtree(root, ignore_errors=True)

    speedup = r32["events_per_sec"] / r8["events_per_sec"]
    eff = speedup / 4.0
    assert r8["rows_after"] == r32["rows_after"], "final state differs across sizes"
    result = {
        "n_events": n_events,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    hist_path = os.path.join(REPO, "BENCH", "scaling.json")
    hist = []
    if os.path.exists(hist_path):
        hist = json.loads(open(hist_path).read())
    hist.append(result)
    with open(hist_path, "w") as fh:
        json.dump(hist, fh, indent=1)

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            f"""# BENCH — two-parallelism scaling evidence (this repo)

Protocol (sandbox substitute for clusters of N and 4N executors, per
the driver instruction): the SAME change-event log is replayed by the
full engine (salted LWW dedup -> bucketed CoW merge -> two-phase epoch
commits -> lineage metrics) in two fresh processes at local[8] (N) and
local[32] (4N). Table layout (128 buckets) is fixed across runs; only
execution parallelism changes. JVM warmup excluded; generation and
oracle excluded. Identical final row counts are asserted.

## Latest result ({n_events:,} events, seed 42)

| cluster size | wall (s) | throughput (events/s) |
|---|---|---|
| N  = local[8]  | {r8["sec"]} | {r8["events_per_sec"]:,} |
| 4N = local[32] | {r32["sec"]} | {r32["events_per_sec"]:,} |

* speedup 8->32 cores: **{speedup:.2f}x** (ideal 4x)
* scaling efficiency: **{eff:.2f}** (north_rule target >= 0.8)
* final table rows (both sizes, asserted equal): {r8["rows_after"]:,}

Reference comparison (BASELINE.md at repo root): DataX's own best 4x
windows reach 0.77-0.96 efficiency; its single-node read path peaks at
~550k rec/s (8 channels) and writes at ~246k rec/s (16 channels).

History in `BENCH/scaling.json`. Reproduce:
`python tools/bench_scaling.py {n_events}`.

## 10^10-event story

We do not claim to have run 1e10 rows locally. The engine's design
carries to that scale because every stage is bounded per-partition:
generation is expression-only over `spark.range`; dedup is a
map-side-combined `max_by` hash aggregate (shuffle volume is bounded
by distinct keys x map tasks, with an optional salted two-stage
reduction bounding reducer fan-in on hot keys); the merge reads and
rewrites only affected buckets; commits are O(num_buckets) metadata.
At 1e10 events the knobs that change are num_buckets (O(10^4)),
events_per_epoch, and shuffle partitions — all linear dials, no
driver-side loops over data anywhere in the hot path.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
