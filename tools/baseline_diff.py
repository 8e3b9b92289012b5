"""Per-query batch-performance gate: is every Spark query within ~2x of
its DuckDB oracle, and how does the round compare to the committed
baseline sweep?

The reference publishes NO batch numbers (BASELINE.md), so the standing
batch comparison point is the DuckDB oracle itself: both engines run
the same query on the same parquet, so oracle_seconds is a legitimate
single-node "reference engine" time.  Two comparisons, in order of
evidential strength:

1. SAME-SWEEP ratio (load-honest): spark_seconds / oracle_seconds from
   ONE artifact — both sides saw identical machine conditions.  This is
   the "within 2x" check that is actually meaningful on a shared box.
2. CROSS-ROUND ratio: this sweep's spark_seconds vs the committed
   BASELINE_BATCH.json numbers — historical context only; wall-clock
   drifts with load (the sweep's control_runs series is the drift
   sentinel), so regressions here are leads, not verdicts.

Usage: python tools/baseline_diff.py [sweep.json] [--threshold 2.0]
       default sweep: the newest SWEEP_sf1_r*.json in the repo root.

Exit code 0 always (it's a report, not a gate — queries whose oracle is
deliberately brute-force, e.g. the losslessness proofs, legitimately
run faster in Spark and the sub-second floor makes tiny ratios noisy).
Queries with oracle_seconds < FLOOR_S are skipped from flagging: at
sub-second scale, JVM/session constants dominate and ratios are noise.
"""

from __future__ import annotations

import glob
import json
import os
import sys

FLOOR_S = 1.0


def main() -> None:
    thr = 2.0
    argv = sys.argv[1:]
    args = []
    i = 0
    while i < len(argv):       # --threshold consumes its VALUE too
        a = argv[i]
        if a == "--threshold":
            thr = float(argv[i + 1])
            i += 2
        elif a.startswith("-"):
            i += 1             # flags (-v) are not positionals
        else:
            args.append(a)
            i += 1
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args:
        sweep_path = args[0]
    else:
        sweeps = sorted(glob.glob(os.path.join(root, "SWEEP_sf1_r*.json")))
        if not sweeps:
            sys.exit("no SWEEP_sf1_r*.json artifacts found")
        sweep_path = sweeps[-1]
    sweep = json.load(open(sweep_path))
    base = json.load(open(os.path.join(root, "BASELINE_BATCH.json")))

    print(f"sweep: {os.path.basename(sweep_path)}  "
          f"(control drift: {[c['spark_seconds'] for c in sweep.get('control_runs', [])]})")
    flagged, compared = [], 0
    drifted = []   # cross-round leads: this sweep's spark vs committed spark
    for name, r in sorted(sweep["results"].items()):
        if not r.get("pass") or "oracle_seconds" not in r:
            continue
        # orchestrated sweeps re-measure every >=2s query in its own
        # fresh process; that number is the uncontaminated one — use it
        # for flagging when present (in-band stays in the artifact as
        # provenance)
        o = r["oracle_seconds"]
        s = r.get("spark_seconds_standalone") or r["spark_seconds"]
        bs = base["spark_seconds"].get(name)
        if bs is not None and s >= FLOOR_S and s / max(bs, 0.05) > thr:
            drifted.append((s / max(bs, 0.05), name, bs, s))
        if o < FLOOR_S and s < FLOOR_S * thr:
            continue  # sub-second floor: constants, not asymptotics
        compared += 1
        ratio = s / max(o, 0.01)
        b = base["oracle_seconds"].get(name)
        tag = ""
        if ratio > thr:
            flagged.append((ratio, name))
            tag = "  <-- over threshold"
        if ratio > thr or "-v" in sys.argv:
            print(f"{name:40s} spark {s:7.2f}s  oracle {o:7.2f}s  "
                  f"ratio {ratio:5.2f}x  (baseline oracle "
                  f"{b if b is not None else '—'}s){tag}")
    print(f"\n{compared} queries compared (oracle >= {FLOOR_S}s); "
          f"{len(flagged)} over {thr}x same-sweep")
    for ratio, name in sorted(flagged, reverse=True):
        print(f"  {name}: {ratio:.2f}x")
    if drifted:
        print(f"\ncross-round leads ({len(drifted)} queries > {thr}x the "
              f"committed baseline spark_seconds — wall-clock drifts with "
              f"load, so these are leads, not verdicts):")
        for ratio, name, bs, s in sorted(drifted, reverse=True):
            print(f"  {name}: {bs:.2f}s -> {s:.2f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    main()
