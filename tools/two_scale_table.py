#!/usr/bin/env python3
"""Regenerate SCALE.md's two-scale table from two graft.Bench JSON files.

Usage: python3 tools/two_scale_table.py bench_sf001.json bench_sf01.json

Run each bench on an OTHERWISE-IDLE box, sequentially, e.g.:
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}' > a.json
(concurrent Spark JVMs on one box skew every number — see round 4 notes).
"""
import json
import sys


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    da, db = json.load(open(a)), json.load(open(b))
    qa, qb = da["queries"], db["queries"]
    # the two runs must cover the same query set: silently intersecting
    # would publish totals that include queries missing from the table
    # (e.g. bench dumps from two different code revisions)
    if set(qa) != set(qb):
        only_a = sorted(set(qa) - set(qb))
        only_b = sorted(set(qb) - set(qa))
        sys.exit(f"query sets differ — rerun both benches on one "
                 f"revision. only in {a}: {only_a}; only in {b}: {only_b}")
    rows = [(k, qa[k], qb[k], qb[k] / qa[k]) for k in sorted(qa)]
    rows.sort(key=lambda r: -r[3])
    print(
        f"Totals: **sf0.01 {da['value']:.1f} s, sf0.1 {db['value']:.1f} s** "
        f"(10x data, {db['value']/da['value']:.1f}x wall; "
        f"{len(rows)} queries).")
    print()
    print("| query | sf0.01 (s) | sf0.1 (s) | ratio |")
    print("|---|---|---|---|")
    for k, x, y, r in rows:
        print(f"| {k} | {x:.2f} | {y:.2f} | {r:.2f} |")


if __name__ == "__main__":
    main()
