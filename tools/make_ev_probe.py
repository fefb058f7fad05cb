#!/usr/bin/env python3
"""Replicate sf0.1's events table NxF for scale-probe timing.

Usage: python3 tools/make_ev_probe.py <factor> [srcDir] [outDir]

Growth model: the USER population grows (user_id offset per replica,
NULL stays NULL) while the time window stays fixed — the realistic
"more traffic, same month" scale-up. Per-user row counts, event-type
mix, value distribution, and timestamps are unchanged, so per-user
window/sessionize state and per-type aggregates keep their real shapes
while total row count, distinct-user count, and every shuffle grow N×.
event_id offsets keep ids unique (tie-breaks stay deterministic).
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    factor = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/ev_probe_{factor}x"
    import os
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/events.parquet")
    d = t.to_pydict()
    n = len(d["event_id"])
    cols = {k: [] for k in d}
    for r in range(factor):
        for k in range(n):
            cols["event_id"].append(d["event_id"][k] + r * 1_000_000_000)
            u = d["user_id"][k]
            cols["user_id"].append(None if u is None else u + r * 1_000_000)
            for c in d:
                if c not in ("event_id", "user_id"):
                    cols[c].append(d[c][k])
    arrays = {c: pa.array(cols[c], type=t.schema.field(c).type) for c in d}
    pq.write_table(pa.table(arrays), f"{out}/events.parquet")
    print(f"{out}/events.parquet: {len(cols['event_id'])} rows")


if __name__ == "__main__":
    main()
