#!/usr/bin/env python3
"""Replicate sf0.1's FACT tables (orders, lineitem) NxF for star-family
scale-probe timing; dimensions stay fixed.

Usage: python3 tools/make_star_probe.py <factor> [srcDir] [outDir]

This is the production scale shape: facts grow, dimensions don't. Each
replica r offsets o_orderkey/l_orderkey by r*1e9 so the order⋈lineitem
join structure is preserved exactly (every order keeps its own lines;
no cross-replica fan-out). o_custkey / l_suppkey / l_partkey are left
unchanged: each customer/supplier/part simply accumulates factor-times
more fact rows — which is what a bigger warehouse looks like, and what
makes the dim-side broadcasts and the per-key aggregates do factor-times
real work. Dates/prices are untouched, so date-pruned scans keep their
selectivity and decimal aggregates their value grid.
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10**9


def main():
    factor = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/star_probe_{factor}x"
    import os
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in [("orders", ["o_orderkey"]),
                    ("lineitem", ["l_orderkey"])]:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for r in range(factor):
            rep = tbl
            for k in keys:
                i = rep.schema.get_field_index(k)
                shifted = pa.compute.add(rep.column(k), r * OFFSET)
                rep = rep.set_column(i, rep.schema.field(k), shifted)
            parts.append(rep)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(t, big.num_rows)


if __name__ == "__main__":
    main()
