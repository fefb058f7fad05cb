#!/usr/bin/env python3
"""Replicate sf0.1's embeddings table NxF for scale-probe timing.

Usage: python3 tools/make_emb_probe.py <factor> [srcDir] [outDir]

Unlike the documents probe (which salts text so replicas share no
shingles), embeddings replicate UNCHANGED with offset vec_ids: identical
vectors across replicas are the realistic workload (the same image/page
embedded repeatedly is exactly what a 100 TB corpus contains), and the
probe exists to measure how the LSH/IVF/banding lineages behave when
duplicate-vector groups grow linearly with the corpus. Labels replicate
as-is. vec_id 0 (the query anchor many emb queries broadcast) exists
only in replica 0, so top-k semantics keep a single query row.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    factor = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/emb_probe_{factor}x"
    import os
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/embeddings.parquet")
    d = t.to_pydict()
    n = len(d["vec_id"])
    ids, embs, labels = [], [], []
    for r in range(factor):
        for k in range(n):
            ids.append(d["vec_id"][k] + r * 10_000_000)
            embs.append(d["embedding"][k])
            labels.append(d["label"][k])
    out_t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(embs, type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=t.schema.field("label").type),
    })
    pq.write_table(out_t, f"{out}/embeddings.parquet")
    print(f"{out}/embeddings.parquet: {len(ids)} rows")


if __name__ == "__main__":
    main()
