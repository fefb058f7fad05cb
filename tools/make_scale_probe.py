#!/usr/bin/env python3
"""Replicate sf0.1's documents table NxF for scale-probe timing.

Usage: python3 tools/make_scale_probe.py <factor> [srcDir] [outDir]

Each replica r gets (a) doc_ids offset by r*10M and (b) a salt token
derived from (replica, md5-of-text) woven in after every second token.
The salt lands in every 3-token shingle and every 8-token shingle, so:
  - replicas share NO shingles (no cross-replica pair blowup — a naive
    unsalted copy would turn every original pair into factor^2
    cross-copy pairs, an adversarial workload, not a bigger one);
  - within a replica, EXACT duplicates salt identically (salt is a
    function of the text), so exact-dup groups are preserved and the
    canon pre-pass / fp grouping / CC stages do real work;
  - near-dup (non-identical) docs get different salts, so near-dup
    pair volume shrinks — the probe pins the CORPUS-LINEAR stages
    (tokenize, signatures, banding, grouping); pair-output volume is
    workload-dependent by nature.
A replica-constant salt is NOT usable: repeated ~25x per doc and shared
by every doc in the replica, it dominates the SimHash bit sums and
collapses fingerprints together — the first probe run did exactly that
and sent the (then-uncapped) simhash band join quadratic.

NULL texts stay NULL (the edge-case path must scale too).
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


import hashlib


def salt_text(text, r):
    if text is None:
        return None
    # LETTERS-ONLY tag: the engine's normalizer strips digits, so a hex
    # tag like "3fa2b1" used to collapse — ~6% of tags are all-digit and
    # every such salt normalized to the SAME bare token, welding a
    # cross-replica mega-cluster that sent the prefix-join probe
    # candidates quadratic (5.5M -> 115M at 30x; root-caused round 7).
    # The salt must survive normalization to do its job.
    hextag = hashlib.md5(text.encode()).hexdigest()[:6]
    tag = "".join("ghijklmnopqrstuv"[int(c, 16)] for c in hextag)
    rtag = "".join("ghijklmnopqrstuv"[int(c, 16)] for c in f"{r:x}")
    salt = f"zr{rtag}g{tag}"
    toks = text.split(" ")
    out = []
    for k, t in enumerate(toks):
        out.append(t)
        if k % 2 == 1:
            out.append(salt)
    if len(toks) < 2:
        # short docs never hit the k % 2 == 1 branch; without a salt they
        # replicate byte-identically, and factor copies of one doc are the
        # factor^2 cross-replica dup workload the salting exists to avoid
        out.append(salt)
    return " ".join(out)


def main():
    factor = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scale_probe_{factor}x"
    t = pq.read_table(f"{src}/documents.parquet")
    d = t.to_pydict()
    n = len(d["doc_id"])
    cols = {k: [] for k in d}
    for r in range(factor):
        off = r * 10_000_000
        for i in range(n):
            txt = salt_text(d["text"][i], r)
            cols["doc_id"].append(d["doc_id"][i] + off)
            cols["text"].append(txt)
            cols["lang"].append(d["lang"][i])
            cols["source"].append(d["source"][i])
            cols["n_chars"].append(len(txt) if txt is not None else None)
    import os
    os.makedirs(out, exist_ok=True)
    # 5k-row row groups: a single monolithic row group is unsplittable,
    # which would serialize every scan into one task regardless of
    # spark.sql.files.maxPartitionBytes
    pq.write_table(pa.table(cols, schema=t.schema),
                   f"{out}/documents.parquet", row_group_size=5000)
    print(f"{out}/documents.parquet: {n * factor} rows")


if __name__ == "__main__":
    main()
